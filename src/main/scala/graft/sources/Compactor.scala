package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the housekeeping pass every long-running
  * pipeline needs: streaming sinks and fine-grained partitioning
  * fragment a table into thousands of small files (each costing a
  * task, a footer read, and namenode/list pressure), while readers
  * want few near-`targetBytes` files. `compact` rewrites a parquet
  * directory into `ceil(bytes / targetBytes)` files using `coalesce`
  * — a NARROW rewrite (bin-packs existing partitions, no shuffle), so
  * the cost is one read + one write of the data, never a redistribute.
  * Size comes from the scan's own statistics (the summed file sizes),
  * not a count job.
  *
  * This is the offline analog of the compaction the reference's
  * Connect sinks get from their stores (Elasticsearch merges segments
  * itself; a parquet lake has to do it explicitly — the
  * OPTIMIZE/rewriteDataFiles operation of the table formats).
  */
object Compactor {

  /** Rewrite `dir`'s parquet into `out` as ~targetBytes files.
    * Returns the resulting data-file count. */
  def compact(s: SparkSession, dir: String, out: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val df = s.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = ((bytes + targetBytes - 1) / targetBytes).max(1)
    df.coalesce(parts.toInt).write.mode("overwrite").parquet(out)
    parquetFileCount(out)
  }

  /** Data files (part-*) under a parquet output directory. */
  def parquetFileCount(dir: String): Int = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).map(_.count(f =>
      f.isFile && f.getName.startsWith("part-"))).getOrElse(0)
  }
}
