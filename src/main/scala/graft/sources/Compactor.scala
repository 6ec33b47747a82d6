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

  /** The coalesced frame `compact` writes — factored so the plan spec
    * asserts the narrow shape on the REAL code path (a regression to
    * `repartition` would otherwise be invisible to it). */
  private[graft] def compactionFrame(s: SparkSession, dir: String,
                                     targetBytes: Long)
      : org.apache.spark.sql.DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val df = s.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // clamp: a BigInt quotient past Int.MaxValue would wrap on toInt
    val parts = ((bytes + targetBytes - 1) / targetBytes)
      .max(1).min(Int.MaxValue)
    df.coalesce(parts.toInt)
  }

  /** Rewrite `dir`'s parquet into `out` as ~targetBytes files.
    * Returns the resulting data-file count. */
  def compact(s: SparkSession, dir: String, out: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    compactionFrame(s, dir, targetBytes)
      .write.mode("overwrite").parquet(out)
    parquetFileCount(s, out)
  }

  /** Data files (part-*) under a parquet output directory — through
    * the Hadoop filesystem API, so hdfs:///s3a:// lake paths count
    * correctly (java.io.File would return 0 for them). */
  def parquetFileCount(s: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(st =>
      st.isFile && st.getPath.getName.startsWith("part-"))
  }
}
