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
    // a hive-partitioned layout must be compacted per-partition (a
    // flat coalesce-write would silently DROP the partitioning); fail
    // loudly instead of flattening the caller's layout
    val rootPath = new org.apache.hadoop.fs.Path(dir)
    val rootFs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val partDirs = if (rootFs.exists(rootPath))
      rootFs.listStatus(rootPath).filter(st =>
        st.isDirectory && st.getPath.getName.contains("="))
    else Array.empty[org.apache.hadoop.fs.FileStatus]
    require(partDirs.isEmpty,
      s"$dir is hive-partitioned (${partDirs.head.getPath.getName}, ...) — " +
        "compact() handles unpartitioned parquet; compact each partition " +
        "directory separately to preserve the layout")
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

  /** Data files (part-*) under a parquet output directory, RECURSIVE
    * so hive-partitioned layouts count their per-partition files —
    * through the Hadoop filesystem API, so hdfs:///s3a:// lake paths
    * count correctly (java.io.File would return 0 for them). */
  def parquetFileCount(s: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      var n = 0
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        if (it.next().getPath.getName.startsWith("part-")) n += 1
      }
      n
    }
  }
}
