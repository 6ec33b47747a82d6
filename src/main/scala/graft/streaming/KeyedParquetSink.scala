package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Durable K2: keyed upsert sink over parquet with snapshot
  * compaction — the offline stand-in for the reference's
  * Elasticsearch `_id`-from-key sink (reference README.md:487-493),
  * holding the same contract: at-least-once delivery collapses to
  * exactly-once-per-key visible state.
  *
  * Mechanics: each micro-batch merges into a NEW versioned snapshot
  * directory (`v<batchId>`), then a pointer file is atomically moved
  * onto `_CURRENT` — readers always see a complete snapshot, a
  * replayed batch id simply rewrites the same version (idempotent),
  * and failures leave the previous pointer intact. This is the
  * copy-on-write table pattern (what Delta/Iceberg formalize with a
  * log); at 100 TB you'd partition the snapshot by key ranges and
  * rewrite only affected partitions.
  */
/** @param deletedCol when set, a merged row whose latest version has
  *                    this column = 'true' is a deletion: the key
  *                    disappears from the visible snapshot (ksqlDB
  *                    tombstone semantics for a durable table).
  * @param orderCol   when set, ties WITHIN a batch resolve to the
  *                    greatest value of this column (e.g. the Kafka
  *                    offset) — the ES `_id`-sink contract keeps the
  *                    LAST record per key, and without an explicit
  *                    order two same-key rows in one micro-batch would
  *                    pick a shuffle-dependent, replay-unstable winner. */
class KeyedParquetSink(spark: SparkSession, root: String, keyCol: String,
                       deletedCol: Option[String] = None,
                       orderCol: Option[String] = None) {
  Files.createDirectories(Paths.get(root))
  private val pointer = Paths.get(root, "_CURRENT")

  private def currentPath: Option[String] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim) else None

  /** Current visible state (empty schema-less reads return None). */
  def df: Option[DataFrame] = currentPath.map(p => spark.read.parquet(p))

  /** Merge a micro-batch: batch rows win over current rows per key.
    * Replay-idempotent: if the pointer already names this batch's
    * version, the batch was fully committed before a crash — skip
    * (also avoids overwriting the directory being read). */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    if (currentPath.contains(s"$root/v$batchId")) return
    val tiebreak = orderCol.map(c => col(c).desc).toSeq
    def latestPerKey(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col("__pri").desc +: tiebreak: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__pri", "__rn")
    }
    val mergedAll = currentPath match {
      case None =>
        if (orderCol.isEmpty) batch.dropDuplicates(keyCol)
        else latestPerKey(batch.withColumn("__pri", lit(1)))
      case Some(p) =>
        val cur = spark.read.parquet(p).withColumn("__pri", lit(0))
        val nw = batch.withColumn("__pri", lit(1))
        latestPerKey(cur.unionByName(nw))
    }
    // tombstone semantics: if the key's LATEST version is a delete
    // marker, the key leaves the snapshot (rather than surviving as a
    // marked row)
    val merged = deletedCol match {
      case Some(c) if mergedAll.schema.fieldNames.contains(c) =>
        mergedAll.filter(col(c).isNull || col(c) =!= "true")
      case _ => mergedAll
    }
    val target = s"$root/v$batchId"
    val previous = currentPath
    merged.write.mode("overwrite").parquet(target)
    val tmp = Paths.get(root, s"_CURRENT.tmp$batchId")
    Files.writeString(tmp, target)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // retention: a long-running stream would otherwise accumulate one
    // full snapshot per micro-batch. Keep the new version plus the
    // immediately-previous one (in-flight readers may still hold it);
    // everything older is unreachable and deleted.
    prune(keep = Set(target) ++ previous)
  }

  private def prune(keep: Set[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val stream = Files.list(Paths.get(root))
    try {
      stream.iterator().asScala
        .filter(_.getFileName.toString.startsWith("v"))
        .filterNot(p => keep.contains(p.toString))
        .toSeq
        .foreach { dir =>
          Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(p => Files.deleteIfExists(p))
        }
    } finally stream.close()
  }
}
