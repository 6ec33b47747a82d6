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
  *                    tombstone semantics for a durable table). */
class KeyedParquetSink(spark: SparkSession, root: String, keyCol: String,
                       deletedCol: Option[String] = None) {
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
    val mergedAll = currentPath match {
      case None => batch.dropDuplicates(keyCol)
      case Some(p) =>
        val cur = spark.read.parquet(p).withColumn("__pri", lit(0))
        val nw = batch.withColumn("__pri", lit(1))
        val w = Window.partitionBy(col(keyCol)).orderBy(col("__pri").desc)
        cur.unionByName(nw)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__pri", "__rn")
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
    merged.write.mode("overwrite").parquet(target)
    val tmp = Paths.get(root, s"_CURRENT.tmp$batchId")
    Files.writeString(tmp, target)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
