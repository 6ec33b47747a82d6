package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A2/A3: `latest_by_offset` table materialization (reference
  * README.md:434-441) — a changelog stream becomes a keyed TABLE whose
  * row per key is the value at the greatest offset.
  *
  * Streaming form: update-mode `groupBy(key).agg(max_by(struct(values),
  * offset))`. `max_by` is a declarative aggregate with a map-side
  * partial, so each micro-batch shuffles one candidate row per key per
  * map partition — the same per-key state ksqlDB keeps in RocksDB, but
  * with Spark's state store carrying it across batches
  * (`StateStoreSaveExec`; use RocksDBStateStoreProvider at scale).
  */
object LatestByKey {

  def table(df: DataFrame, keyCol: String, offsetCol: String,
            valueCols: Seq[String]): DataFrame =
    df.groupBy(col(keyCol))
      .agg(max_by(struct(valueCols.map(col): _*), col(offsetCol)).as("__latest"))
      .select(col(keyCol) +: valueCols.map(c => col(s"__latest.$c").as(c)): _*)
}

/** A3 + J1's table side: a continuously upserted dimension snapshot.
  *
  * The update-mode table stream feeds `upsert` per micro-batch
  * (`foreachBatch`); readers get a consistent static DataFrame of the
  * current state via `df`. A `__deleted='true'` row (S2 rewrite mode)
  * removes its key — the ksqlDB tombstone (SURVEY.md §7 "what is hard"
  * #2).
  *
  * Scale contract: this store backs the *broadcast side* of the
  * enrichment join, so it is bounded by the same "dimension fits in an
  * executor" assumption a broadcast join makes. At 100 TB fact scale the
  * production analog is an upserted Delta/parquet table maintained by
  * the same foreachBatch; the in-memory form keeps the offline engine
  * dependency-free.
  */
class SnapshotStore(val schema: StructType, keyField: String,
                    deletedField: String = "__deleted") {
  private val rows = new java.util.concurrent.ConcurrentHashMap[String, Row]()

  def upsert(batch: DataFrame): Unit = {
    val hasDeleted = batch.schema.fieldNames.contains(deletedField)
    batch.collect().foreach { r =>
      val k = String.valueOf(r.getAs[Any](keyField))
      val deleted = hasDeleted && r.getAs[String](deletedField) == "true"
      if (deleted) rows.remove(k)
      else rows.put(k, Row.fromSeq(schema.fieldNames.toSeq.map(f => r.getAs[Any](f))))
    }
  }

  /** Current state as a static DataFrame (re-read per micro-batch by
    * the enrichment join — lookup-at-processing-time semantics). */
  def df(spark: SparkSession): DataFrame = {
    val list = new java.util.ArrayList[Row](rows.values())
    spark.createDataFrame(list, schema)
  }

  def size: Int = rows.size()
}
