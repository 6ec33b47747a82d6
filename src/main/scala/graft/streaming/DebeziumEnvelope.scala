package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2/S3: Debezium change-event envelope unwrap (SURVEY.md §1.5, §2.1).
  *
  * Re-expresses the reference's Single-Message Transforms
  * (`ExtractNewRecordState` with `delete.handling.mode=rewrite` for
  * Postgres, reference README.md:361-364; `ExtractNewDocumentState` with
  * `delete.handling.mode=drop`, README.md:379-383) as plain Spark column
  * expressions — fully codegen'd, no UDFs, works identically on batch and
  * streaming DataFrames.
  *
  * Envelope shape: {before, after, op, ts_ms} where op ∈ c|u|d|r.
  *  - Rewrite: deletes surface the `before` image plus __deleted='true';
  *    upserts surface `after` plus __deleted='false'.
  *  - Drop: delete events are filtered out; upserts surface `after` and
  *    the op code is kept as metadata column __op (the reference records
  *    it in a Kafka header, `operation.header=true`).
  */
object DebeziumEnvelope {

  sealed trait DeleteMode
  case object Rewrite extends DeleteMode
  case object Drop extends DeleteMode

  def envelopeSchema(after: StructType): StructType = StructType(Seq(
    StructField("before", after), StructField("after", after),
    StructField("op", StringType), StructField("ts_ms", LongType)))

  /** @param passthrough  source columns (e.g. `offset`, `ts`) to carry
    *                      through alongside the unwrapped fields.
    * @param tombstoneKey  Kafka tombstone handling: a record whose raw
    *                      value IS NULL (no JSON at all — the compaction
    *                      marker Debezium emits after a delete when
    *                      `drop.tombstones=false`, reference
    *                      README.md:363). `Some(srcKeyCol -> targetField)`
    *                      surfaces it in Rewrite mode as a delete row
    *                      whose `targetField` is the topic key and
    *                      `__deleted='true'` — exactly how ksqlDB drops
    *                      the table row for a tombstone. In Drop mode
    *                      tombstones are always filtered out (the Mongo
    *                      SMT's `drop.tombstones=true` default,
    *                      README.md:379-383). */
  def unwrap(df: DataFrame, valueCol: Column, afterSchema: StructType,
             mode: DeleteMode, passthrough: Seq[String] = Nil,
             tombstoneKey: Option[(String, String)] = None): DataFrame = {
    val parsed = df.withColumn("__env",
      from_json(valueCol, envelopeSchema(afterSchema)))
    val extra = passthrough.map(col)
    // only a caller that opted into tombstone handling (and told us
    // which field carries the key) treats null values as deletions;
    // otherwise a null value stays an inert __deleted='false' row with
    // null fields — marking it deleted without a key would emit a
    // keyless delete that removes a key literally named "null"
    val isTomb =
      if (tombstoneKey.isDefined) valueCol.isNull else lit(false)
    mode match {
      case Rewrite =>
        val cols = afterSchema.fields.map { f =>
          val unwrapped = when(col("__env.op") === "d",
              col(s"__env.before.${f.name}"))
            .otherwise(col(s"__env.after.${f.name}"))
          (tombstoneKey match {
            case Some((src, target)) if target == f.name =>
              when(isTomb, col(src).cast(f.dataType)).otherwise(unwrapped)
            case _ => unwrapped
          }).as(f.name)
        }
        val deleted = when(isTomb || col("__env.op") === "d", lit("true"))
          .otherwise(lit("false")).as("__deleted")
        parsed.select(cols.toSeq ++ Seq(deleted) ++ extra: _*)
      case Drop =>
        // tombstones always dropped here (the Mongo SMT's
        // drop.tombstones=true default), independent of tombstoneKey
        parsed
          .filter(valueCol.isNotNull &&
            (col("__env.op").isNull || col("__env.op") =!= "d"))
          .select(afterSchema.fields.map(f =>
            col(s"__env.after.${f.name}").as(f.name)).toSeq ++
            Seq(col("__env.op").as("__op")) ++ extra: _*)
    }
  }
}
