package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** A Kafka-topic-shaped change feed (SURVEY.md §1.1): ordered records
  * of (key, value, partition, offset, ts). Offline the transport is a
  * `MemoryStream` (no Kafka connector jar in this environment —
  * SURVEY.md §7); in production the same columns come from
  * `spark.readStream.format("kafka")` with `startingOffsets=earliest`
  * (op S0, reference README.md:346). Offset order is load-bearing:
  * `latest_by_offset` (A2) resolves ties by it, exactly as ksqlDB does
  * per partition (reference README.md:436-437). The in-process log is
  * a SINGLE partition (0) — the one total order the offline analog
  * promises; ksql's ROWPARTITION/ROWOFFSET pseudo-columns map onto
  * these columns in the DDL layer.
  */
case class KRecord(key: String, value: String, offset: Long, ts: Timestamp)

class ChangeFeed(spark: SparkSession) {
  import spark.implicits._
  implicit private val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  val stream: MemoryStream[KRecord] = MemoryStream[KRecord]
  private var nextOffset = 0L
  private val pending = scala.collection.mutable.ArrayBuffer.empty[KRecord]

  def df: DataFrame = stream.toDF()
    .withColumn("partition",
      org.apache.spark.sql.functions.lit(0))
    .select(org.apache.spark.sql.functions.col("key"),
      org.apache.spark.sql.functions.col("value"),
      org.apache.spark.sql.functions.col("partition"),
      org.apache.spark.sql.functions.col("offset"),
      org.apache.spark.sql.functions.col("ts"))

  /** Stage values with auto-assigned monotonically increasing offsets.
    * Staged records become visible to the stream on `flush()` — the
    * Pipeline flushes feeds in dataflow order so a test step is
    * deterministic (the topic analog: data exists once produced, but
    * consumers advance under controlled scheduling). */
  def add(keyed: (String, String)*): Unit = synchronized {
    val now = new Timestamp(System.currentTimeMillis())
    pending ++= keyed.map { case (k, v) =>
      val r = KRecord(k, v, nextOffset, now)
      nextOffset += 1
      r
    }
  }

  def flush(): Unit = synchronized {
    if (pending.nonEmpty) {
      stream.addData(pending.toIndexedSeq)
      pending.clear()
    }
  }
}

/** Builders for Debezium-shaped change-event JSON (test/demo producers
  * for the S2/S3 unwrap operator). */
object DebeziumJson {
  private def jsonObj(fields: Seq[(String, Any)]): String =
    fields.map {
      case (k, v: String) => s""""$k":"${v.replace("\"", "\\\"")}""""
      case (k, v: Int) => s""""$k":$v"""
      case (k, v: Long) => s""""$k":$v"""
      case (k, v: Double) => s""""$k":$v"""
      case (k, null) => s""""$k":null"""
      case (k, v) => s""""$k":"$v""""
    }.mkString("{", ",", "}")

  def upsert(fields: (String, Any)*): String =
    s"""{"after":${jsonObj(fields)},"op":"u"}"""

  def insert(fields: (String, Any)*): String =
    s"""{"after":${jsonObj(fields)},"op":"c"}"""

  def delete(fields: (String, Any)*): String =
    s"""{"before":${jsonObj(fields)},"op":"d"}"""
}
