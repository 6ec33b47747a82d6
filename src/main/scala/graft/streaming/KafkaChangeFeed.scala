package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production ingress façade: the reference's actual transport is
  * Kafka + Schema Registry (reference docker-compose.yml:51-80,
  * README.md:389). This produces the exact (key, value, offset, ts)
  * column contract [[ChangeFeed]] provides offline, but from
  * `spark.readStream.format("kafka")` — so the Pipeline's operator
  * graph runs unchanged against a real cluster by swapping the feed.
  *
  * The "kafka" source is resolved by name through DataSource V2
  * lookup, so this module compiles without the connector jar; in an
  * environment without `spark-sql-kafka-0-10` (this sandbox —
  * SURVEY.md §7) `isAvailable` is false and `df` fails fast with
  * Spark's standard missing-source error. Notes for production:
  *
  *  - `value` is cast to string NULL-PRESERVINGLY: a Kafka tombstone
  *    (null payload) stays a null `value`, which
  *    [[DebeziumEnvelope.unwrap]]'s `tombstoneKey` turns into a key
  *    deletion — the `drop.tombstones=false` path (README.md:363).
  *  - `startingOffsets=earliest` is the reference's
  *    `auto.offset.reset` (op S0, README.md:346).
  *  - Avro-encoded topics additionally need `spark-avro`'s
  *    `from_avro(value, schema)` in place of the JSON parse; the
  *    downstream operators are payload-format-agnostic.
  */
object KafkaChangeFeed {

  /** True when the spark-sql-kafka connector is on the classpath. */
  def isAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Kafka-topic change feed with [[ChangeFeed]]'s column contract:
    * (key string, value string nullable, offset long, ts timestamp).
    * When the caller doesn't pass `startingOffsets`, the ksql-ported
    * session property `auto.offset.reset` (set via
    * `GraftSql.sql(spark, "SET 'auto.offset.reset' = '...'")`, op S0)
    * decides, defaulting to earliest as the reference does.
    *
    * `format` selects the source provider: "kafka" in production;
    * [[FakeKafka]]'s "fakekafka" (same column schema, same options)
    * lets the whole façade run in-JVM — the golden pipeline exercises
    * this path end-to-end in `KafkaFacadePipelineSpec`. */
  def df(spark: SparkSession, bootstrapServers: String, topic: String,
         startingOffsets: String = null,
         format: String = "kafka"): DataFrame = {
    val offsets = Option(startingOffsets).getOrElse {
      val v = spark.conf.get("auto.offset.reset", "earliest")
      // validate conf-sourced values HERE, where the property name is
      // known — an invalid value failing later inside the Kafka source
      // would blame startingOffsets and point at neither SET statement
      // nor property
      if (v != "earliest" && v != "latest")
        throw new IllegalArgumentException(
          s"session property auto.offset.reset='$v' is not portable to a " +
            "Spark Kafka source: use 'earliest' or 'latest' (ksql 'none' " +
            "has no Spark equivalent), or pass startingOffsets explicitly")
      v
    }
    spark.readStream.format(format)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", offsets)
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("partition"),
        col("offset"),
        col("timestamp").as("ts"))
  }
}
