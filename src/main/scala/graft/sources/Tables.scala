package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Batch table loader over the driver-generated parquet testdata
  * (TESTDATA.md). One parquet file per table under `sfDir`.
  *
  * Scale notes (100 TB design): `spark.read.parquet` gives Catalyst a
  * `FileSourceScanExec` with predicate pushdown + column pruning; at
  * cluster scale the same call reads a partitioned directory tree and
  * prunes partitions. Callers should always `.select`/`.filter` early
  * so pruning reaches the scan — never cache whole tables.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** Normalize events.ts to a plain microsecond TIMESTAMP whatever
    * physical type the driver generated this round:
    *  - TIMESTAMP(NANOS), which Spark only reads as LongType
    *    (spark.sql.legacy.parquet.nanosAsLong=true, set in the session
    *    builders) → exact integer division to micros, the same
    *    truncation DuckDB applies reading nanos;
    *  - TIMESTAMP(MICROS) without UTC adjustment, which Spark infers
    *    as TIMESTAMP_NTZ → cast to TIMESTAMP. All session builders pin
    *    spark.sql.session.timeZone=UTC, so the cast reinterprets the
    *    naive value as the same UTC instant DuckDB's epoch functions
    *    assume for naive timestamps — `unix_micros`, watermarks and
    *    window() downstream keep working unchanged.
    * Shared by the batch loader and the streaming reader so the
    * normalization rule lives in exactly one place. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(apply(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
