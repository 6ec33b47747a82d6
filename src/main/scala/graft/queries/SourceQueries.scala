package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** File-format source/sink surface (the K1 "named output" analog +
  * format coverage the reference's Kafka topics imply): write a table
  * to a format, read it back, and prove losslessness against the
  * original relation's oracle. The partitioned-parquet query
  * additionally exercises partition PRUNING — the scan must touch only
  * the filtered partition directory (the 100 TB layout: data
  * partitioned by a low-cardinality key so queries skip whole
  * directories). */
object SourceQueries {

  /** Fixed per-name scratch dirs + overwrite mode: repeated harness
    * runs reuse the same paths instead of accumulating abandoned
    * table copies in /tmp. */
  private def tmp(prefix: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-roundtrips", prefix)
    Files.createDirectories(p.getParent)
    p.toString
  }

  /** CSV sink + schema-ful CSV source round-trip. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft-csv-")
    val r = Tables.region(s, d)
    r.write.mode("overwrite").option("header", "true").csv(out)
    s.read.schema(r.schema).option("header", "true").csv(out)
  }

  val csvRoundtripSql: String = "SELECT r_regionkey, r_name FROM region"

  /** JSON-lines sink + source round-trip. */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft-json-")
    val n = Tables.nation(s, d)
    n.write.mode("overwrite").json(out)
    s.read.schema(n.schema).json(out)
  }

  val jsonRoundtripSql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation"

  /** ORC sink + source round-trip (second columnar format). */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft-orc-")
    val p = Tables.supplier(s, d)
    p.write.mode("overwrite").orc(out)
    s.read.orc(out)
  }

  val orcRoundtripSql: String =
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"

  /** Hive-style partitioned parquet write, then a filtered read that
    * prunes to one partition directory. */
  def partitionedParquet(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft-part-")
    Tables.customer(s, d).write.mode("overwrite")
      .partitionBy("c_mktsegment").parquet(out)
    s.read.parquet(out)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
  }

  val partitionedParquetSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_roundtrip" -> csvRoundtrip _,
    "src_json_roundtrip" -> jsonRoundtrip _,
    "src_orc_roundtrip" -> orcRoundtrip _,
    "src_partitioned_parquet" -> partitionedParquet _)

  def oracles: Map[String, String] = Map(
    "src_csv_roundtrip" -> csvRoundtripSql,
    "src_json_roundtrip" -> jsonRoundtripSql,
    "src_orc_roundtrip" -> orcRoundtripSql,
    "src_partitioned_parquet" -> partitionedParquetSql)
}
