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

  /** The joined-but-not-yet-aggregated frame of [[bucketedJoin]],
    * exposed so the plan spec can assert the join itself needs NO
    * exchange (the aggregation after it legitimately shuffles). */
  private[graft] def bucketedJoinRows(s: SparkSession, d: String): DataFrame = {
    def save(df: DataFrame, key: String, table: String): Unit =
      df.write.mode("overwrite").format("parquet")
        .bucketBy(8, key).sortBy(key)
        .option("path", tmp(s"graft-bucketed-$table"))
        .saveAsTable(table)
    save(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
      "l_orderkey", "graft_bucketed_lineitem")
    save(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus")),
      "o_orderkey", "graft_bucketed_orders")
    s.table("graft_bucketed_lineitem")
      .join(s.table("graft_bucketed_orders"),
        col("l_orderkey") === col("o_orderkey"))
  }

  /** Bucketed co-located join — the 100 TB strategy for a fact–fact
    * join too big to broadcast: both tables are WRITTEN bucketed (and
    * sorted) on the join key, so the join reads bucket i against
    * bucket i directly and the usual both-sides shuffle disappears
    * from the plan entirely (EnsureRequirements sees the bucketed
    * scan's hashpartitioning already satisfies the join). This is the
    * write-once/join-many layout: pay one clustered write, then every
    * subsequent join on that key is exchange-free. The catalog result
    * aggregates (small, stable oracle); the plan property is pinned on
    * [[bucketedJoinRows]]. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame =
    bucketedJoinRows(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).cast(org.apache.spark.sql.types.LongType).as("n"),
        (sum(round(col("l_quantity") * 100)
          .cast(org.apache.spark.sql.types.LongType)) / 100.0).as("sum_qty"))

  val bucketedJoinSql: String =
    """SELECT o_orderstatus,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  SUM(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_roundtrip" -> csvRoundtrip _,
    "src_json_roundtrip" -> jsonRoundtrip _,
    "src_orc_roundtrip" -> orcRoundtrip _,
    "src_partitioned_parquet" -> partitionedParquet _,
    "src_bucketed_join" -> bucketedJoin _)

  def oracles: Map[String, String] = Map(
    "src_csv_roundtrip" -> csvRoundtripSql,
    "src_json_roundtrip" -> jsonRoundtripSql,
    "src_orc_roundtrip" -> orcRoundtripSql,
    "src_partitioned_parquet" -> partitionedParquetSql,
    "src_bucketed_join" -> bucketedJoinSql)
}
