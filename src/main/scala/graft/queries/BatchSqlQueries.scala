package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** General batch-SQL engine surface (SURVEY.md §2.9 closure set: sorts,
  * limits, set ops, window functions, windowed/distinct/grouped aggs,
  * HAVING, semi/anti joins, scalar functions, CASE/CAST) — each verified
  * against a DuckDB oracle.
  *
  * Determinism across engines: double sums are order-dependent, so every
  * money aggregate is computed on an exact integer grid
  * (`round(x*100)::LONG`, cents) and divided back at the end — the sum is
  * then order-independent and bit-identical in Spark and DuckDB. Derived
  * integers are cast to BIGINT on both sides (Spark INT vs DuckDB BIGINT
  * would fail the driver's schema compare).
  */
object BatchSqlQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast(LongType)

  /** TPC-H Q1-style pricing summary (full scan + 2-key grouped agg with
    * map-side partial aggregation; the canonical 100 TB-friendly shape). */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
          .as("sum_disc_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
          * (lit(100L) + cents(col("l_tax")))) / 1000000.0).as("sum_charge"),
        (sum(cents(col("l_quantity"))).cast(DoubleType) / (count(lit(1)) * 100.0)).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
      |  SUM(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
      |  SUM(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0 AS sum_disc_price,
      |  SUM(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT))*(100 + CAST(round(l_tax*100) AS BIGINT)))/1000000.0 AS sum_charge,
      |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/(COUNT(*)*100.0) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style top-k revenue: 3-way join (dim broadcast), grouped
    * agg on exact cents, deterministic ORDER BY + LIMIT. */
  def q3TopkRevenue(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .groupBy(o("o_orderkey"), o("o_orderdate"))
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
        .as("revenue"))
      .select(col("o_orderkey").as("order_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("order_id"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT o.o_orderkey AS order_id,
      |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
      |       SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l.l_discount*100) AS BIGINT)))/10000.0 AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY o.o_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, order_id LIMIT 10""".stripMargin

  /** ORDER BY + LIMIT (Spark plans a TakeOrderedAndProject — no global
    * sort materialization; at scale this is a per-partition top-k merge). */
  def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey").as("order_id"), col("o_totalprice").as("price"))
      .orderBy(col("price").desc, col("order_id"))
      .limit(20)

  val sortLimitSql: String =
    """SELECT o_orderkey AS order_id, o_totalprice AS price
      |FROM orders ORDER BY price DESC, order_id LIMIT 20""".stripMargin

  /** Set operations: UNION (distinct), EXCEPT. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val building = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = Tables.orders(s, d).filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("custkey"))
    val lowNation = Tables.customer(s, d).filter(col("c_nationkey") < 5)
      .select(col("c_custkey").as("custkey"))
    building.union(bigSpenders).distinct().except(lowNation)
  }

  val setOpsSql: String =
    """SELECT custkey FROM (
      |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION
      |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000)
      |EXCEPT
      |SELECT c_custkey AS custkey FROM customer WHERE c_nationkey < 5""".stripMargin

  /** INTERSECT as its own surface entry. */
  def intersectOp(s: SparkSession, d: String): DataFrame = {
    val machinery = Tables.customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("custkey"))
    val buyers = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
    machinery.intersect(buyers)
  }

  val intersectSql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders""".stripMargin

  /** Ranking / analytic window functions: row_number, rank, lag, running
    * sum over an explicit ROWS frame with a unique ordering. */
  def windowFunctions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRank = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("custkey"),
      row_number().over(w).cast(LongType).as("rn"),
      rank().over(wRank).cast(LongType).as("price_rank"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      (sum(cents(col("o_totalprice")))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / 100.0)
        .as("running_spend"))
  }

  val windowFunctionsSql: String =
    """SELECT o_orderkey AS order_id, o_custkey AS custkey,
      |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
      |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank,
      |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
      |  SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS running_spend
      |FROM orders""".stripMargin

  /** Tumbling event-time window aggregation (batch analog of the
    * streaming windowed agg; date_trunc == 1h tumbling window start).
    * Arbitrary-precision doubles are summed on a fixed 1e-6 grid with
    * floor() — exact, order-independent, identical cross-engine. */
  def tumblingAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 1000000).cast(LongType)) / 1000000.0).as("sum_value"))
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  val tumblingAggSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, COUNT(*) AS n,
      |       SUM(CAST(floor("value"*1000000) AS BIGINT))/1000000.0 AS sum_value
      |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin

  /** Hopping windows (1 h size, 15 min hop — ksqlDB `WINDOW HOPPING`):
    * every event lands in size/hop = 4 overlapping windows. Spark's
    * `window(ts, size, slide)` generates them inline (a projection,
    * not a join); both engines align buckets to the epoch so the
    * window starts agree exactly. */
  def hoppingAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 1000000).cast(LongType)) / 1000000.0).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  val hoppingAggSql: String =
    """WITH e AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', ts) tb, event_type, "value"
      |  FROM events),
      |w AS (
      |  SELECT tb - k.k * INTERVAL '15 minutes' AS ws, event_type, "value"
      |  FROM e, (SELECT unnest(generate_series(0, 3)) k) k)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
      |       COUNT(*) AS n,
      |       SUM(CAST(floor("value"*1000000) AS BIGINT))/1000000.0 AS sum_value
      |FROM w GROUP BY ws, event_type""".stripMargin

  /** Session windows (30 min inactivity gap) per user — batch form of
    * the streaming session aggregation; oracle = gaps-and-islands. */
  def sessionWindowAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        col("n"))

  /** Distinct aggregation (Spark expands to a two-phase agg). */
  def distinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_orderkey")).as("n_ord"),
        count(lit(1)).as("n"))

  val distinctAggSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
      |       COUNT(DISTINCT l_orderkey) AS n_ord, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** ROLLUP grouping sets (subtotals + grand total). */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))

  val rollupSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       SUM(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** CUBE grouping sets. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))

  val cubeSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |       COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin

  /** GROUP BY + HAVING. */
  def havingAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("max_price"))
      .filter(col("n_orders") >= 12)

  val havingSql: String =
    """SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |       MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12""".stripMargin

  /** LEFT SEMI join (EXISTS). */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
  }

  val semiJoinSql: String =
    """SELECT c_custkey AS custkey, c_name AS name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)""".stripMargin

  /** LEFT ANTI join (NOT EXISTS). */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
  }

  val antiJoinSql: String =
    """SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin

  /** Scalar string/math function surface. */
  def scalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey").as("partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).cast(LongType).as("name_len"),
      substring(col("p_type"), 1, 5).as("type5"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      abs(col("p_size") - 25).cast(LongType).as("size_dist"),
      (col("p_size") % 7).cast(LongType).as("size_mod"),
      floor(col("p_retailprice")).as("price_floor"))

  val scalarFuncsSql: String =
    """SELECT p_partkey AS partkey, upper(p_brand) AS brand_u,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       substr(p_type, 1, 5) AS type5,
      |       concat(p_brand, '#', p_type) AS brand_type,
      |       CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
      |       CAST(p_size % 7 AS BIGINT) AS size_mod,
      |       CAST(floor(p_retailprice) AS BIGINT) AS price_floor
      |FROM part""".stripMargin

  /** Date/time scalar functions. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").as("order_id"),
      year(col("o_orderdate")).cast(LongType).as("yr"),
      month(col("o_orderdate")).cast(LongType).as("mo"),
      dayofmonth(col("o_orderdate")).cast(LongType).as("dy"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType))
        .cast(LongType).as("days_since"))

  val dateFuncsSql: String =
    """SELECT o_orderkey AS order_id,
      |       CAST(year(o_orderdate) AS BIGINT) AS yr,
      |       CAST(month(o_orderdate) AS BIGINT) AS mo,
      |       CAST(day(o_orderdate) AS BIGINT) AS dy,
      |       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
      |FROM orders""".stripMargin

  /** CASE WHEN bucketing + explicit floor-based cast (double→bigint cast
    * truncates in Spark but rounds in DuckDB — floor() first on both
    * sides keeps them identical). */
  def caseCast(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("bucket"),
        floor(col("o_totalprice")).cast(LongType).as("price_int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("price_int")).cast(DoubleType).as("sum_price_int"))

  val caseCastSql: String =
    """SELECT CASE WHEN o_totalprice > 200000 THEN 'high'
      |            WHEN o_totalprice > 100000 THEN 'mid'
      |            ELSE 'low' END AS bucket,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS DOUBLE) AS sum_price_int
      |FROM (SELECT o_totalprice FROM orders)
      |GROUP BY 1""".stripMargin

  /** Conditional (pivot-style) aggregation. */
  def conditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))

  val conditionalAggSql: String =
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
      |FROM events GROUP BY user_id""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _,
    "q3_topk_revenue" -> q3TopkRevenue _,
    "q_sort_limit" -> sortLimit _,
    "q_set_ops" -> setOps _,
    "q_intersect" -> intersectOp _,
    "q_window_functions" -> windowFunctions _,
    "q_tumbling_agg" -> tumblingAgg _,
    "q_hopping_agg" -> hoppingAgg _,
    "q_session_window" -> sessionWindowAgg _,
    "q_distinct_agg" -> distinctAgg _,
    "q_rollup" -> rollupAgg _,
    "q_cube" -> cubeAgg _,
    "q_having" -> havingAgg _,
    "q_semi_join" -> semiJoin _,
    "q_anti_join" -> antiJoin _,
    "q_scalar_funcs" -> scalarFuncs _,
    "q_date_funcs" -> dateFuncs _,
    "q_case_cast" -> caseCast _,
    "q_conditional_agg" -> conditionalAgg _)

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q3_topk_revenue" -> q3Sql,
    "q_sort_limit" -> sortLimitSql,
    "q_set_ops" -> setOpsSql,
    "q_intersect" -> intersectSql,
    "q_window_functions" -> windowFunctionsSql,
    "q_tumbling_agg" -> tumblingAggSql,
    "q_hopping_agg" -> hoppingAggSql,
    "q_session_window" -> StreamingQueries.sessionAggSql,
    "q_distinct_agg" -> distinctAggSql,
    "q_rollup" -> rollupSql,
    "q_cube" -> cubeSql,
    "q_having" -> havingSql,
    "q_semi_join" -> semiJoinSql,
    "q_anti_join" -> antiJoinSql,
    "q_scalar_funcs" -> scalarFuncsSql,
    "q_date_funcs" -> dateFuncsSql,
    "q_case_cast" -> caseCastSql,
    "q_conditional_agg" -> conditionalAggSql)
}
