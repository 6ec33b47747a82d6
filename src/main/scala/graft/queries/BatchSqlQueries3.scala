package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Third tranche of SQL-surface closure: bag-semantics UNION ALL,
  * explicit cross join, null-handling scalars, LIKE, regexp
  * extraction, string padding/translation. */
object BatchSqlQueries3 {

  def unionAll(s: SparkSession, d: String): DataFrame = {
    val hi = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
      .select(col("o_orderkey").as("order_id"), lit("high").as("tier"))
    val lo = Tables.orders(s, d).filter(col("o_totalprice") < 2000)
      .select(col("o_orderkey").as("order_id"), lit("low").as("tier"))
    hi.unionAll(lo)
  }

  val unionAllSql: String =
    """SELECT o_orderkey AS order_id, 'high' AS tier FROM orders WHERE o_totalprice > 250000
      |UNION ALL
      |SELECT o_orderkey AS order_id, 'low' AS tier FROM orders WHERE o_totalprice < 2000""".stripMargin

  /** Explicit small cross join (cartesian surface). */
  def crossJoinSmall(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select(col("r_name").as("region"))
      .crossJoin(Tables.nation(s, d).select(col("n_name").as("nation")))

  val crossJoinSql: String =
    """SELECT r.r_name AS region, n.n_name AS nation
      |FROM region r CROSS JOIN nation n""".stripMargin

  /** Null-handling scalar surface: nullif/coalesce/isnull arithmetic. */
  def nullHandling(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("__default"))
        .as("seg_or_default"),
      isnull(nullif(col("c_nationkey"), lit(0))).cast(LongType).as("is_nation0"),
      when(col("c_acctbal") < 0, null).otherwise(col("c_acctbal")).as("pos_bal"))

  val nullHandlingSql: String =
    """SELECT c_custkey AS custkey,
      |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '__default') AS seg_or_default,
      |  CAST(NULLIF(c_nationkey, 0) IS NULL AS BIGINT) AS is_nation0,
      |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal
      |FROM customer""".stripMargin

  /** LIKE / pattern matching. */
  def likePatterns(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_type").like("%BRUSHED%") || col("p_name").like("g%n%"))
      .select(col("p_partkey").as("partkey"), col("p_type"), col("p_name"))

  val likePatternsSql: String =
    """SELECT p_partkey AS partkey, p_type, p_name FROM part
      |WHERE p_type LIKE '%BRUSHED%' OR p_name LIKE 'g%n%'""".stripMargin

  /** Regexp extraction + string padding/translate (identical regex
    * semantics for these simple patterns across engines). */
  def regexpStrings(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey").as("partkey"),
      regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_head"),
      lpad(col("p_brand"), 12, "_").as("brand_pad"),
      translate(col("p_name"), "aeiou", "AEIOU").as("name_vowels"),
      rtrim(concat(col("p_brand"), lit("  "))).as("brand_rtrim"))

  val regexpStringsSql: String =
    """SELECT p_partkey AS partkey,
      |  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
      |  lpad(p_brand, 12, '_') AS brand_pad,
      |  translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
      |  rtrim(p_brand || '  ') AS brand_rtrim
      |FROM part""".stripMargin

  /** RANGE window frame: per-customer 30-day trailing spend, on an
    * integer day grid so both engines share exact frame semantics. */
  def rangeFrame(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayN = datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("__day"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("__day", dayN.cast(LongType))
      .select(col("o_orderkey").as("order_id"),
        col("o_custkey").as("custkey"),
        col("__day").as("day_n"),
        (sum(round(col("o_totalprice") * 100).cast(LongType)).over(w) / 100.0)
          .as("trailing_30d_spend"))
  }

  val rangeFrameSql: String =
    """SELECT o_orderkey AS order_id, o_custkey AS custkey,
      |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS day_n,
      |  SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)/100.0 AS trailing_30d_spend
      |FROM orders""".stripMargin

  /** SCD TYPE-2 dimension build — the warehouse history table a CDC
    * changelog feeds: per user, each run of consecutive identical
    * states collapses to one versioned row with [valid_from,
    * valid_to) bounds (valid_to null on the current version). Change
    * points come from lag() (state differs from the previous event),
    * bounds from lead() over just the change points — two window
    * passes sharing ONE (user_id)-partitioned sort, no self-join. At
    * 100 TB this is the standard one-shuffle dimension-history
    * rebuild; the incremental form applies the same window per
    * micro-batch partition-locally. Timestamps are formatted so the
    * hash compares exact microseconds. */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val events = Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("state"),
        col("ts"), col("event_id"))
      .withColumn("__prev", lag(col("state"), 1).over(order))
      .filter(col("__prev").isNull || col("__prev") =!= col("state"))
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    events
      .withColumn("__to", lead(col("ts"), 1).over(order))
      .select(col("user_id"), col("state"),
        date_format(col("ts"), fmt).as("valid_from"),
        date_format(col("__to"), fmt).as("valid_to"),
        when(col("__to").isNull, 1L).otherwise(0L).as("is_current"))
  }

  val scd2HistorySql: String =
    """WITH marked AS (
      |  SELECT user_id, event_type AS state, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, state, ts, event_id FROM marked
      |  WHERE prev IS NULL OR prev <> state)
      |SELECT user_id, state,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |  strftime(lead(ts) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      |  CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_current
      |FROM chg""".stripMargin

  /** Point-in-time read over the SCD2 history ([[scd2History]]'s
    * consumer side): each user's state AS OF a fixed instant —
    * `valid_from ≤ T < valid_to` (open versions unbounded). The
    * canonical time-travel lookup a feature store serves; one filter
    * over the history, no window. */
  def scd2AsOf(s: SparkSession, d: String): DataFrame = {
    val t = "2024-02-15 00:00:00"
    scd2History(s, d)
      .filter(col("valid_from") <= lit(t) &&
        (col("valid_to").isNull || col("valid_to") > lit(t)))
      .select(col("user_id"), col("state").as("state_asof"),
        col("valid_from"))
  }

  val scd2AsOfSql: String =
    s"""WITH h AS ($scd2HistorySql)
       |SELECT user_id, state AS state_asof, valid_from
       |FROM h
       |WHERE valid_from <= '2024-02-15 00:00:00'
       |  AND (valid_to IS NULL OR valid_to > '2024-02-15 00:00:00')"""
      .stripMargin

  /** GAPS-AND-ISLANDS: per user, contiguous runs of ACTIVE DAYS
    * (consecutive calendar days with ≥1 event) — the classic
    * streak/retention shape. The grouping key is the
    * day − dense_rank trick: within a user, consecutive days share
    * (day_n − rank), so one window + one groupBy finds every island
    * without self-joins; both engines agree exactly on the integer
    * day grid. */
  def gapsIslands(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_n"))
    Tables.events(s, d)
      .select(col("user_id"),
        datediff(col("ts").cast(DateType), lit("2024-01-01").cast(DateType))
          .cast(LongType).as("day_n"))
      .distinct()
      .withColumn("__grp", col("day_n") - dense_rank().over(w))
      .groupBy(col("user_id"), col("__grp"))
      .agg(min(col("day_n")).as("island_start"),
        max(col("day_n")).as("island_end"),
        count(lit(1)).cast(LongType).as("days_active"))
      .select(col("user_id"), col("island_start"), col("island_end"),
        col("days_active"))
  }

  val gapsIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day_n
      |  FROM events),
      |grp AS (
      |  SELECT user_id, day_n,
      |    day_n - dense_rank() OVER (PARTITION BY user_id ORDER BY day_n)
      |      AS g
      |  FROM days)
      |SELECT user_id, MIN(day_n) AS island_start, MAX(day_n) AS island_end,
      |  CAST(COUNT(*) AS BIGINT) AS days_active
      |FROM grp GROUP BY user_id, g""".stripMargin

  /** DATA-QUALITY CHECK SUITE (the Deequ/Great-Expectations shape): a
    * fixed battery of constraints evaluated in ONE pass per table —
    * each check is an aggregate over the same scan, so the whole
    * suite costs one job per table however many constraints it
    * carries (the only sane shape at 100 TB; a per-check scan
    * multiplies cost by the suite size). Violation COUNTS, not
    * booleans, so the report localizes severity. Referential
    * integrity is the one two-table check: orders→customer spelled as
    * a broadcast-friendly left-anti count. */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val customer = Tables.customer(s, d)
    def row(table: String, check: String, violations: DataFrame): DataFrame =
      violations.selectExpr(s"'$table' AS table_name",
        s"'$check' AS check_name", "CAST(v AS BIGINT) AS violations")
    val ordersChecks = orders.agg(
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("nk"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("rng"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("dom"))
    val custChecks = customer.agg(
      sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("nk"),
      (count(lit(1)) - countDistinct(col("c_custkey"))).as("dup"),
      sum(when(col("c_acctbal") < -1000, 1L).otherwise(0L)).as("rng"))
    val orphans = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    row("orders", "key_not_null", ordersChecks.selectExpr("nk AS v"))
      .unionByName(row("orders", "key_unique",
        ordersChecks.selectExpr("dup AS v")))
      .unionByName(row("orders", "price_positive",
        ordersChecks.selectExpr("rng AS v")))
      .unionByName(row("orders", "status_in_domain",
        ordersChecks.selectExpr("dom AS v")))
      .unionByName(row("customer", "key_not_null",
        custChecks.selectExpr("nk AS v")))
      .unionByName(row("customer", "key_unique",
        custChecks.selectExpr("dup AS v")))
      .unionByName(row("customer", "acctbal_range",
        custChecks.selectExpr("rng AS v")))
      .unionByName(row("orders", "fk_customer_exists", orphans))
  }

  val dqChecksSql: String =
    """WITH o AS (
      |  SELECT
      |    SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nk,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup,
      |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS rng,
      |    SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
      |        THEN 1 ELSE 0 END) AS dom
      |  FROM orders),
      |c AS (
      |  SELECT
      |    SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS nk,
      |    COUNT(*) - COUNT(DISTINCT c_custkey) AS dup,
      |    SUM(CASE WHEN c_acctbal < -1000 THEN 1 ELSE 0 END) AS rng
      |  FROM customer),
      |orph AS (
      |  SELECT COUNT(*) AS v FROM orders
      |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |SELECT 'orders' AS table_name, 'key_not_null' AS check_name,
      |  CAST(nk AS BIGINT) AS violations FROM o
      |UNION ALL SELECT 'orders', 'key_unique', CAST(dup AS BIGINT) FROM o
      |UNION ALL SELECT 'orders', 'price_positive', CAST(rng AS BIGINT) FROM o
      |UNION ALL SELECT 'orders', 'status_in_domain', CAST(dom AS BIGINT) FROM o
      |UNION ALL SELECT 'customer', 'key_not_null', CAST(nk AS BIGINT) FROM c
      |UNION ALL SELECT 'customer', 'key_unique', CAST(dup AS BIGINT) FROM c
      |UNION ALL SELECT 'customer', 'acctbal_range', CAST(rng AS BIGINT) FROM c
      |UNION ALL SELECT 'orders', 'fk_customer_exists', CAST(v AS BIGINT)
      |  FROM orph""".stripMargin

  /** MERGE INTO semantics (upsert + delete in one pass) over plain
    * parquet relations — the warehouse-maintenance statement spelled
    * as its relational core: ONE full-outer join on the key, then a
    * CASE per MERGE clause (matched+delete → drop, matched+update →
    * source values, not-matched → insert, target-only → carry). The
    * change set is derived deterministically from the key so the
    * oracle replays it: %10==3 doubles the balance, %10==7 deletes,
    * %10==1 inserts a fresh key. At 100 TB this is one key-partitioned
    * shuffle of each side — exactly what table-format MERGE executes
    * under the hood (plus file rewrite, which [[graft.streaming
    * .KeyedParquetSink]] owns in this engine). */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val target = Tables.customer(s, d)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_acctbal").as("bal"))
    val changes = Tables.customer(s, d)
      .filter((col("c_custkey") % 10).isin(1, 3, 7))
      .select(
        when(col("c_custkey") % 10 === 1, col("c_custkey") + 10000000L)
          .otherwise(col("c_custkey")).as("s_key"),
        col("c_name").as("s_name"),
        when(col("c_custkey") % 10 === 3, col("c_acctbal") * 2)
          .when(col("c_custkey") % 10 === 1, col("c_acctbal") + 1)
          .otherwise(col("c_acctbal")).as("s_bal"),
        (col("c_custkey") % 10 === 7).as("s_del"))
    target.join(changes, col("key") === col("s_key"), "full_outer")
      .filter(!coalesce(col("s_del"), lit(false))) // matched+delete drops
      .select(
        coalesce(col("key"), col("s_key")).as("custkey"),
        coalesce(col("s_name"), col("name")).as("name"),
        coalesce(col("s_bal"), col("bal")).as("acctbal"))
  }

  val mergeUpsertSql: String =
    """WITH chg AS (
      |  SELECT CASE WHEN c_custkey % 10 = 1 THEN c_custkey + 10000000
      |              ELSE c_custkey END AS s_key,
      |    c_name AS s_name,
      |    CASE WHEN c_custkey % 10 = 3 THEN c_acctbal * 2
      |         WHEN c_custkey % 10 = 1 THEN c_acctbal + 1
      |         ELSE c_acctbal END AS s_bal,
      |    (c_custkey % 10 = 7) AS s_del
      |  FROM customer
      |  WHERE c_custkey % 10 IN (1, 3, 7))
      |SELECT coalesce(t.c_custkey, c.s_key) AS custkey,
      |  coalesce(c.s_name, t.c_name) AS name,
      |  coalesce(c.s_bal, t.c_acctbal) AS acctbal
      |FROM customer t FULL OUTER JOIN chg c ON t.c_custkey = c.s_key
      |WHERE NOT coalesce(c.s_del, false)""".stripMargin

  /** ksqlDB `EARLIEST_BY_OFFSET` + `LATEST_BY_OFFSET` side by side:
    * first/last value per key in offset order — both are single-pass
    * declarative aggregates (`min_by`/`max_by`) with map-side
    * partials, so each map partition ships one candidate per key. */
  def earliestByOffset(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(min_by(col("event_type"), col("event_id")).as("earliest_type"),
        max_by(col("event_type"), col("event_id")).as("latest_type"),
        min(col("event_id")).as("first_offset"),
        max(col("event_id")).as("last_offset"))

  val earliestByOffsetSql: String =
    """SELECT user_id,
      |       arg_min(event_type, event_id) AS earliest_type,
      |       arg_max(event_type, event_id) AS latest_type,
      |       min(event_id) AS first_offset,
      |       max(event_id) AS last_offset
      |FROM events GROUP BY user_id""".stripMargin

  /** ksqlDB `COLLECT_LIST` / `COLLECT_SET`: per-key value collection.
    * Collection order is nondeterministic under parallelism, so both
    * engines sort before joining to a string — the deterministic
    * spelling of an unordered bag (and the hash-comparable one). */
  def collectAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",")
          .as("type_set"),
        array_join(sort_array(collect_list(col("event_type"))), ",")
          .as("type_bag"),
        count(lit(1)).as("n"))

  val collectAggSql: String =
    """SELECT user_id,
      |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS type_set,
      |  array_to_string(list_sort(list(event_type)), ',') AS type_bag,
      |  COUNT(*) AS n
      |FROM events GROUP BY user_id""".stripMargin

  /** ksqlDB's two-arg `LATEST_BY_OFFSET(col, N)` / `EARLIEST_BY_OFFSET
    * (col, N)` (reference README.md:436-437 shows the family): the N
    * latest / earliest values per key as an array IN ASCENDING OFFSET
    * ORDER — ksqlDB sorts the capped buffer by sequence before output,
    * so `latest_by_offset(v, 3)` ends with the single latest value.
    * Spark spelling: collect the (offset, value) pairs, sort
    * descending, slice the newest N, project the value, reverse back
    * to ascending — all builtin codegen'd collection functions, one
    * shuffle, map-side partial collect. Per-key state is the full key
    * history ONLY because this batch query keeps collect_list exact;
    * the streaming analog bounds it with `max_by`-style top-N pruning
    * per partial. Arrays joined to strings so the hash compare is
    * order-deterministic cross-engine. */
  def latestKByOffset(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        array_join(expr(
          "reverse(transform(slice(sort_array(collect_list(struct(event_id, event_type)), false), 1, 3), x -> x.event_type))"),
          ",").as("latest3"),
        array_join(expr(
          "transform(slice(sort_array(collect_list(struct(event_id, event_type)), true), 1, 3), x -> x.event_type)"),
          ",").as("earliest3"),
        count(lit(1)).cast(LongType).as("n"))

  val latestKByOffsetSql: String =
    """SELECT user_id,
      |  array_to_string(list_reverse(list(event_type ORDER BY event_id DESC)[1:3]), ',') AS latest3,
      |  array_to_string(list(event_type ORDER BY event_id ASC)[1:3], ',') AS earliest3,
      |  COUNT(*) AS n
      |FROM events GROUP BY user_id""".stripMargin

  /** Session gap for [[sessionize]], microseconds (30 minutes). */
  private[queries] val SessionGapUs = 1800L * 1000000L

  /** Gap-based sessionization — assign every EVENT its per-user
    * session number (a new session starts when the gap since the
    * user's previous event exceeds 30 minutes). This is the row-level
    * complement of `q_session_window`'s session AGGREGATE: analytics
    * that need the session id ON the event (attribution, funnel
    * stitching, per-session features) rather than per-session rollups.
    * Two windows over ONE partitioning (user_id): the lag that detects
    * the gap and the running sum that numbers the sessions — a single
    * shuffle on the user key, each user's history sorted locally, the
    * standard scalable shape for per-entity ordered scans. Exact
    * BIGINT microsecond arithmetic; ties broken by event_id so the
    * numbering is deterministic under any partitioning. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    val prev = lag(col("__us"), 1).over(byUser)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("__us"))
      .withColumn("__new", when(prev.isNull ||
        (col("__us") - prev) > SessionGapUs, 1L).otherwise(0L))
      .select(col("event_id"), col("user_id"),
        sum(col("__new")).over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(LongType).as("session_seq"))
  }

  val sessionizeSql: String =
    s"""WITH o AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
       |g AS (
       |  SELECT event_id, user_id, us,
       |    CASE WHEN lag(us) OVER w IS NULL
       |           OR us - lag(us) OVER w > $SessionGapUs
       |         THEN 1 ELSE 0 END AS n
       |  FROM o
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
       |SELECT event_id, user_id,
       |  CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS session_seq
       |FROM g""".stripMargin

  /** Ordered conversion funnel — the event-analytics staple: how many
    * users progressed view → click → purchase IN THAT ORDER (each
    * stage's FIRST occurrence strictly after the previous stage's).
    * One grouped aggregate computes each user's first-occurrence time
    * per stage (conditional min — map-side partials, one shuffle on
    * user_id), then one tiny rollup counts the stages; no joins, no
    * per-stage passes over the events. Microsecond BIGINT comparisons
    * only. */
  def eventFunnel(s: SparkSession, d: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val first = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", us)).as("v"),
        min(when(col("event_type") === "click", us)).as("c"),
        min(when(col("event_type") === "purchase", us)).as("p"))
    first.agg(
      count(lit(1)).cast(LongType).as("n_users"),
      sum(when(col("v").isNotNull, 1L).otherwise(0L)).cast(LongType)
        .as("n_viewed"),
      sum(when(col("c") > col("v"), 1L).otherwise(0L)).cast(LongType)
        .as("n_view_click"),
      sum(when(col("c") > col("v") && col("p") > col("c"), 1L).otherwise(0L))
        .cast(LongType).as("n_view_click_purchase"))
  }

  val eventFunnelSql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
      |  FROM events GROUP BY user_id)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_viewed,
      |  CAST(SUM(CASE WHEN c > v THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view_click,
      |  CAST(SUM(CASE WHEN c > v AND p > c THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view_click_purchase
      |FROM f""".stripMargin

  /** Microseconds per week — the integer cohort grid shared by both
    * spellings of [[cohortRetention]] (calendar week functions differ
    * across engines at the edges; an epoch-week index does not). */
  private val WeekUs = 7L * 86400L * 1000000L

  /** Weekly cohort retention — the product-analytics staple: users
    * cohorted by their signup week, retention = distinct active users
    * per (cohort week, weeks-since-signup). Shapes: one grouped agg
    * finds each user's signup time (map-side partials), an equi-join on
    * the user key tags every event with its cohort — the cohort
    * relation is |users|, which GROWS with the data, so it is NOT
    * broadcast-hinted: the planner broadcasts it while it fits and
    * degrades to a shuffled hash join beyond, instead of dying on the
    * broadcast limit at scale — and one final agg counts distinct
    * users per cell. All week arithmetic on an exact
    * BIGINT epoch-week grid. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) div $WeekUs").as("wk"))
    val cohorts = Tables.events(s, d)
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(expr(s"min(unix_micros(ts)) div $WeekUs").as("cohort_wk"))
    events.join(cohorts, "user_id")
      .filter(col("wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).cast(LongType).as("n_active"))
  }

  val cohortRetentionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // $WeekUs AS wk, event_type,
       |         epoch_us(ts) AS us
       |  FROM events),
       |c AS (
       |  SELECT user_id, min(us) // $WeekUs AS cohort_wk
       |  FROM e WHERE event_type = 'signup' GROUP BY user_id)
       |SELECT c.cohort_wk, e.wk - c.cohort_wk AS week_offset,
       |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
       |FROM e JOIN c ON c.user_id = e.user_id
       |WHERE e.wk >= c.cohort_wk
       |GROUP BY c.cohort_wk, e.wk - c.cohort_wk""".stripMargin

  /** Event-type transition counts — the first-order behavior model
    * (what follows what): per user, each event's successor in time
    * order, counted per (type, next type) pair. One user-key shuffle
    * for the lead window, then a tiny grouped agg over ≤ |types|²
    * rows; ties broken by event_id for cross-engine determinism. */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("__us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).cast(LongType).as("n_transitions"))
  }

  val eventTransitionsSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |t AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS next_type
      |  FROM o)
      |SELECT event_type, next_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_transitions
      |FROM t WHERE next_type IS NOT NULL
      |GROUP BY event_type, next_type""".stripMargin

  /** OHLC candlestick bars — the canonical Kafka-ETL time-series
    * rollup (the reference's events topic is exactly this shape:
    * reference README.md stream of (event_id, ts, value)): per
    * (event_type, 1 h tumbling window), open/close are the values of
    * the FIRST/LAST event in OFFSET order (`min_by`/`max_by` on the
    * monotone event_id — ksql's EARLIEST_BY_OFFSET/LATEST_BY_OFFSET
    * picked per window), high/low the extremes, volume an
    * order-independent exact-grid sum. One shuffle on the grouping
    * keys with full map-side partial aggregation — min_by/max_by
    * partials are a single (value, ord) pair per key, so the shuffle
    * carries O(groups), not O(rows), at any scale. */
  def ohlcBars(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(
        min_by(col("value"), col("event_id")).as("open_px"),
        max(col("value")).as("high_px"),
        min(col("value")).as("low_px"),
        max_by(col("value"), col("event_id")).as("close_px"),
        count(lit(1)).as("n_trades"),
        (sum(floor(col("value") * 1000000).cast(LongType)) / 1000000.0)
          .as("volume"))
      .select(
        date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("open_px"), col("high_px"), col("low_px"),
        col("close_px"), col("n_trades"), col("volume"))

  val ohlcBarsSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
      |    AS window_start,
      |  event_type,
      |  arg_min("value", event_id) AS open_px,
      |  max("value") AS high_px,
      |  min("value") AS low_px,
      |  arg_max("value", event_id) AS close_px,
      |  COUNT(*) AS n_trades,
      |  SUM(CAST(floor("value"*1000000) AS BIGINT))/1000000.0 AS volume
      |FROM events GROUP BY 1, 2""".stripMargin

  /** GROUPING() / GROUPING_ID() over a rollup — the ANSI affordance
    * that tells a rollup-generated NULL apart from a NULL in the data
    * (the one thing the bare subtotal rows can't): grouping(col) is 1
    * exactly on the rows where col was rolled away, and grouping_id()
    * is the bitmask over the rollup columns in declaration order —
    * identical semantics in DuckDB's multi-arg GROUPING. */
  def groupingId(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("b", col("user_id") % 3)
      .rollup(col("event_type"), col("b"))
      .agg(grouping(col("event_type")).cast(LongType).as("g_type"),
        grouping_id().cast(LongType).as("gid"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("b").cast(LongType).as("b"),
        col("g_type"), col("gid"), col("n"))

  val groupingIdSql: String =
    """SELECT event_type, CAST(user_id % 3 AS BIGINT) AS b,
      |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
      |  CAST(GROUPING(event_type, user_id % 3) AS BIGINT) AS gid,
      |  COUNT(*) AS n
      |FROM events GROUP BY ROLLUP(event_type, user_id % 3)""".stripMargin

  /** Row-pattern matching (MATCH_RECOGNIZE-lite, the SQL:2016 /
    * Flink-CEP capability Spark lacks natively) via SEQUENCE FOLDING:
    * each user's event history collapses to one ordered string (one
    * char per event type), and the pattern engine is plain regexp —
    * `v+c*p` counts view→click*→purchase funnels, `p.*e` flags an
    * error anywhere after a purchase. This composes the building
    * blocks Spark DOES have into whole-history pattern semantics the
    * funnel/transition queries can't express (arbitrary regex over
    * the full sequence, not fixed stage pairs). Scale shape: ONE
    * shuffle on the entity key, per-key payload bounded by events-
    * per-user (sessionize first when histories are unbounded); the
    * regex runs codegen'd per row, no driver-side graph. Patterns
    * stay in the RE2 ∩ java.util.regex common dialect (greedy
    * quantifiers, no backrefs), so the DuckDB oracle replicates the
    * match semantics exactly — ordering is pinned by (ts, event_id)
    * with micro-aligned, tie-free timestamps in the testdata. */
  def patternMatch(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      col("event_id"), unix_micros(col("ts")).as("us"),
      substring(col("event_type"), 1, 1).as("ch"))
    ev.groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"),
          col("ch")))),
        x => x.getField("ch")), "").as("seq"))
      .select(col("user_id"), col("seq"),
        length(col("seq")).cast(LongType).as("seq_len"),
        size(regexp_extract_all(col("seq"), lit("v+c*p"), lit(0)))
          .cast(LongType).as("n_funnel"),
        col("seq").rlike("p.*e").cast(LongType).as("err_after_purchase"))
  }

  val patternMatchSql: String =
    """WITH e AS (
      |  SELECT user_id, substring(event_type, 1, 1) AS ch, ts, event_id
      |  FROM events),
      |s AS (
      |  SELECT user_id, string_agg(ch, '' ORDER BY ts, event_id) AS seq
      |  FROM e GROUP BY user_id)
      |SELECT user_id, seq,
      |  CAST(length(seq) AS BIGINT) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'v+c*p')) AS BIGINT) AS n_funnel,
      |  CAST(CASE WHEN regexp_matches(seq, 'p.*e') THEN 1 ELSE 0 END
      |       AS BIGINT) AS err_after_purchase
      |FROM s""".stripMargin

  /** Events per PAA window for [[saxMotif]] (count-based tumbling, so
    * window membership is a pure function of the row's rank — no
    * ragged time-bucket edges). */
  private[queries] val SaxW = 8

  /** SAX motif discovery (Lin et al.'s Symbolic Aggregate
    * approXimation, the standard time-series indexing/mining
    * transform) made exactly-verifiable: per event type, the value
    * series (integer cents, (ts, event_id) order) is piecewise-
    * aggregated into [[SaxW]]-event window SUMS (sums, not means —
    * the integer grid stays exact), symbolized into a 4-letter
    * alphabet by the series' own rank-based quartiles (value at rank
    * ⌈qN⌉ — deterministic under ties, and 0.25/0.5/0.75 are exact
    * binary doubles so ⌈qN⌉ matches across engines), and scanned for
    * the most frequent letter TRIGRAM — the motif. Everything after
    * the one per-series shuffle is window-count-sized; at 100 TB the
    * partition key is the series id and the same plan serves millions
    * of series. Complements [[ohlcBars]] (shape summary) and
    * `q_pattern_match` (known pattern): motif discovery finds the
    * recurring shape NOBODY named in advance. */
  /** The typed event frame the SAX stages consume (shared with the
    * streaming twin, which reads the same columns off the stream). */
  private[queries] def saxEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"),
        round(col("value") * 100).cast(LongType).as("cents"))

  /** PAA stage: complete [[SaxW]]-event window sums per series. */
  private[queries] def saxSums(ev: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("us"), col("event_id"))
    ev.withColumn("rn", row_number().over(wOrd))
      .withColumn("wid", expr(s"(rn - 1) div $SaxW"))
      .groupBy(col("event_type"), col("wid"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("cnt"))
      .filter(col("cnt") === SaxW) // drop the ragged tail window
  }

  /** Symbolization breakpoints: per-series rank-based quartiles of
    * the window sums — the TRAINED artifact the streaming twin joins
    * against (broadcast; |series| rows). */
  private[queries] def saxBreakpoints(sums: DataFrame): DataFrame = {
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("s"), col("wid"))
    sums
      .withColumn("nw", count(lit(1))
        .over(Window.partitionBy(col("event_type"))))
      .withColumn("rr", row_number().over(wRank))
      .groupBy(col("event_type"), col("nw")).agg(
        min(when(col("rr") === ceil(lit(0.25) * col("nw")), col("s"))).as("b1"),
        min(when(col("rr") === ceil(lit(0.5) * col("nw")), col("s"))).as("b2"),
        min(when(col("rr") === ceil(lit(0.75) * col("nw")), col("s"))).as("b3"))
  }

  def saxMotif(s: SparkSession, d: String): DataFrame = {
    val sums = saxSums(saxEvents(s, d))
    val bps = saxBreakpoints(sums)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("wid"))
    val words = sums.join(bps, Seq("event_type"))
      .withColumn("ltr",
        when(col("s") < col("b1"), "a").when(col("s") < col("b2"), "b")
          .when(col("s") < col("b3"), "c").otherwise("d"))
      .withColumn("word", concat(col("ltr"),
        lead(col("ltr"), 1).over(wSeq), lead(col("ltr"), 2).over(wSeq)))
      .filter(col("word").isNotNull)
    val wBest = Window.partitionBy(col("event_type"))
      .orderBy(col("n_occ").desc, col("motif"))
    words.groupBy(col("event_type"), col("nw"),
        col("word").as("motif"))
      .agg(count(lit(1)).as("n_occ"))
      .withColumn("pick", row_number().over(wBest))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("motif"), col("n_occ"),
        col("nw").as("n_windows"))
  }

  val saxMotifSql: String =
    s"""WITH e AS (
      |  SELECT event_type, ts, event_id,
      |         CAST(round(value*100) AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY ts, event_id) AS rn
      |  FROM events),
      |sums AS (
      |  SELECT event_type, (rn - 1) // $SaxW AS wid,
      |         SUM(cents) AS s, COUNT(*) AS cnt
      |  FROM e GROUP BY event_type, (rn - 1) // $SaxW
      |  HAVING COUNT(*) = $SaxW),
      |ranked AS (
      |  SELECT *, COUNT(*) OVER (PARTITION BY event_type) AS nw,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY s, wid) AS rr
      |  FROM sums),
      |bps AS (
      |  SELECT event_type, nw,
      |    MIN(CASE WHEN rr = ceil(0.25::DOUBLE * nw) THEN s END) AS b1,
      |    MIN(CASE WHEN rr = ceil(0.5::DOUBLE * nw) THEN s END) AS b2,
      |    MIN(CASE WHEN rr = ceil(0.75::DOUBLE * nw) THEN s END) AS b3
      |  FROM ranked GROUP BY event_type, nw),
      |ltr AS (
      |  SELECT s.event_type, s.wid, b.nw,
      |    CASE WHEN s.s < b.b1 THEN 'a' WHEN s.s < b.b2 THEN 'b'
      |         WHEN s.s < b.b3 THEN 'c' ELSE 'd' END AS ltr
      |  FROM sums s JOIN bps b USING (event_type)),
      |words AS (
      |  SELECT event_type, nw,
      |    ltr || lead(ltr, 1) OVER w || lead(ltr, 2) OVER w AS word
      |  FROM ltr
      |  WINDOW w AS (PARTITION BY event_type ORDER BY wid)),
      |cnts AS (
      |  SELECT event_type, nw, word AS motif, COUNT(*) AS n_occ
      |  FROM words WHERE word IS NOT NULL
      |  GROUP BY event_type, nw, word)
      |SELECT event_type, motif, n_occ, nw AS n_windows
      |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |        ORDER BY n_occ DESC, motif) AS pick FROM cnts)
      |WHERE pick = 1""".stripMargin

  /** Symbolic time-series similarity (the SAX payoff beyond motifs:
    * once series are words, similarity search is SET ALGEBRA, not
    * DTW): pairwise Jaccard over each series' DISTINCT trigram
    * vocabulary. The join key is the word itself — candidate pairs
    * come from an equi-join on trigrams (never series × series), the
    * same bucket-first discipline as every dedup operator; at 100 TB
    * with millions of series the word relation shuffles once and hot
    * words AQE-split. Jaccard stays exact: intersection/union counts
    * are BIGINT, the ratio is one IEEE division. */
  def saxSimilarity(s: SparkSession, d: String): DataFrame = {
    val sums = saxSums(saxEvents(s, d))
    val bps = saxBreakpoints(sums)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("wid"))
    // feeds three branches (self-join a/b + vocab): persist per the
    // multi-branch convention, detach the result, release the cache
    val words = sums.join(bps, Seq("event_type"))
      .withColumn("ltr",
        when(col("s") < col("b1"), "a").when(col("s") < col("b2"), "b")
          .when(col("s") < col("b3"), "c").otherwise("d"))
      .withColumn("word", concat(col("ltr"),
        lead(col("ltr"), 1).over(wSeq), lead(col("ltr"), 2).over(wSeq)))
      .filter(col("word").isNotNull)
      .select(col("event_type"), col("word")).distinct()
      .persist()
    try {
      val vocab = words.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nv"))
      val inter = words.as("a")
        .join(words.as("b"), col("a.word") === col("b.word") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_common"))
      inter
        .join(vocab.select(col("event_type").as("type_a"),
          col("nv").as("nv_a")), Seq("type_a"))
        .join(vocab.select(col("event_type").as("type_b"),
          col("nv").as("nv_b")), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_common"),
          col("nv_a"), col("nv_b"),
          (col("n_common") /
            (col("nv_a") + col("nv_b") - col("n_common")).cast("double"))
            .as("jaccard"))
        .localCheckpoint()
    } finally { words.unpersist(blocking = false); () }
  }

  val saxSimilaritySql: String =
    s"""WITH e AS (
      |  SELECT event_type, ts, event_id,
      |         CAST(round(value*100) AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY ts, event_id) AS rn
      |  FROM events),
      |sums AS (
      |  SELECT event_type, (rn - 1) // $SaxW AS wid,
      |         SUM(cents) AS s, COUNT(*) AS cnt
      |  FROM e GROUP BY event_type, (rn - 1) // $SaxW
      |  HAVING COUNT(*) = $SaxW),
      |ranked AS (
      |  SELECT *, COUNT(*) OVER (PARTITION BY event_type) AS nw,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY s, wid) AS rr
      |  FROM sums),
      |bps AS (
      |  SELECT event_type, nw,
      |    MIN(CASE WHEN rr = ceil(0.25::DOUBLE * nw) THEN s END) AS b1,
      |    MIN(CASE WHEN rr = ceil(0.5::DOUBLE * nw) THEN s END) AS b2,
      |    MIN(CASE WHEN rr = ceil(0.75::DOUBLE * nw) THEN s END) AS b3
      |  FROM ranked GROUP BY event_type, nw),
      |ltr AS (
      |  SELECT s.event_type, s.wid,
      |    CASE WHEN s.s < b.b1 THEN 'a' WHEN s.s < b.b2 THEN 'b'
      |         WHEN s.s < b.b3 THEN 'c' ELSE 'd' END AS ltr
      |  FROM sums s JOIN bps b USING (event_type)),
      |words AS (
      |  SELECT DISTINCT event_type,
      |    ltr || lead(ltr, 1) OVER w || lead(ltr, 2) OVER w AS word
      |  FROM ltr
      |  WINDOW w AS (PARTITION BY event_type ORDER BY wid)),
      |wv AS (SELECT event_type, word FROM words WHERE word IS NOT NULL),
      |vocab AS (SELECT event_type, COUNT(*) AS nv FROM wv GROUP BY event_type),
      |inter AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         COUNT(*) AS n_common
      |  FROM wv a JOIN wv b
      |    ON a.word = b.word AND a.event_type < b.event_type
      |  GROUP BY a.event_type, b.event_type)
      |SELECT i.type_a, i.type_b, i.n_common, va.nv AS nv_a, vb.nv AS nv_b,
      |  i.n_common / CAST(va.nv + vb.nv - i.n_common AS DOUBLE) AS jaccard
      |FROM inter i
      |  JOIN vocab va ON va.event_type = i.type_a
      |  JOIN vocab vb ON vb.event_type = i.type_b""".stripMargin

  /** Session-scoped row-pattern matching — MATCH_RECOGNIZE's pattern
    * WINDOW semantics, the production CEP form: a match may not span
    * a session gap (>30 min), so `q_pattern_match`'s whole-history
    * fold becomes a per-(user, session) fold and the per-user report
    * aggregates over sessions. A funnel straddling a gap counts ZERO
    * here and one there — that difference is the semantics under
    * test. Same single entity-key shuffle: the gaps-and-islands
    * numbering, the per-session fold, and the per-user rollup all
    * ride one hashpartitioning(user_id). */
  def patternSessions(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val sess = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("ch"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(wOrd) > SessionGapUs ||
          lag(col("us"), 1).over(wOrd).isNull, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(wOrd))
    val perSession = sess.groupBy(col("user_id"), col("sess"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"),
          col("ch")))),
        x => x.getField("ch")), "").as("seq"))
      .select(col("user_id"),
        size(regexp_extract_all(col("seq"), lit("v+c*p"), lit(0)))
          .cast(LongType).as("n_funnel"),
        col("seq").rlike("p.*e").cast(LongType).as("err_sess"),
        length(col("seq")).cast(LongType).as("len"))
    perSession.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_funnel")).as("n_funnel"),
        sum(col("err_sess")).as("n_err_sessions"),
        sum(col("len")).as("n_events"))
  }

  val patternSessionsSql: String =
    """WITH e AS (
      |  SELECT user_id, substring(event_type, 1, 1) AS ch,
      |         epoch_us(ts) AS us, event_id
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000
      |                   OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
      |              ORDER BY us, event_id) AS sess
      |  FROM m),
      |ps AS (
      |  SELECT user_id, sess,
      |         string_agg(ch, '' ORDER BY us, event_id) AS seq
      |  FROM sess GROUP BY user_id, sess)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(len(regexp_extract_all(seq, 'v+c*p'))) AS BIGINT) AS n_funnel,
      |  CAST(SUM(CASE WHEN regexp_matches(seq, 'p.*e') THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_err_sessions,
      |  CAST(SUM(length(seq)) AS BIGINT) AS n_events
      |FROM ps GROUP BY user_id""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pattern_sessions" -> patternSessions _,
    "q_sax_similarity" -> saxSimilarity _,
    "q_sax_motif" -> saxMotif _,
    "q_pattern_match" -> patternMatch _,
    "q_grouping_id" -> groupingId _,
    "q_ohlc_bars" -> ohlcBars _,
    "q_cohort_retention" -> cohortRetention _,
    "q_event_transitions" -> eventTransitions _,
    "q_sessionize" -> sessionize _,
    "q_event_funnel" -> eventFunnel _,
    "q_earliest_by_offset" -> earliestByOffset _,
    "q_latest_k_by_offset" -> latestKByOffset _,
    "q_collect_agg" -> collectAgg _,
    "q_range_frame" -> rangeFrame _,
    "q_scd2_history" -> scd2History _,
    "q_scd2_asof" -> scd2AsOf _,
    "q_gaps_islands" -> gapsIslands _,
    "q_dq_checks" -> dqChecks _,
    "q_merge_upsert" -> mergeUpsert _,
    "q_union_all" -> unionAll _,
    "q_cross_join" -> crossJoinSmall _,
    "q_null_handling" -> nullHandling _,
    "q_like_patterns" -> likePatterns _,
    "q_regexp_strings" -> regexpStrings _)

  def oracles: Map[String, String] = Map(
    "q_pattern_sessions" -> patternSessionsSql,
    "q_sax_similarity" -> saxSimilaritySql,
    "q_sax_motif" -> saxMotifSql,
    "q_pattern_match" -> patternMatchSql,
    "q_grouping_id" -> groupingIdSql,
    "q_ohlc_bars" -> ohlcBarsSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_event_transitions" -> eventTransitionsSql,
    "q_sessionize" -> sessionizeSql,
    "q_event_funnel" -> eventFunnelSql,
    "q_earliest_by_offset" -> earliestByOffsetSql,
    "q_latest_k_by_offset" -> latestKByOffsetSql,
    "q_collect_agg" -> collectAggSql,
    "q_range_frame" -> rangeFrameSql,
    "q_scd2_history" -> scd2HistorySql,
    "q_scd2_asof" -> scd2AsOfSql,
    "q_gaps_islands" -> gapsIslandsSql,
    "q_dq_checks" -> dqChecksSql,
    "q_merge_upsert" -> mergeUpsertSql,
    "q_union_all" -> unionAllSql,
    "q_cross_join" -> crossJoinSql,
    "q_null_handling" -> nullHandlingSql,
    "q_like_patterns" -> likePatternsSql,
    "q_regexp_strings" -> regexpStringsSql)
}
