package graft.functions

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, GraftSql}

/** Second ksql compat pack ([[KsqlCompatExt]]): the invocation
  * (lambda) functions in both their array and map forms with the ksql
  * `(x) => expr` arrow spelling, the ARRAY_SORT direction/null rules,
  * the ENCODE transcoder, and the JSON/AS_MAP/CORRELATION additions.
  * Everything runs through [[GraftSql.sql]] — i.e. the ksql DIALECT,
  * so the `=>` arrow rewrite and the `ksql_`-prefix name mapping are
  * part of what's under test. */
class KsqlCompatExtSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ksql-compat-ext")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    GraftSql.registerFunctions(spark)
    ()
  }
  override def afterAll(): Unit = spark.stop()

  private def one(sql: String): Row = GraftSql.sql(spark, sql).collect().head

  // ---- TRANSFORM ----

  test("TRANSFORM over an array with the ksql arrow spelling") {
    assert(one("SELECT TRANSFORM(ARRAY(1, 2, 3), (x) => x * 10)")
      .getSeq[Int](0) == Seq(10, 20, 30))
    // trailing field path on the lambda variable still resolves
    assert(one("SELECT TRANSFORM(ARRAY(STRUCT(1 AS a, 'x' AS b)), " +
      "(s) => s.a + 1)").getSeq[Int](0) == Seq(2))
  }

  test("TRANSFORM over a map: both lambdas see the ORIGINAL (k, v)") {
    val r = one("SELECT TRANSFORM(MAP('a', 1, 'bb', 2), " +
      "(k, v) => UPPER(k), (k, v) => v * LENGTH(k))")
    assert(r.getMap[String, Int](0) == Map("A" -> 1, "BB" -> 4))
  }

  // ---- FILTER ----

  test("FILTER dispatches array vs map on lambda parameter count") {
    assert(one("SELECT FILTER(ARRAY(1, 2, 3, 4), (x) => x % 2 = 0)")
      .getSeq[Int](0) == Seq(2, 4))
    assert(one("SELECT FILTER(MAP('a', 1, 'b', 2, 'c', 3), " +
      "(k, v) => v >= 2 AND k != 'c')").getMap[String, Int](0) ==
      Map("b" -> 2))
  }

  test("aggregate FILTER (WHERE ...) clauses are not rewritten") {
    val r = one("SELECT count(*) FILTER (WHERE x > 1) FROM " +
      "(SELECT explode(ARRAY(1, 2, 3)) AS x)")
    assert(r.getLong(0) == 2L)
  }

  // ---- REDUCE ----

  test("REDUCE over an array ((s, x) lambda)") {
    assert(one("SELECT REDUCE(ARRAY(1, 2, 3), 0, (s, x) => s + x)")
      .getInt(0) == 6)
  }

  test("REDUCE over a map ((s, k, v) lambda)") {
    assert(one("SELECT REDUCE(MAP('a', 1, 'bb', 2), 0, " +
      "(s, k, v) => s + v + LENGTH(k))").getInt(0) == 6)
  }

  // ---- ARRAY_SORT ----

  test("ARRAY_SORT: ASC default and DESC, nulls last either way") {
    assert(one("SELECT ARRAY_SORT(ARRAY('b', NULL, 'a', 'c'))")
      .getSeq[String](0) == Seq("a", "b", "c", null))
    assert(one("SELECT ARRAY_SORT(ARRAY('b', NULL, 'a', 'c'), 'DESC')")
      .getSeq[String](0) == Seq("c", "b", "a", null))
    assert(one("SELECT ARRAY_SORT(ARRAY(3, 1, 2), 'desc')")
      .getSeq[Int](0) == Seq(3, 2, 1))
  }

  // ---- ENCODE ----

  test("ENCODE transcodes between utf8/hex/base64, lowercase hex out") {
    assert(one("SELECT ENCODE('abc', 'utf8', 'hex')").getString(0) ==
      "616263")
    assert(one("SELECT ENCODE('616263', 'hex', 'utf8')").getString(0) ==
      "abc")
    assert(one("SELECT ENCODE(ENCODE('graft', 'utf8', 'base64'), " +
      "'base64', 'utf8')").getString(0) == "graft")
    assert(one("SELECT ENCODE('YWJj', 'base64', 'hex')").getString(0) ==
      "616263")
  }

  // ---- AS_MAP / JSON / CORRELATION ----

  test("AS_MAP zips key and value arrays") {
    assert(one("SELECT AS_MAP(ARRAY('a', 'b'), ARRAY(1, 2))")
      .getMap[String, Int](0) == Map("a" -> 1, "b" -> 2))
  }

  test("IS_JSON_STRING accepts objects/arrays/scalars, rejects junk") {
    assert(one("SELECT IS_JSON_STRING('{\"a\": 1}')").getBoolean(0))
    assert(one("SELECT IS_JSON_STRING('[1, 2]')").getBoolean(0))
    assert(!one("SELECT IS_JSON_STRING('{\"a\": 1')").getBoolean(0))
    assert(!one("SELECT IS_JSON_STRING(CAST(NULL AS STRING))")
      .getBoolean(0))
  }

  test("TO_JSON_STRING serializes structs and arrays") {
    assert(one("SELECT TO_JSON_STRING(NAMED_STRUCT('a', 1, 'b', 'x'))")
      .getString(0) == """{"a":1,"b":"x"}""")
    assert(one("SELECT TO_JSON_STRING(ARRAY(1, 2))").getString(0) ==
      "[1,2]")
  }

  test("CORRELATION maps to corr") {
    val r = one("SELECT CAST(ROUND(CORRELATION(x, y) * 100) AS INT) " +
      "FROM VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 6.1) AS t(x, y)")
    assert(r.getInt(0) == 100)
  }

  // ---- arrow rewrite hygiene ----

  test("'=>' inside a string literal is untouched") {
    assert(one("SELECT 'a => b'").getString(0) == "a => b")
  }

  test("lambda variables do not capture columns of the same name") {
    // a column literally named x next to a lambda variable x: the
    // lambda binds its own variable; the outer column is untouched
    val r = one("SELECT TRANSFORM(ARRAY(10), (x) => x + 1)[0] + x " +
      "FROM VALUES (100) AS t(x)")
    assert(r.getInt(0) == 111)
  }
}
