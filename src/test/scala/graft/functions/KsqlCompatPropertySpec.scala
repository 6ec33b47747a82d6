package graft.functions

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSql

/** Seeded-random cross-check of the ksql masking/split mappings
  * against a direct per-character Scala model — one DataFrame of all
  * samples, so the whole property evaluates in a single codegen'd
  * query rather than per-sample round-trips. */
class KsqlCompatPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ksql-compat-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    GraftSql.registerFunctions(spark)
    ()
  }
  override def afterAll(): Unit = spark.stop()

  // the ksql MASK default: upper→X, lower→x, digit→n, other→'-'
  private def modelMask(s: String): String =
    s.map { c =>
      if (Character.isUpperCase(c)) 'X'
      else if (Character.isLowerCase(c)) 'x'
      else if (Character.isDigit(c)) 'n'
      else '-'
    }

  private def alphabet = "aZ3 _-ab.|étÄ09Bq" // incl. the split delimiter

  test("mask family and literal split match the per-character model on 400 seeded strings") {
    import spark.implicits._
    val rnd = new Random(41)
    val samples = (Seq("", "ab", "abab", "ÄÉteq", "0123456789") ++
      (1 to 400).map { _ =>
        val n = rnd.nextInt(24)
        (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }).distinct
    val rows = samples.toDF("s").selectExpr(
        "s",
        "ksql_mask(s) AS m",
        "mask_keep_left(s, 3) AS kl",
        "mask_keep_right(s, 2) AS kr",
        "mask_left(s, 4) AS ml",
        "mask_right(s, 2) AS mr",
        "ksql_split(s, 'ab') AS sp")
      .collect()
    assert(rows.length == samples.length)
    rows.foreach { r =>
      val s = r.getString(0)
      def cut(n: Int) = math.max(s.length - n, 0)
      assert(r.getString(1) == modelMask(s), s"mask('$s')")
      assert(r.getString(2) == s.take(3) + modelMask(s.drop(3)),
        s"mask_keep_left('$s')")
      assert(r.getString(3) == modelMask(s.take(cut(2))) + s.drop(cut(2)),
        s"mask_keep_right('$s')")
      assert(r.getString(4) == modelMask(s.take(4)) + s.drop(4),
        s"mask_left('$s')")
      assert(r.getString(5) == s.take(cut(2)) + modelMask(s.drop(cut(2))),
        s"mask_right('$s')")
      val expectedSplit =
        s.split(java.util.regex.Pattern.quote("ab"), -1).toSeq
      assert(r.getSeq[String](6) == expectedSplit, s"split('$s', 'ab')")
    }
  }
}
