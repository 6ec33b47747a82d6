package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must make cosine_sim available to plain SQL on
  * a fresh session with no manual registration. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    // getOrCreate would silently reuse another suite's session and
    // drop our extensions config — force a fresh one
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("cosine_sim resolves in SQL via spark.sql.extensions") {
    val got = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c"""
        .stripMargin).collect()(0).getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("shingle_hash_seq resolves in SQL, keeps positions, honors the width arg") {
    val row = spark.sql(
      """SELECT shingle_hash_seq(array('a','b','a','b','a','b'), 4) AS s,
        |       hashed_shingles(array('a','b','a','b','a','b'), 4) AS h"""
        .stripMargin).collect()(0)
    val seq = row.getSeq[String](0)
    val set = row.getSeq[String](1)
    assert(seq.length == 3)      // one per position, duplicates kept
    assert(seq.distinct == set)  // same hashing as the set native
    assert(seq(0) == seq(2) && seq(0) != seq(1))
  }
}
