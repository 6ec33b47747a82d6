package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session-hygiene contract behind round 6's bench defect
  * (never-dropped memory-sink tables + terminated-query references
  * degraded alphabetically-late queries up to 60× across a 134-query
  * × 3-run suite): after a streaming catalog query returns, the
  * session must hold NO trace of its machinery — no memory-sink temp
  * view, no active streaming query, no terminated-query reference —
  * so the returned (detached) frame is the only thing keeping any of
  * its rows alive. */
class StreamingHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-hygiene")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("streaming queries leave no views, active queries, or terminated refs behind") {
    // a window agg and an EMIT FINAL variant — both run through
    // runToTable's memory sink, the leak site
    val kept = Seq("stream_tumbling_agg", "stream_session_final").map { name =>
      val out = Catalog.queries(name)(spark, sf)
      assert(out.count() > 0, name)
      out
    }
    val leftoverViews = spark.catalog.listTables().collect()
      .filter(_.isTemporary).map(_.name)
      .filter(_.startsWith("stream_q_"))
    assert(leftoverViews.isEmpty,
      s"memory-sink views survived their query: ${leftoverViews.toSeq}")
    assert(spark.streams.active.isEmpty,
      spark.streams.active.map(_.name).toSeq.toString)
    // resetTerminated() ran: awaitAnyTermination with a tiny timeout
    // returns false (nothing recorded as terminated) instead of
    // returning instantly with a stale terminated query
    assert(!spark.streams.awaitAnyTermination(50L))
    // the returned frames stay usable after all that cleanup — they
    // are detached checkpoint blocks, not references into the sink
    kept.foreach(df => assert(df.count() > 0))
  }
}
