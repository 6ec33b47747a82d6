package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental contract of the streaming near-dup bucket registry
  * ([[StreamingQueries.neardupCore]]): first ARRIVAL owns a (band,
  * sig) bucket — a later-arriving smaller doc_id takes ownership
  * without re-flagging earlier emissions; within one micro-batch
  * arrival order is doc_id order; buckets are independent per band. */
class StreamNeardupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("stream-neardup")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("first arrival wins; late smaller ids take over silently") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Int, String)]
    val ckpt = StreamingQueries.scratchDir("neardup-spec-")
    val q = StreamingQueries.neardupCore(
        in.toDF().toDF("doc_id", "band", "sig"))
      .writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", ckpt)
      .queryName("neardup_inc").start()
    def flags(): Map[(Long, Int), Boolean] = {
      q.processAllAvailable()
      spark.table("neardup_inc").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    }
    try {
      // batch 1: doc 10 opens bucket (0, "X"); docs 20 < 30 share a
      // bucket within the batch — in-batch order is doc_id order
      in.addData((10L, 0, "X"), (20L, 0, "Y"), (30L, 0, "Y"))
      val f1 = flags()
      assert(f1((10L, 0)) == false)
      assert(f1((20L, 0)) == false && f1((30L, 0)) == true)
      // batch 2: doc 5 arrives AFTER doc 10 but has a smaller id — it
      // is not flagged (nothing earlier-ARRIVED is smaller... the
      // registry holds 10, and 10 < 5 is false) and takes the bucket
      in.addData((5L, 0, "X"))
      assert(flags()((5L, 0)) == false)
      // batch 3: doc 7 now collides with owner 5 → flagged; the same
      // sig on ANOTHER band is an independent bucket → clean
      in.addData((7L, 0, "X"), (7L, 1, "X"))
      val f3 = flags()
      assert(f3((7L, 0)) == true)
      assert(f3((7L, 1)) == false)
      // earlier emissions never retro-change
      assert(f3((10L, 0)) == false)
    } finally {
      q.stop()
      spark.catalog.dropTempView("neardup_inc")
      spark.streams.resetTerminated()
      StreamingQueries.deleteRecursively(ckpt)
    }
  }

  test("claimCore: content claims flag later DOCS only, never within-doc repeats; payload rides") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Long, String)]
    val ckpt = StreamingQueries.scratchDir("claim-spec-")
    val q = StreamingQueries.claimCore(
        in.toDF().toDF("doc_id", "pos", "sig"))
      .writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", ckpt)
      .queryName("claim_inc").start()
    def flags(): Map[(Long, Long), Boolean] = {
      q.processAllAvailable()
      spark.table("claim_inc").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    }
    try {
      // batch 1: doc 10 claims gram G at two of ITS OWN positions —
      // within-doc repeats never self-flag (the >=2-distinct-docs
      // rule); doc 20's occurrence is a later DOC -> flagged, with
      // its position payload intact
      in.addData((10L, 3L, "G"), (10L, 9L, "G"), (20L, 0L, "G"))
      val f1 = flags()
      assert(f1((10L, 3L)) == false && f1((10L, 9L)) == false)
      assert(f1((20L, 0L)) == true)
      // batch 2: a smaller doc arrives late — takes the claim without
      // being flagged (arrival-order registry, the neardupCore note)
      in.addData((5L, 1L, "G"))
      assert(flags()((5L, 1L)) == false)
      // batch 3: the old owner's NEW occurrence is now a later doc
      // than claim-holder 5 -> flagged; an unrelated gram is clean
      in.addData((10L, 40L, "G"), (10L, 41L, "H"))
      val f3 = flags()
      assert(f3((10L, 40L)) == true)
      assert(f3((10L, 41L)) == false)
    } finally {
      q.stop()
      spark.catalog.dropTempView("claim_inc")
      spark.streams.resetTerminated()
      StreamingQueries.deleteRecursively(ckpt)
    }
  }

  test("bucket-registry state survives a query restart from checkpoint") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ckpt = StreamingQueries.scratchDir("neardup-recover-")
    // memory sinks don't recover; foreachBatch does — collect flags
    // emitted AFTER the restart only
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]
    def start(in: MemoryStream[(Long, Int, String)]) =
      StreamingQueries.neardupCore(in.toDF().toDF("doc_id", "band", "sig"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r =>
            emitted.add((r.getLong(0), r.getBoolean(2))))
          ()
        }
        .start()
    val feed = MemoryStream[(Long, Int, String)]
    val q1 = start(feed)
    try {
      feed.addData((10L, 0, "X"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(emitted.toArray.toSet == Set((10L, false)), emitted.toString)
    emitted.clear()
    // restart from the same checkpoint with a replayable source: the
    // committed batch re-stages, then a NEW doc collides with the
    // RECOVERED owner (10) — flagged without doc 10's data ever
    // rebuilding state post-restart
    val feed2 = MemoryStream[(Long, Int, String)]
    feed2.addData((10L, 0, "X")) // replayed committed batch 0
    feed2.addData((42L, 0, "X")) // new batch: collides with recovered state
    val q2 = start(feed2)
    try {
      q2.processAllAvailable()
      // only the new batch emits (batch 0 was committed); the flag
      // proves the (band, sig) owner survived recovery
      assert(emitted.toArray.toSet == Set((42L, true)), emitted.toString)
    } finally {
      q2.stop()
      spark.streams.resetTerminated()
      StreamingQueries.deleteRecursively(ckpt)
    }
  }

  test("catalog entry equals the batch min-owner spelling on sf0.001") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.streamNeardup(spark, sf)
      .collect().map(_.toSeq).toSet
    // batch spelling of the same flags: a band row is flagged iff a
    // smaller doc_id shares its (band, sig) bucket
    val b = DedupQueries.bandRows(spark.read.parquet(s"$sf/documents.parquet"))
    val owners = b.groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("min_id"))
    val batch = b.join(owners, Seq("band", "sig"))
      .filter(col("doc_id") > col("min_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_dup_bands"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty, "fixture produced no near-duplicates")
  }
}
