package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fault tolerance (SURVEY.md §2.6): a stateful streaming query
  * restarted from its checkpoint resumes with its accumulated state —
  * the Spark analog of ksqlDB's RocksDB + changelog-topic recovery. */
class CheckpointRecoverySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("checkpoint-recovery")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("latest-by-key state survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-recover-").toString
    val store = new SnapshotStore(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))), keyField = "k")

    val feed = MemoryStream[(String, String, Long)]
    def startQuery(f: MemoryStream[(String, String, Long)]) =
      LatestByKey.table(f.toDF().toDF("k", "v", "offset"), "k", "offset", Seq("v"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) => store.upsert(b) }
        .start()

    val q1 = startQuery(feed)
    feed.addData(("a", "v1", 1L), ("b", "w1", 2L))
    q1.processAllAvailable()
    q1.stop()
    assert(store.size == 2)

    // restart: a NEW source instance + the same checkpoint. Sources
    // must be REPLAYABLE from the committed offset (Kafka is; a fresh
    // MemoryStream emulates that by re-staging batch 0), after which
    // the offset log skips the committed batch and only the new update
    // for "a" is processed — "b" comes from recovered state.
    val feed2 = MemoryStream[(String, String, Long)]
    feed2.addData(("a", "v1", 1L), ("b", "w1", 2L)) // replayed batch 0
    feed2.addData(("a", "v2", 3L))                  // new batch 1
    val q2 = startQuery(feed2)
    q2.processAllAvailable()
    q2.stop()

    val rows = store.df(spark).as[(String, String)].collect().toMap
    assert(rows == Map("a" -> "v2", "b" -> "w1"))
  }
}
