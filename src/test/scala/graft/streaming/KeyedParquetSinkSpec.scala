package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The durable keyed-upsert contract: per-key latest visible state,
  * idempotent under batch replay, snapshot readers never see partial
  * writes. */
class KeyedParquetSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("keyed-parquet-sink")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streamed upserts produce latest-per-key durable state; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-kps-").toString
    val sink = new KeyedParquetSink(spark, root, "k")
    val feed = MemoryStream[(String, String)]
    val q = feed.toDF().toDF("k", "v").writeStream
      .foreachBatch { (b: DataFrame, id: Long) => sink.upsert(b, id) }
      .start()
    try {
      feed.addData(("a", "v1"), ("b", "w1"))
      q.processAllAvailable()
      feed.addData(("a", "v2"), ("c", "x1"))
      q.processAllAvailable()
      val got = sink.df.get.as[(String, String)].collect().toMap
      assert(got == Map("a" -> "v2", "b" -> "w1", "c" -> "x1"))

      // redelivery of the same logical batch (at-least-once): same state
      sink.upsert(Seq(("a", "v2"), ("c", "x1")).toDF("k", "v"), 1L)
      val replayed = sink.df.get.as[(String, String)].collect().toMap
      assert(replayed == got)
    } finally q.stop()
  }
}
