package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The production state-store configuration (SURVEY.md §4: RocksDB is
  * the 1:1 analog of ksqlDB's table state): a latest-by-key streaming
  * aggregation must produce identical results under
  * RocksDBStateStoreProvider, carrying state across micro-batches. */
class RocksDBStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.builder()
      .master("local[2]")
      .appName("rocksdb-state")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("latest-by-key update-mode agg works on RocksDB state across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val feed = MemoryStream[(String, String, Long)] // key, value, offset
    val table = LatestByKey.table(
      feed.toDF().toDF("k", "v", "offset"), "k", "offset", Seq("v"))
    val name = s"rocks_${System.nanoTime()}"
    val q = table.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try {
      feed.addData(("a", "v1", 1L), ("b", "w1", 2L))
      q.processAllAvailable()
      feed.addData(("a", "v2", 3L)) // state for "b" must survive in RocksDB
      q.processAllAvailable()
      val got = spark.table(name).as[(String, String)].collect().toMap
      assert(got == Map("a" -> "v2", "b" -> "w1"))
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
    } finally q.stop()
  }
}
