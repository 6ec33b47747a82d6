package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the BM25 retrieval family (ADVICE r13): the
  * streaming index head must order postings by the SATURATED score,
  * not raw tf — sat(tf) = tf·2000 DIV (tf+1) is monotone but NOT
  * injective (62 and 63 both saturate to 1968), and the oracle breaks
  * score ties by doc_id asc, so a raw-tf head would keep the wrong
  * doc at the k-boundary. The fixture engineers exactly that
  * collision at rank 5. */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("retrieval-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Fixture corpus: 20 stopword-ish terms (df=10, ranks 1–20), ten
    * query terms q01–q10 (df=6, ranks 21–30). q01's six postings have
    * tf 100/90/80/70/63/62 — sat ties 63 vs 62 at 1968, and the
    * HIGHER tf sits on the HIGHER doc_id (900) while the sat-tied
    * lower tf sits on doc_id 10, so raw-tf ordering and the oracle's
    * (score desc, doc_id asc) disagree on who makes top-5. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-retrieval-spec-").toString
    import spark.implicits._
    val stop = (1 to 20).map(i => f"s$i%02d").mkString(" ")
    val stopDocs = (101 to 110).map(id => (id.toLong, stop))
    val q01 = Seq((1L, 100), (2L, 90), (3L, 80), (4L, 70),
      (900L, 63), (10L, 62)).map { case (id, tf) =>
      (id, Seq.fill(tf)("q01").mkString(" "))
    }
    val rest = (2 to 10).flatMap { q =>
      (1 to 6).map { j =>
        (1000L + q * 10 + j, Seq.fill(j)(f"q$q%02d").mkString(" "))
      }
    }
    (stopDocs ++ q01 ++ rest).toDF("doc_id", "text")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def top5(name: String): Seq[(Long, Long)] =
    Catalog.queries(name)(spark, dir)
      .filter("term = 'q01'")
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
      .sortBy(_._1).toSeq

  test("batch top-5 breaks the sat(62)=sat(63) tie by doc_id asc") {
    assert(top5("text_bm25_topk") ==
      Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 10L))
  }

  test("streaming head stores sat-ordered postings — same tie-break") {
    assert(top5("stream_bm25_topk") ==
      Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 10L))
  }

  test("batch and stream agree on every term of the fixture") {
    val b = Catalog.queries("text_bm25_topk")(spark, dir)
      .collect().map(_.toSeq).toSet
    val s = Catalog.queries("stream_bm25_topk")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(b == s)
  }
}
