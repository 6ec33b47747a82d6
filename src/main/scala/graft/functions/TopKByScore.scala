package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator.
  *
  * The naive per-key top-k (`row_number() OVER (PARTITION BY …) <= k`)
  * shuffles and sorts EVERY row. This aggregator keeps a k-bounded
  * sorted buffer with a commutative merge, so map-side partial
  * aggregation reduces each map partition to ≤k rows per key before
  * the shuffle — at 100 TB the shuffle carries k·keys rows instead of
  * the whole table. The window form remains the oracle spelling.
  *
  * Ordering: score descending, id ascending on ties (deterministic).
  */
case class ScoredId(score: Double, id: Long)
case class TopKBuf(scores: Seq[Double], ids: Seq[Long])

class TopKByScore(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
  require(k > 0, s"top-k requires k > 0, got $k")

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(b: TopKBuf, s: Double, i: Long): TopKBuf = {
    if (b.scores.length >= k &&
        !better(s, i, b.scores.last, b.ids.last)) return b
    val pos = b.scores.indices.find(j => better(s, i, b.scores(j), b.ids(j)))
      .getOrElse(b.scores.length)
    TopKBuf(
      (b.scores.take(pos) :+ s) ++ b.scores.drop(pos).take(k - pos - 1),
      (b.ids.take(pos) :+ i) ++ b.ids.drop(pos).take(k - pos - 1))
  }

  override def zero: TopKBuf = TopKBuf(Vector.empty, Vector.empty)

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf =
    insert(b, a.score, a.id)

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    y.scores.indices.foldLeft(x)((acc, j) => insert(acc, y.scores(j), y.ids(j)))

  override def finish(r: TopKBuf): TopKBuf = r
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
