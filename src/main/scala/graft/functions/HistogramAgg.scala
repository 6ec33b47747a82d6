package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** ksqlDB's `HISTOGRAM(col)` aggregate: a map from each distinct value
  * of the column to its occurrence count. Like ksqlDB, the map is
  * capped at [[HistogramAgg.Cap]] distinct keys (ksqlDB 0.28 documents
  * the same 1000-entry limit); once a partial has Cap keys, unseen
  * keys are dropped. Below the cap the merge is exact and commutative
  * — map-side partials each hold at most Cap entries, so shuffle
  * volume is bounded by Cap × partitions regardless of row count.
  * Null inputs are ignored (ksql semantics). */
class HistogramAgg
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  private def add(m: Map[String, Long], k: String,
                  n: Long): Map[String, Long] =
    m.get(k) match {
      case Some(c) => m.updated(k, c + n)
      case None if m.size < HistogramAgg.Cap => m.updated(k, n)
      case None => m
    }

  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else add(b, a, 1L)
  override def merge(x: Map[String, Long],
                     y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (m, (k, n)) => add(m, k, n) }
  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HistogramAgg {
  /** ksqlDB's documented distinct-key limit for HISTOGRAM. */
  val Cap = 1000
}
