package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries k-counter frequency sketch — the mergeable HEAVY-HITTER
  * summary completing the sketch triad (cardinality = [[KmvSketch]],
  * quantiles = DecimalSketch, frequency = this). The summary holds at
  * most k (item, count) counters; inserting a held item increments it,
  * inserting a new item into a full summary decrements ALL counters
  * (dropping zeros) — the classic Misra–Gries 1982 algorithm. Two
  * summaries merge by adding counts and, if more than k counters
  * remain, subtracting the (k+1)-th largest count from every counter
  * and dropping the non-positive ones (Agarwal et al., "Mergeable
  * Summaries", PODS 2012 — the merge preserves the error bound).
  *
  * Guarantees (N = TOTAL items folded in, any merge topology):
  *
  *   true(t) − N/(k+1)  ≤  est(t)  ≤  true(t)
  *
  * and every item with true(t) > N/(k+1) is HELD (its estimate is
  * positive). The held SET and the estimates depend on merge order —
  * only the bounds are topology-invariant — so a deterministic query
  * cannot expose raw estimates. The deterministic protocol (used by
  * `sketch_mg_topk`): treat the ≤k held items as CANDIDATES, join
  * back for exact counts (a broadcast semi-join of ≤k terms — bounded
  * work), and gate on exact ≥ N/k. Every ≥N/k-heavy item is held in
  * EVERY valid sketch (N/k − N/(k+1) > 0), and the exact-count gate
  * rejects any merge-order-dependent stragglers, so the output is the
  * exact heavy set however the data was partitioned.
  *
  * Scale shape: a partial per partition is ≤ k counters; the shuffle
  * moves one such partial per (group × partition) — SUM-like volume
  * at any row count; the held-item increment is the steady-state O(1)
  * path (hash-map hit), and the decrement sweep is O(k) amortized
  * once per k misses. */
object MgSketch {

  /** Fold one item into a ≤k-counter summary. */
  def insert(m: Map[String, Long], item: String, k: Int): Map[String, Long] =
    m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < k => m.updated(item, 1L)
      case None =>
        // decrement-all: the new item and one unit of every counter
        // cancel; zeros drop out
        m.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  /** Merge two summaries (Agarwal et al. 2012): add counts; if over
    * k counters, subtract the (k+1)-th largest count from all and
    * drop non-positives (at most k counts exceed it, so the result
    * is ≤ k counters with the combined N/(k+1) bound intact). */
  def merge(x: Map[String, Long], y: Map[String, Long],
            k: Int): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val kth = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) =>
        if (c > kth) Some(t -> (c - kth)) else None
      }
    }
  }
}

/** Typed Aggregator over the item column; SQL-reachable as
  * `mg_sketch_64` (GraftSql registration). */
class MgSketchAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"Misra-Gries needs k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) b else MgSketch.insert(b, item, k)

  override def merge(x: Map[String, Long],
                     y: Map[String, Long]): Map[String, Long] =
    MgSketch.merge(x, y, k)

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** Merge STORED MG sketches (the KmvSketchMergeAgg pattern): a
  * second-level aggregation combines previously-built sketch columns
  * without re-reading rows — e.g. rolling per-(source, day) artifacts
  * up to per-source candidates. */
class MgSketchMergeAgg(k: Int)
    extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"Misra-Gries needs k >= 1, got $k")
  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long],
                      sk: Map[String, Long]): Map[String, Long] =
    MgSketch.merge(b, if (sk == null) Map.empty else sk, k)
  override def merge(x: Map[String, Long],
                     y: Map[String, Long]): Map[String, Long] =
    MgSketch.merge(x, y, k)
  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
