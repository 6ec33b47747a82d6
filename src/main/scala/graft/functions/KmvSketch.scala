package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch — the mergeable
  * cardinality summary behind theta-sketch set algebra (Bar-Yossef et
  * al. 2002; the Datasketches theta family). The sketch of a column is
  * the k SMALLEST DISTINCT hash values; its k-th smallest estimates
  * the full cardinality (uniform order statistics: E[h_(k)] ≈
  * k/(d+1) · 2^32), and because "k smallest of a union" is computable
  * from the per-side k-smallest alone, sketches support UNION —
  * and with it intersection/Jaccard estimates — without re-reading
  * the data.
  *
  * Engine discipline (the [[Md5Key]] determinism contract): inputs
  * are md5-u32 hashes in [0, 2^32) that Spark and DuckDB spell
  * bit-identically, the buffer is an ascending distinct Seq bounded
  * at k, and the estimator is exact integer arithmetic —
  * `(k−1)·2^32 DIV h_k`, or the held count while unsaturated (< k
  * distinct ⇒ the sketch IS the distinct set, estimate exact). No
  * floats anywhere, so every derived statistic is hash-verifiable.
  *
  * Scale shape: a partial aggregate per partition is ≤ k longs, the
  * shuffle moves one such partial per (group × partition), and merge
  * is a bounded sorted-merge — the same map-side-combine footprint as
  * a SUM at any row count. Once a partial saturates, the common-case
  * reduce is an O(1) reject (`h ≥ last`). */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    KmvSketch.insert(b, h, k)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    KmvSketch.union(x, y, k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** Merge STORED sketches (the DecimalSketchMergeAgg pattern): a
  * second-level aggregation unions previously-built sketch columns
  * without re-reading rows — k smallest of a union is computable from
  * the per-side k-min lists, so a rollup from (source, lang)-level
  * artifacts to lang-level estimates touches only |groups| arrays. */
class KmvSketchMergeAgg(k: Int) extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")
  override def zero: Seq[Long] = Vector.empty
  override def reduce(b: Seq[Long], sk: Seq[Long]): Seq[Long] =
    KmvSketch.union(b, if (sk == null) Vector.empty else sk, k)
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    KmvSketch.union(x, y, k)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {

  /** Insert one hash into an ascending distinct ≤k buffer. Saturated
    * buffers reject h ≥ max in O(1) — the steady-state path. */
  def insert(b: Seq[Long], h: Long, k: Int): Seq[Long] = {
    if (b.size >= k && h >= b.last) b
    else {
      val i = lowerBound(b, h)
      if (i < b.size && b(i) == h) b // already held
      else {
        val grown = (b.take(i) :+ h) ++ b.drop(i)
        if (grown.size > k) grown.take(k) else grown
      }
    }
  }

  /** k smallest of the union of two sketches (both ascending
    * distinct): a bounded sorted-merge — the sketch-algebra union. */
  def union(x: Seq[Long], y: Seq[Long], k: Int): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < x.size || j < y.size)) {
      val v =
        if (j >= y.size || (i < x.size && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      // x and y are individually distinct, so at most one copy of v
      // remains — on the side v was NOT taken from
      if (i < x.size && x(i) == v) i += 1
      if (j < y.size && y(j) == v) j += 1
      out += v
      n += 1
    }
    out.result()
  }

  /** Cardinality estimate: exact while unsaturated, else
    * (k−1)·2^32 DIV h_k — pure integer arithmetic. */
  def estimate(sketch: Seq[Long], k: Int): Long =
    if (sketch.size < k) sketch.size.toLong
    else ((k - 1).toLong * 4294967296L) / sketch.last

  /** First index whose value is >= h (binary search on ascending). */
  private def lowerBound(b: Seq[Long], h: Long): Int = {
    var lo = 0
    var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }
}
