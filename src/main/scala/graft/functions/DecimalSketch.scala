package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Mergeable deterministic quantile sketch on a decimal
  * significant-digit grid — the exactly-verifiable cousin of DDSketch
  * (Masson/Rim/Lee, VLDB 2019) / HdrHistogram.
  *
  * Those production sketches bucket values on a log-γ grid, which
  * gives a RELATIVE-error guarantee but makes the bucket boundary a
  * libm transcendental — two engines disagree on `ceil(log(x)/log(γ))`
  * at boundaries, so the sketch answer can't be hash-compared across
  * engines. This sketch keeps the guarantee shape but puts the grid on
  * integer arithmetic: a value (already on the catalog's integer
  * cents/token grid) is rounded TOWARD ZERO to [[DecimalSketch.SigDigits]]
  * significant decimal digits. That is monotone, so bucket order =
  * value order, and the bucket of the exact rank-r element IS the
  * sketch's rank-r answer: quantile(sketch, q) = bucket(exactQuantile
  * (values, q)) — pinned by property test. Worst-case relative error
  * is < 10^(1-SigDigits) (1% at 3 digits): a bucket holding v spans
  * width 10^(digits(v)-3) while |bucket| ≥ 100·10^(digits(v)-3).
  *
  * Scale shape: buckets per decade ≤ 900, decades ≤ 19 ⇒ the buffer is
  * bounded at ~17k entries regardless of row count, the merge is plain
  * counter addition (commutative + associative ⇒ map-side partials,
  * shuffle volume bounded by buckets × partitions), and partial
  * sketches from different groups / days / micro-batches union-merge
  * LOSSLESSLY — the merged sketch is bit-identical to the sketch of
  * the concatenated input, which is what makes it a 100 TB
  * pre-aggregation: store one small map per (source, day), answer any
  * quantile over any source/day slice later without re-reading rows.
  *
  * Quantile extraction is deliberately NOT part of the aggregate: a
  * sketch column explodes to (bucket, count) rows and the rank scan is
  * a window cumsum — relational, oracle-replicable, and reusable over
  * any stored sketch.
  */
object DecimalSketch {
  /** Grid resolution: values keep this many leading decimal digits.
    * 3 ⇒ <1% worst-case relative error, ≤900 buckets per decade. */
  val SigDigits = 3

  private val Ceiling = math.pow(10, SigDigits).toLong // 1000

  /** Round toward zero to [[SigDigits]] significant decimal digits.
    * Total on Long (|n| < 1000 is exact, including 0 and negatives);
    * monotone nondecreasing, idempotent. */
  def bucket(n: Long): Long = {
    var m = if (n < 0) -n else n
    if (m < Ceiling) return n
    var d = 1L
    while (m >= Ceiling) { m /= 10; d *= 10 }
    val b = m * d
    if (n < 0) -b else b
  }

  /** Sketch answer for quantile q (rank r = ceil(q·N), the lower
    * rank-based quantile): smallest bucket whose cumulative count
    * reaches r. Driver-side helper for specs; the catalog query does
    * the same scan relationally. */
  def quantile(sketch: Map[Long, Long], q: Double): Long = {
    val n = sketch.valuesIterator.sum
    require(n > 0, "quantile of an empty sketch")
    val r = math.ceil(q * n).toLong max 1L
    var cum = 0L
    for ((b, c) <- sketch.toSeq.sortBy(_._1)) {
      cum += c
      if (cum >= r) return b
    }
    sketch.keysIterator.max
  }

  /** The relational rank scan over a DataFrame of stored sketches —
    * the one quantile-extraction spelling every consumer shares
    * (batch catalog query, streaming snapshot, curation trim).
    *
    * Input: `keyCols`, a `sketch` map column, and a BIGINT `n` count.
    * Output: keyCols, `q` (one row per requested quantile), the
    * bucket value as `valueName`, and `n`. The explode is over
    * bounded maps (≤ ~17k entries each) and the window partitions by
    * the sketch key, so the scan's shuffle is sketch-sized, never
    * row-sized — at 100 TB the rows are gone by this point. */
  def quantileScan(sketches: DataFrame, keyCols: Seq[String],
                   qs: Seq[Double], valueName: String): DataFrame = {
    val s = sketches.sparkSession
    import s.implicits._
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__bkt"))
    sketches
      .select(keys ++ Seq(col("n"),
        explode(col("sketch")).as(Seq("__bkt", "__cnt"))): _*)
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .join(broadcast(qs.toDF("q")),
        ceil(col("q") * col("n")) <= col("__cum"))
      .groupBy(keys :+ col("q"): _*)
      .agg(min(col("__bkt")).as(valueName), max(col("n")).as("n"))
  }
}

/** Build a [[DecimalSketch]] from a column of grid integers (cents,
  * token counts, micros — anything already integer). Null inputs are
  * ignored, matching every other aggregate in the catalog. */
class DecimalSketchAgg
    extends Aggregator[java.lang.Long, Map[Long, Long], Map[Long, Long]] {
  private def add(m: Map[Long, Long], b: Long, c: Long): Map[Long, Long] =
    m.updated(b, m.getOrElse(b, 0L) + c)

  override def zero: Map[Long, Long] = Map.empty
  override def reduce(m: Map[Long, Long],
                      a: java.lang.Long): Map[Long, Long] =
    if (a == null) m else add(m, DecimalSketch.bucket(a.longValue()), 1L)
  override def merge(x: Map[Long, Long],
                     y: Map[Long, Long]): Map[Long, Long] =
    y.foldLeft(x) { case (m, (b, c)) => add(m, b, c) }
  override def finish(r: Map[Long, Long]): Map[Long, Long] = r
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}

/** One (value, weight) observation for [[DecimalSketchWeightedAgg]]. */
case class WeightedGridValue(value: java.lang.Long, weight: java.lang.Long)

/** Weighted variant: each row contributes `weight` to its value's
  * bucket, so quantiles are over the WEIGHT mass, not row count —
  * "median document length weighted by tokens", "quantity-weighted
  * price percentiles". Identical to sketching the value repeated
  * `weight` times (pinned by property test), with the same lossless
  * merge and bounded state; rank scans must use N = Σweight. Rows
  * with a null value/weight or weight ≤ 0 are ignored. */
class DecimalSketchWeightedAgg
    extends Aggregator[WeightedGridValue, Map[Long, Long], Map[Long, Long]] {
  override def zero: Map[Long, Long] = Map.empty
  override def reduce(m: Map[Long, Long],
                      a: WeightedGridValue): Map[Long, Long] =
    if (a == null || a.value == null || a.weight == null ||
        a.weight.longValue() <= 0L) m
    else {
      val b = DecimalSketch.bucket(a.value.longValue())
      m.updated(b, m.getOrElse(b, 0L) + a.weight.longValue())
    }
  override def merge(x: Map[Long, Long],
                     y: Map[Long, Long]): Map[Long, Long] =
    y.foldLeft(x) { case (m, (b, c)) =>
      m.updated(b, m.getOrElse(b, 0L) + c)
    }
  override def finish(r: Map[Long, Long]): Map[Long, Long] = r
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}

/** Union-merge already-built sketches (the re-aggregation path over
  * stored per-slice sketches). Null sketches are ignored. Lossless:
  * merging per-slice sketches equals sketching the concatenation. */
class DecimalSketchMergeAgg
    extends Aggregator[Map[Long, Long], Map[Long, Long], Map[Long, Long]] {
  override def zero: Map[Long, Long] = Map.empty
  override def reduce(m: Map[Long, Long],
                      a: Map[Long, Long]): Map[Long, Long] = merge(m, a)
  override def merge(x: Map[Long, Long],
                     y: Map[Long, Long]): Map[Long, Long] =
    if (y == null) x
    else if (x == null) y
    else y.foldLeft(x) { case (m, (b, c)) =>
      m.updated(b, m.getOrElse(b, 0L) + c)
    }
  override def finish(r: Map[Long, Long]): Map[Long, Long] = r
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}
