package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ksqlDB's two-arg `LATEST_BY_OFFSET(value, N)` (reference
  * README.md:436-437 shows the family) as a typed Aggregator with a
  * K-BOUNDED buffer — the state shape that makes the aggregate safe in
  * update-mode streaming: per-key state is at most k (offset, value)
  * pairs no matter how long the key's history grows, where the batch
  * `collect_list` spelling holds the full history. Output order is
  * ksqlDB's contract: ascending offset, latest value LAST.
  *
  * Scaling shape: reduce keeps the buffer sorted-ascending and drops
  * below the cutoff as soon as it exceeds k, so each MAP partition
  * collapses to ≤ k pairs before the shuffle (map-side partials), the
  * shuffle carries ≤ k·keys rows, and merge is a bounded sorted merge
  * — commutative and associative, deterministic under any partitioning
  * (offset ties break by the greater value, nulls last, same rule as
  * [[LatestByOffsetAgg]]).
  */
case class OffsetValues(pairs: Seq[OffsetValue])

/** `earliest = true` gives the EARLIEST_BY_OFFSET(value, N) twin: the
  * bound keeps the leading k of the ascending buffer instead of the
  * trailing k; output stays ascending (earliest first), ksql's order
  * for both forms.
  *
  * `ignoreNulls` is ksqlDB 0.28's optional third argument
  * (`LATEST_BY_OFFSET(value, N, ignoreNulls)`): when true, null
  * values never enter the buffer — the k slots hold the k most
  * recent (oldest for earliest) NON-null values, so a burst of
  * tombstones cannot evict real history. Default false keeps nulls,
  * matching the 2-arg family's established behavior. */
class LatestKByOffsetAgg(k: Int, earliest: Boolean = false,
                         ignoreNulls: Boolean = false)
    extends Aggregator[OffsetValue, OffsetValues, Seq[String]] {
  require(k > 0, s"k must be positive, got $k")

  // ascending (offset, value) with the shared tie rule; the buffer is
  // kept sorted so merge is a linear bounded merge and the cut is the
  // leading slice
  private def lt(x: OffsetValue, y: OffsetValue): Boolean =
    x.offset < y.offset ||
      (x.offset == y.offset &&
        (x.value == null && y.value != null ||
          x.value != null && y.value != null && x.value.compareTo(y.value) < 0))

  private def bound(sorted: Seq[OffsetValue]): Seq[OffsetValue] =
    if (sorted.length <= k) sorted
    else if (earliest) sorted.take(k)
    else sorted.takeRight(k)

  override def zero: OffsetValues = OffsetValues(Nil)

  override def reduce(b: OffsetValues, a: OffsetValue): OffsetValues = {
    if (ignoreNulls && a.value == null) return b
    val (below, above) = b.pairs.span(lt(_, a))
    OffsetValues(bound(below ++ (a +: above)))
  }

  override def merge(x: OffsetValues, y: OffsetValues): OffsetValues = {
    val merged = (x.pairs ++ y.pairs).sortWith(lt)
    OffsetValues(bound(merged))
  }

  override def finish(r: OffsetValues): Seq[String] = r.pairs.map(_.value)

  override def bufferEncoder: Encoder[OffsetValues] =
    Encoders.product[OffsetValues]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
