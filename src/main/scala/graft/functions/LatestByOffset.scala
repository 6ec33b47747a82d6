package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact `latest_by_offset` semantics (reference README.md:436-437) as
  * a typed Aggregator (SURVEY.md §7 custom-work item #1).
  *
  * `max_by(value, offset)` covers the common case; this Aggregator
  * differs in that — unlike max_by — a null value at the greatest
  * offset is returned as null rather than being skipped, which is
  * what a Debezium tombstone requires.
  *
  * `ignoreNulls` adds ksqlDB 0.28's optional-boolean form
  * (`LATEST_BY_OFFSET(col, ignoreNulls)`): when true, null values
  * never win — the result is the value at the greatest (smallest for
  * earliest) offset AMONG NON-NULL values, or null only when the key
  * saw no non-null value at all. A null candidate losing to every
  * non-null one is itself commutative, so partial-merge order still
  * cannot change the winner.
  *
  * Offsets are unique within a Kafka partition, so equal offsets only
  * arise from replay/compaction artifacts; the tie-break must then be
  * COMMUTATIVE or the winner would depend on Spark's nondeterministic
  * partial-merge order. We break ties by the greater value (nulls
  * last) — deterministic under any partitioning.
  *
  * Commutative-associative merge ⇒ map-side partial aggregation: each
  * map partition collapses to one (offset, value) candidate before the
  * shuffle — the same scaling shape as the built-in agg.
  */
case class OffsetValue(offset: Long, value: String)

class LatestByOffsetAgg(earliest: Boolean = false,
                        ignoreNulls: Boolean = false)
    extends Aggregator[OffsetValue, OffsetValue, String] {
  private def pick(x: OffsetValue, y: OffsetValue): OffsetValue = {
    if (ignoreNulls) {
      // any null-valued candidate (sentinel or real row) always
      // loses; two nulls — either side works, finish() is null anyway
      if (x.value == null) return y
      if (y.value == null) return x
    }
    // sentinel (zero) always loses, regardless of direction
    if (x.value == null && x.offset == zero.offset) return y
    if (y.value == null && y.offset == zero.offset) return x
    val wins = if (earliest) x.offset < y.offset else x.offset > y.offset
    if (wins) x
    else if (x.offset != y.offset) y
    else if (x.value == null) y
    else if (y.value == null) x
    else if (x.value.compareTo(y.value) >= 0) x
    else y
  }

  override def zero: OffsetValue =
    OffsetValue(if (earliest) Long.MaxValue else Long.MinValue, null)
  override def reduce(b: OffsetValue, a: OffsetValue): OffsetValue = pick(b, a)
  override def merge(x: OffsetValue, y: OffsetValue): OffsetValue = pick(x, y)
  override def finish(r: OffsetValue): String = r.value
  override def bufferEncoder: Encoder[OffsetValue] = Encoders.product[OffsetValue]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
