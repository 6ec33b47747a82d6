package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact `latest_by_offset` semantics (reference README.md:436-437) as
  * a typed Aggregator (SURVEY.md §7 custom-work item #1).
  *
  * `max_by(value, offset)` covers the common case; this Aggregator
  * pins the tie-break the way Kafka does: on equal offsets the later
  * arrival in reduce order wins (`>=`), and — unlike max_by — a null
  * value at the greatest offset is returned as null rather than being
  * skipped, which is what a Debezium tombstone requires.
  *
  * Commutative-associative merge ⇒ map-side partial aggregation: each
  * map partition collapses to one (offset, value) candidate before the
  * shuffle — the same scaling shape as the built-in agg.
  */
case class OffsetValue(offset: Long, value: String)

class LatestByOffsetAgg extends Aggregator[OffsetValue, OffsetValue, String] {
  override def zero: OffsetValue = OffsetValue(Long.MinValue, null)
  override def reduce(b: OffsetValue, a: OffsetValue): OffsetValue =
    if (a.offset >= b.offset) a else b
  override def merge(x: OffsetValue, y: OffsetValue): OffsetValue =
    if (x.offset >= y.offset) x else y
  override def finish(r: OffsetValue): String = r.value
  override def bufferEncoder: Encoder[OffsetValue] = Encoders.product[OffsetValue]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
