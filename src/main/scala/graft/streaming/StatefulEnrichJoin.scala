package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** J1 exact-parity form (SURVEY.md §7 custom-work item #2): the
  * stream–table left join as a single stateful operator
  * (`flatMapGroupsWithState`) instead of the per-micro-batch snapshot
  * join.
  *
  * Both inputs are unioned into one changelog keyed by customer id;
  * each group's new events are processed in offset order, so — unlike
  * the snapshot form — an order and a customer update landing in the
  * same micro-batch resolve exactly as ksqlDB's per-record processing
  * would: the order sees the table as of its own offset, not the
  * batch-end state.
  *
  * OFFSET CONTRACT: the two inputs' offsets must come from one shared
  * sequence (a single CDC topic, a log-sequence-number, or an ingest
  * sequencer) — per-topic offsets from independent topics are not
  * comparable, and interleaving by them is arbitrary (ksqlDB has the
  * same caveat: its cross-stream ordering uses record timestamps).
  * On equal offsets the customer update is applied first
  * (deterministic tie-break favoring table consistency).
  *
  * State per key is one customer image (latest offset wins, deletes
  * tombstone it) — the same bound as ksqlDB's RocksDB table. Orders
  * look up at processing time and emit immediately (LEFT join: absent
  * customer → null fields, no buffering), so state never grows with
  * the order stream. Scale: state shards by key across
  * `spark.sql.shuffle.partitions`; RocksDB provider for large keyspaces.
  */
object StatefulEnrichJoin {

  case class CdcIn(kind: String, key: String, offset: Long,
                   name: Option[String], age: Option[Int], deleted: Boolean,
                   order_id: Option[String], price: Option[Double],
                   currency: Option[String], o_ts: Option[Timestamp])

  case class CustState(offset: Long, name: Option[String], age: Option[Int],
                       present: Boolean)

  /** @param customers unwrapped changelog: id, name, age, __deleted, offset
    * @param orders    event stream: customer_id, order_id, price,
    *                  currency, o_ts, offset */
  def apply(spark: SparkSession, customers: DataFrame, orders: DataFrame)
      : Dataset[EnrichedOrder] = {
    import spark.implicits._
    val custIn = customers.select(
      lit("cust").as("kind"), col("id").as("key"), col("offset"),
      col("name").cast("string").as("name"), col("age").cast("int").as("age"),
      (col("__deleted") === "true").as("deleted"),
      lit(null).cast("string").as("order_id"),
      lit(null).cast("double").as("price"),
      lit(null).cast("string").as("currency"),
      lit(null).cast("timestamp").as("o_ts")).as[CdcIn]
    val orderIn = orders.select(
      lit("order").as("kind"), col("customer_id").as("key"), col("offset"),
      lit(null).cast("string").as("name"), lit(null).cast("int").as("age"),
      lit(false).as("deleted"),
      col("order_id").cast("string").as("order_id"),
      col("price").cast("double").as("price"),
      col("currency").cast("string").as("currency"),
      col("o_ts").cast("timestamp").as("o_ts")).as[CdcIn]

    custIn.unionAll(orderIn)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, events: Iterator[CdcIn], state: GroupState[CustState]) =>
          var cust = state.getOption.getOrElse(CustState(Long.MinValue, None, None, present = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[EnrichedOrder]
          // deterministic order: by offset, customer updates first on ties
          events.toSeq
            .sortBy(e => (e.offset, if (e.kind == "cust") 0 else 1))
            .foreach { e =>
            if (e.kind == "cust") {
              if (e.offset >= cust.offset) {
                cust =
                  if (e.deleted) CustState(e.offset, None, None, present = false)
                  else CustState(e.offset, e.name, e.age, present = true)
              }
            } else {
              out += EnrichedOrder(e.order_id.get, e.price.get, e.currency.get,
                key,
                if (cust.present) cust.name else None,
                if (cust.present) cust.age else None,
                e.o_ts.get)
            }
          }
          state.update(cust)
          out.iterator
      }
  }
}
