package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One keyed action against an external document store: ES-style
  * `_id`-addressed upsert or delete, carrying an external version so
  * the endpoint (not the pipeline) arbitrates replay ordering. */
case class BulkDoc(id: String, json: String, version: Long, deleted: Boolean)

/** Transport contract for [[BulkUpsertSink]]: receives one partition's
  * already-deduplicated actions. Implementations must be idempotent
  * under external-gte versioning — apply an action iff its version ≥
  * the stored version for that id (Elasticsearch
  * `version_type=external_gte`), which makes at-least-once delivery
  * collapse to exactly-once-per-key visible state without any
  * coordination between the pipeline and the store. */
trait BulkEndpoint extends Serializable {
  def bulk(partitionId: Int, docs: Iterator[BulkDoc]): Unit
}

/** Production egress façade: the reference sinks its final table to
  * Elasticsearch through a sink connector whose `_id` is the record
  * key (reference README.md:487-493 — `key.ignore=false`, so an
  * at-least-once stream becomes an exactly-once-per-key index). This
  * is the engine's Spark-side counterpart, symmetric with the
  * [[KafkaChangeFeed]] ingress façade: a `foreachBatch` adapter that
  * holds the same contract as the offline [[KeyedParquetSink]] —
  *
  *  1. **dedup-by-key per batch**: each micro-batch sends at most ONE
  *     action per key (the last one, by `orderCol` — e.g. the Kafka
  *     offset), never the intermediate versions;
  *  2. **idempotent replay**: actions carry an external version
  *     (`orderCol` when set — globally monotonic like an offset — else
  *     the batch id), so a replayed or out-of-order batch can never
  *     regress a key the endpoint already advanced past
  *     (`version_type=external_gte` semantics);
  *  3. **tombstones delete**: a row whose `deletedCol` is 'true' (the
  *     [[DebeziumEnvelope]] rewrite marker) becomes a versioned DELETE
  *     of the key, removing the document (ksqlDB tombstone semantics).
  *
  * Scale shape: the dedup is one hash shuffle of the BATCH only
  * (never the sink's total state — the endpoint owns that); document
  * rendering is codegen'd `to_json`; transport runs executor-side
  * per partition with chunked requests — the driver never touches a
  * row. Against a real cluster, partitions×chunks parallel bulk calls
  * are exactly how the reference's connector ships (its
  * `tasks.max`/batch.size knobs map to numPartitions/`chunkSize`).
  *
  * @param keyCol     document identity (the ES `_id`).
  * @param endpoint   transport; see [[HttpBulkEndpoint]] for the REST
  *                    production path and the spec's in-memory mock for
  *                    the contract tests.
  * @param deletedCol when set, rows with this column = 'true' delete.
  * @param orderCol   within-batch winner + external version source;
  *                    MUST be globally monotonic per key (Kafka offset,
  *                    CDC LSN) for cross-batch replay safety — else
  *                    versions fall back to the batch id and the
  *                    within-batch winner is elected by a deterministic
  *                    all-column tiebreak (so a foreachBatch retry of
  *                    the same batch re-elects the same row).
  * @param chunkSize  max actions per bulk request. */
class BulkUpsertSink(keyCol: String, endpoint: BulkEndpoint,
                     deletedCol: Option[String] = None,
                     orderCol: Option[String] = None,
                     chunkSize: Int = 500) extends Serializable {
  require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")

  /** `foreachBatch` body: dedup the batch per key, render, ship. */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    SinkChecks.requireDeletedCol(batch, deletedCol)
    // without orderCol the version is the batch id and external_gte
    // treats a retried batch as EQUAL — so the retry's winner must be
    // the SAME row, or replay flips a multi-row key's document. A bare
    // dropDuplicates picks a shuffle-dependent winner; instead break
    // ties over every non-key column (value-deterministic, so any
    // re-execution elects the same row)
    val tiebreak: Seq[org.apache.spark.sql.Column] = orderCol match {
      case Some(c) => Seq(col(c).desc)
      case None =>
        val payload = batch.schema.fields.toSeq.filterNot(_.name == keyCol)
        // unorderable columns tie-break on their JSON rendering — but a
        // MAP renders in iteration order, which an upstream aggregation
        // can permute across re-executions of the same batch, so maps
        // are canonicalized (entries sorted by key, recursively) before
        // rendering: equal map VALUES always render equal bytes
        val perCol = payload
          .map(f => if (BulkUpsertSink.orderable(f.dataType)) col(f.name).desc
                    else to_json(struct(BulkUpsertSink.canonical(
                      col(f.name), f.dataType))).desc)
        // Spark's sort order treats -0.0 == 0.0 (floats are compared,
        // not normalized), so value-equal-but-differently-RENDERED rows
        // would still tie and leave the winner shuffle-dependent while
        // to_json ships different documents. A final byte-level
        // tiebreak over the whole payload's rendering closes that hole.
        if (payload.isEmpty) perCol
        else perCol :+ to_json(struct(payload.map(f =>
          BulkUpsertSink.canonical(col(f.name), f.dataType).as(f.name)): _*)).desc
    }
    val lastPerKey =
      if (tiebreak.isEmpty) batch.dropDuplicates(keyCol) // key-only rows: all identical
      else {
        val w = Window.partitionBy(col(keyCol)).orderBy(tiebreak: _*)
        batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    val version = orderCol.map(col(_).cast("long")).getOrElse(lit(batchId))
    val isDelete = deletedCol
      .map(c => coalesce(col(c) === "true", lit(false)))
      .getOrElse(lit(false))
    val payloadCols = lastPerKey.schema.fieldNames
      .filterNot(n => deletedCol.contains(n)).map(col)
    val actions = lastPerKey.select(
      col(keyCol).cast("string").as("__id"),
      to_json(struct(payloadCols.toSeq: _*)).as("__doc"),
      version.as("__version"),
      isDelete.as("__deleted"))

    val ep = endpoint
    val chunk = chunkSize
    val orderName = orderCol
    actions.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      rows.map { r =>
        // a NULL external version must fail LOUDLY: versions from
        // orderCol live in the offset domain — substituting the (small)
        // batch id would make external_gte silently discard the action
        // against any previously-shipped offset-versioned state
        if (r.isNullAt(2))
          throw new IllegalStateException(
            s"null/uncastable order value in column '${orderName.getOrElse("?")}' " +
              s"for key '${r.getString(0)}': every row needs a long-castable " +
              "order value (e.g. the Kafka offset) when orderCol is configured")
        BulkDoc(r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3))
      }
        .grouped(chunk)
        .foreach(g => ep.bulk(pid, g.iterator))
    }
  }

  /** Attach to a streaming writer:
    * `df.writeStream.foreachBatch(sink.forEachBatch).start()`. */
  def forEachBatch: (DataFrame, Long) => Unit = upsert
}

object BulkUpsertSink {
  /** Whether Spark can ORDER BY this type — Catalyst's own rule
    * (NullType/AtomicType, arrays/structs recursively; maps, intervals
    * and variants can't). Unorderable columns fall back to their JSON
    * rendering for the deterministic tiebreak. */
  private[streaming] def orderable(
      dt: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)

  /** Value-canonical form of a column for deterministic RENDERING:
    * maps become key-sorted entry arrays (recursively, through structs
    * and arrays), so two equal map values — which Spark may iterate in
    * different orders on different executions — always produce the
    * same `to_json` bytes. Non-map types pass through. */
  private[streaming] def canonical(
      c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    dt match {
      case MapType(kt, vt, _) =>
        array_sort(transform(map_entries(c), e => struct(
          canonical(e.getField("key"), kt).as("key"),
          canonical(e.getField("value"), vt).as("value"))))
      case StructType(fields) =>
        struct(fields.toSeq.map(f =>
          canonical(c.getField(f.name), f.dataType).as(f.name)): _*)
      case ArrayType(et, _) => transform(c, x => canonical(x, et))
      case _ => c
    }
  }
}

/** REST transport for [[BulkUpsertSink]] over the Elasticsearch bulk
  * wire format — JDK HttpClient only, so the production path needs no
  * extra jar (URL-guarded: an unreachable endpoint fails the batch,
  * and Spark's foreachBatch retry re-ships it — safe under the
  * external-gte contract). One client per executor JVM (lazy val on a
  * deserialized instance), one POST per chunk.
  *
  * Wire shape per action (reference sink connector README.md:487-493):
  * {{{
  * {"index":{"_id":"<key>","version":<v>,"version_type":"external_gte"}}
  * {...document json...}
  * {"delete":{"_id":"<key>","version":<v>,"version_type":"external_gte"}}
  * }}} */
class HttpBulkEndpoint(baseUrl: String, index: String)
    extends BulkEndpoint {

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newHttpClient()

  override def bulk(partitionId: Int, docs: Iterator[BulkDoc]): Unit = {
    val body = HttpBulkEndpoint.render(docs)
    if (body.nonEmpty) {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$baseUrl/$index/_bulk"))
        .header("Content-Type", "application/x-ndjson")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.toString))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpBulkEndpoint.checkResponse(s"$baseUrl/$index",
        resp.statusCode(), resp.body())
    }
  }
}

object HttpBulkEndpoint {

  // one shared mapper — construction is Jackson's expensive operation,
  // and readTree on a configured mapper is thread-safe
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Validate one `_bulk` response. Elasticsearch reports per-item
    * failures inside a 2xx envelope (`"errors": true` + an `items`
    * array), so checking the HTTP status alone would silently drop
    * failed actions (e.g. mapping errors) and break the sink's
    * exactly-once-per-key contract. The ONE per-item status that is
    * expected and safe to ignore is 409: under `external_gte` a
    * version conflict means the store already holds this key at a
    * newer version — exactly what a replayed/out-of-order batch
    * produces, and the contract says the endpoint wins. Anything else
    * fails the batch so Spark's foreachBatch retry re-ships it. */
  def checkResponse(target: String, status: Int, body: String): Unit = {
    if (status / 100 != 2)
      throw new java.io.IOException(
        s"bulk to $target failed: HTTP $status ${body.take(500)}")
    val root =
      try mapper.readTree(body)
      catch {
        case e: Exception => throw new java.io.IOException(
          s"bulk to $target: unparseable response body " +
            s"(cannot verify per-item results): ${body.take(200)}", e)
      }
    if (root != null && root.path("errors").asBoolean(false)) {
      import scala.jdk.CollectionConverters._
      val failed = root.path("items").elements().asScala.flatMap { item =>
        // each item is {"<op>": {"_id":…,"status":…,"error":{…}}}
        item.elements().asScala.take(1).flatMap { r =>
          val st = r.path("status").asInt(0)
          if (st / 100 == 2 || st == 409) None
          else Some(s"_id=${r.path("_id").asText("?")} status=$st " +
            r.path("error").path("type").asText("") + ": " +
            r.path("error").path("reason").asText("").take(120))
        }
      }.toSeq
      if (failed.nonEmpty)
        throw new java.io.IOException(
          s"bulk to $target: ${failed.size} item(s) failed " +
            s"(non-409): ${failed.take(3).mkString("; ")}")
    }
  }

  /** Render actions to the NDJSON bulk body (factored out so the wire
    * format — action lines, id escaping, delete shape — is testable
    * without a live endpoint). */
  def render(docs: Iterator[BulkDoc]): String = {
    val body = new StringBuilder
    docs.foreach { d =>
      val op = if (d.deleted) "delete" else "index"
      body ++= s"""{"$op":{"_id":${jsonStr(d.id)},"version":${d.version},"version_type":"external_gte"}}""" += '\n'
      if (!d.deleted) body ++= d.json += '\n'
    }
    body.toString
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
