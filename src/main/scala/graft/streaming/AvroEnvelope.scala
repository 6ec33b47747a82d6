package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, udf}

/** Production ingress decode façade for Avro-encoded topics — the
  * reference's actual wire format (every connector sets
  * `value.converter=io.confluent.connect.avro.AvroConverter` with a
  * Schema Registry URL; reference docker-compose.yml:102-103,
  * README.md:389). Mirrors [[KafkaChangeFeed]]'s guard pattern:
  * compiles and loads without `spark-avro` on the classpath, fails
  * fast with a clear error when the production path is requested
  * without the jar, and offers an offline core-Avro fallback so the
  * wiring is testable in this sandbox (which ships `avro-*.jar` but
  * not `spark-avro`).
  *
  * Production wiring ([[fromAvro]], reflection over
  * `org.apache.spark.sql.avro.functions.from_avro`):
  *  - Confluent wire format prefixes each payload with a magic byte +
  *    4-byte schema id; strip it with `expr("substring(value, 6,
  *    length(value)-5)")` before decoding, and fetch the writer schema
  *    from the registry (`GET /schemas/ids/<id>`) at startup — Spark's
  *    `from_avro` takes the schema as a STRING, so registry lookup
  *    happens outside the plan, once, not per row.
  *  - The decoded struct then feeds [[DebeziumEnvelope.unwrap]]
  *    unchanged: the engine's operators are payload-format-agnostic —
  *    only this column expression differs between JSON and Avro topics.
  *
  * Offline fallback ([[binaryToJson]]): core-Avro `GenericDatumReader`
  * per partition task (one schema parse per decoder instance, not per
  * row), rendering records as JSON text that the existing
  * `from_json`-based unwrap consumes. This is the documented-shape
  * fallback, not the fast path: `from_avro` is a native Catalyst
  * expression; use it wherever the jar exists.
  */
object AvroEnvelope {

  /** True when the spark-avro module is on the classpath. Probes the
    * module's codec expression, NOT `sql.avro.functions` — Spark 4
    * ships that object in spark-sql-api as a stub whose analysis fails
    * with AVRO_NOT_LOADED when the module is missing, so its presence
    * proves nothing. `AvroDataToCatalyst` only exists in the real
    * module (it is the class `from_avro`'s replacement resolves to). */
  def isAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Strip the Confluent wire-format prefix (magic byte 0x0 + 4-byte
    * big-endian schema id) from a binary value column, null-preserving
    * (a Kafka tombstone stays null). Registry-published payloads carry
    * this prefix; both [[fromAvro]] and [[binaryToJson]] expect plain
    * binary Avro, so registry topics decode as
    * `fromAvro(stripConfluentPrefix(col("value")), schema)`. Pure
    * codegen'd column expression — no UDF. */
  def stripConfluentPrefix(value: Column): Column = {
    import org.apache.spark.sql.functions.{length, lit}
    value.substr(lit(6), length(value) - 5)
  }

  /** Native decode: `from_avro(value, jsonFormatSchema)` — resolved by
    * reflection so this module loads without the jar. The returned
    * column is a struct of the schema's fields (codegen'd decode, the
    * production hot path). */
  def fromAvro(value: Column, jsonFormatSchema: String): Column = {
    if (!isAvailable)
      throw new IllegalStateException(
        "spark-avro is not on the classpath: add the spark-avro module " +
          "matching your Spark version to decode Avro topics natively, " +
          "or use AvroEnvelope.binaryToJson for the core-Avro fallback")
    val fns = Class.forName("org.apache.spark.sql.avro.functions$")
    val module = fns.getField("MODULE$").get(null)
    fns.getMethod("from_avro", classOf[Column], classOf[String])
      .invoke(module, value, jsonFormatSchema)
      .asInstanceOf[Column]
  }

  /** The schema id a Confluent wire-format payload names: magic byte
    * 0x00 + 4-byte big-endian id. Use on a SAMPLED record at startup
    * to find which schema to fetch — never per row (the registry
    * lookup is startup wiring, not plan work). */
  def schemaIdOf(payload: Array[Byte]): Int = {
    require(payload != null && payload.length >= 5,
      s"not a Confluent wire-format payload: " +
        s"${if (payload == null) "null" else s"${payload.length} bytes"}")
    require(payload(0) == 0,
      f"bad magic byte 0x${payload(0)}%02x (expected 0x00)")
    java.nio.ByteBuffer.wrap(payload, 1, 4).getInt
  }

  private val registryCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), String]

  @transient private lazy val registryClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newHttpClient()

  /** Fetch (and cache) a writer schema from a Confluent Schema
    * Registry: `GET <baseUrl>/schemas/ids/<id>` → the `schema` field
    * of the JSON response — the last manual step of the reference's
    * wire path (docker-compose.yml:102-103: every converter points at
    * `http://schema-registry:8081`), automated. The result feeds
    * [[fromAvro]] directly:
    * {{{
    * val schema = AvroEnvelope.registrySchema(url, AvroEnvelope.schemaIdOf(sample))
    * df.select(AvroEnvelope.fromAvro(
    *   AvroEnvelope.stripConfluentPrefix(col("value")), schema))
    * }}}
    * Driver-side, once per (url, id) per JVM — the cache means a
    * restart re-fetches but a plan never does. */
  def registrySchema(baseUrl: String, id: Int): String =
    registryCache.getOrElseUpdate((baseUrl, id), {
      val uri = java.net.URI.create(
        s"${baseUrl.stripSuffix("/")}/schemas/ids/$id")
      val req = java.net.http.HttpRequest.newBuilder().uri(uri)
        .header("Accept", "application/vnd.schemaregistry.v1+json")
        .GET().build()
      val resp = registryClient.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new java.io.IOException(
          s"schema registry $uri: HTTP ${resp.statusCode()} " +
            resp.body().take(200))
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(resp.body()).path("schema")
      if (!node.isTextual)
        throw new java.io.IOException(
          s"schema registry $uri: response has no 'schema' field: " +
            resp.body().take(200))
      node.asText()
    })

  /** Offline decoder: binary Avro (no Confluent prefix) → JSON text via
    * core Avro, which is always on a Spark classpath. Serializable
    * holder with per-instance lazy init: the schema is parsed and the
    * reader built once per deserialized task, never per row. Union
    * types render in Avro's plain-JSON form (nulls as null); for
    * registry-governed envelopes prefer [[fromAvro]]. */
  class JsonDecoder(jsonFormatSchema: String) extends Serializable {
    @transient private lazy val schema =
      new org.apache.avro.Schema.Parser().parse(jsonFormatSchema)
    @transient private lazy val reader =
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord](schema)

    def decode(bytes: Array[Byte]): String =
      if (bytes == null) null // Kafka tombstone stays a null value
      else {
        val dec = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(bytes, null)
        String.valueOf(reader.read(null, dec))
      }
  }

  /** Replace a binary Avro `valueCol` with its JSON rendering, keeping
    * every other column — the [[ChangeFeed]]/[[KafkaChangeFeed]] value
    * contract, so `DebeziumEnvelope.unwrap(..., from_json ...)`
    * downstream works unchanged. */
  def binaryToJson(df: DataFrame, valueCol: String,
                   jsonFormatSchema: String): DataFrame = {
    val decoder = new JsonDecoder(jsonFormatSchema)
    val decode = udf((b: Array[Byte]) => decoder.decode(b))
    df.withColumn(valueCol, decode(col(valueCol)))
  }
}
