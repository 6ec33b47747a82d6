package graft.streaming

import org.apache.spark.sql.Column

/** Production ingress decode façade for Protobuf-encoded topics — the
  * third Kafka Connect converter family alongside JSON and Avro (the
  * reference deploys `AvroConverter`, reference docker-compose.yml:102,
  * but the same Connect/Registry stack serves
  * `ProtobufConverter` topics, and a reference user migrating a mixed
  * cluster needs all three doors). Mirrors [[AvroEnvelope]]'s guard
  * pattern exactly: compiles and loads WITHOUT `spark-protobuf` on the
  * classpath, resolves `from_protobuf` by reflection when the module
  * exists, and fails fast with a clear error naming the jar when the
  * production path is requested without it.
  *
  * Wire format notes (Confluent `ProtobufConverter`):
  *  - Payloads carry the magic byte + 4-byte big-endian schema id like
  *    Avro, FOLLOWED by a message-indexes list (a varint count, then
  *    that many varint indexes) locating the message inside the
  *    schema file — the common single-top-level-message case encodes
  *    the list as the single byte 0x00. [[wirePrefixLength]] computes
  *    the full prefix span so [[stripConfluentPrefix]] can be built
  *    per-schema at startup (sample one record, measure, strip a
  *    CONSTANT — never parse varints per row in the plan).
  *  - The decoded struct feeds [[DebeziumEnvelope.unwrap]] unchanged:
  *    operators stay payload-format-agnostic; only this column
  *    expression differs per topic family.
  */
object ProtobufEnvelope {

  /** True when the spark-protobuf module is on the classpath. Probes
    * the module's codec expression class (the node `from_protobuf`
    * resolves to), not the `functions` stub — same rationale as
    * [[AvroEnvelope.isAvailable]]. */
  def isAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.protobuf.ProtobufDataToCatalyst")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Native decode: `from_protobuf(value, messageName, descFilePath)`
    * — resolved by reflection so this module loads without the jar.
    * The descriptor-set file is produced once with
    * `protoc --descriptor_set_out` (startup wiring, like the Avro
    * registry fetch); the returned column is a struct of the message's
    * fields. */
  def fromProtobuf(value: Column, messageName: String,
                   descFilePath: String): Column = {
    if (!isAvailable)
      throw new IllegalStateException(
        "spark-protobuf is not on the classpath: add the spark-protobuf " +
          "module matching your Spark version to decode Protobuf topics " +
          "natively (JSON and Avro topics decode without it)")
    val fns = Class.forName("org.apache.spark.sql.protobuf.functions$")
    val module = fns.getField("MODULE$").get(null)
    fns.getMethod("from_protobuf", classOf[Column], classOf[String],
        classOf[String])
      .invoke(module, value, messageName, descFilePath)
      .asInstanceOf[Column]
  }

  /** The schema id a Confluent Protobuf wire-format payload names —
    * same 0x00 magic + 4-byte big-endian id as Avro. Startup sampling
    * only, never per row. */
  def schemaIdOf(payload: Array[Byte]): Int = AvroEnvelope.schemaIdOf(payload)

  /** Total wire-prefix length of a Confluent Protobuf payload: 5 bytes
    * (magic + schema id) + the message-indexes varint list. Confluent
    * special-cases the index list [0] (first top-level message) as the
    * single byte 0x00; otherwise a varint count precedes that many
    * varint indexes. Used ONCE at startup on a sampled record — the
    * streaming plan then strips a constant with
    * [[stripConfluentPrefix]]. */
  def wirePrefixLength(payload: Array[Byte]): Int = {
    schemaIdOf(payload) // validates magic byte + minimum length
    var pos = 5
    // Confluent writes the list with Kafka ByteUtils.writeVarint —
    // ZIGZAG base-128 varints (index VALUES don't matter for the
    // length, but the COUNT must be zigzag-decoded or a multi-index
    // prefix mis-measures). The [0] single-message case is the one
    // byte 0x00.
    def varint(): Long = {
      var shift = 0; var raw = 0L; var b = 0
      do {
        require(pos < payload.length, "truncated message-index varint")
        b = payload(pos); pos += 1
        raw |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      (raw >>> 1) ^ -(raw & 1) // zigzag → signed
    }
    val count = varint()
    require(count >= 0, s"negative message-index count $count")
    var i = 0L
    while (i < count) { varint(); i += 1 }
    pos
  }

  /** Strip `prefixLen` wire-prefix bytes (from [[wirePrefixLength]] on
    * a sampled record) off a binary value column, null-preserving —
    * tombstones stay null. Pure codegen'd column expression. */
  def stripConfluentPrefix(value: Column, prefixLen: Int): Column = {
    import org.apache.spark.sql.functions.{length, lit}
    value.substr(lit(prefixLen + 1), length(value) - prefixLen)
  }
}
