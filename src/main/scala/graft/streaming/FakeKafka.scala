package graft.streaming

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** An embedded, in-JVM Kafka-broker STAND-IN exposed as a real
  * DataSource V2 micro-batch source (short name `fakekafka`), so the
  * production ingress façade [[KafkaChangeFeed]] — and with it the
  * whole Pipeline operator graph — can be exercised end-to-end through
  * `spark.readStream.format(...)` without network or connector jars
  * (this sandbox has neither; SURVEY.md §7). The source exposes the
  * exact column schema of `spark-sql-kafka-0-10`'s source (key/value
  * binary, topic, partition, offset, timestamp, timestampType), one
  * partition per topic (the total order the offline analog promises),
  * and honors `startingOffsets` earliest/latest — the S0 surface.
  *
  * Deliberately registered under its OWN short name, not "kafka": on a
  * cluster with the real connector both would resolve and Spark's
  * source lookup fails on the ambiguity. [[KafkaChangeFeed.df]] takes
  * the format as a parameter (default "kafka") for exactly this
  * swap.
  *
  * Records live in a JVM-global topic map ([[FakeKafka.produce]]), so
  * the driver and local-mode executors share state. This is a TEST
  * transport: single partition, no durability, no cross-JVM reach.
  */
object FakeKafka {

  /** The spark-sql-kafka source schema, replicated. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** One record: a null `value` is a Kafka tombstone. */
  final case class Rec(key: String, value: String, tsMillis: Long)

  private val topics = TrieMap.empty[String, java.util.ArrayList[Rec]]

  def produce(topic: String, records: (String, String)*): Unit = {
    val log = topics.getOrElseUpdate(topic, new java.util.ArrayList[Rec])
    log.synchronized {
      records.foreach { case (k, v) =>
        log.add(Rec(k, v, System.currentTimeMillis())); ()
      }
    }
  }

  def endOffset(topic: String): Long =
    topics.get(topic).map(l => l.synchronized(l.size.toLong)).getOrElse(0L)

  /** The [start, end) slice of a topic's log. */
  def slice(topic: String, start: Long, end: Long): Seq[Rec] =
    topics.get(topic)
      .map(l => l.synchronized {
        (start until math.min(end, l.size)).map(i => l.get(i.toInt))
      })
      .getOrElse(Seq.empty)

  def deleteTopic(topic: String): Unit = { topics.remove(topic); () }
}

/** `format("fakekafka")` provider. Options: `subscribe` (one topic),
  * `startingOffsets` earliest|latest (default earliest). */
class FakeKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fakekafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKafka.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties arrive case-preserved; resolve option names the way
    // the real source does (case-insensitively)
    val opts = new CaseInsensitiveStringMap(properties)
    new FakeKafkaTable(opts.get("subscribe"),
      Option(opts.get("startingoffsets")).getOrElse("earliest"))
  }
}

private[streaming] class FakeKafkaTable(topic: String, starting: String)
    extends Table with SupportsRead {
  require(topic != null, "fakekafka requires option 'subscribe'")
  require(starting == "earliest" || starting == "latest",
    s"fakekafka startingOffsets must be earliest|latest, got $starting")
  override def name(): String = s"fakekafka:$topic"
  override def schema(): StructType = FakeKafka.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FakeKafka.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FakeKafkaMicroBatchStream(topic, starting)
      }
    }
}

private[streaming] case class FakeKafkaOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private[streaming] case class FakeKafkaPartition(topic: String, start: Long,
                                                 end: Long)
    extends InputPartition

private[streaming] class FakeKafkaMicroBatchStream(topic: String,
                                                   starting: String)
    extends MicroBatchStream {
  override def initialOffset(): Offset =
    FakeKafkaOffset(
      if (starting == "latest") FakeKafka.endOffset(topic) else 0L)
  override def latestOffset(): Offset =
    FakeKafkaOffset(FakeKafka.endOffset(topic))
  override def deserializeOffset(json: String): Offset =
    FakeKafkaOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(FakeKafkaPartition(topic,
      start.asInstanceOf[FakeKafkaOffset].pos,
      end.asInstanceOf[FakeKafkaOffset].pos))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val fp = p.asInstanceOf[FakeKafkaPartition]
        // local-mode transport: the slice is read from the shared
        // JVM-global log (a real broker's fetch); records are copied
        // out under the log's lock before iteration
        val rows = FakeKafka.slice(fp.topic, fp.start, fp.end)
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.size }
          override def get(): InternalRow = {
            val r = rows(i)
            new GenericInternalRow(Array[Any](
              if (r.key == null) null else r.key.getBytes("UTF-8"),
              if (r.value == null) null else r.value.getBytes("UTF-8"),
              UTF8String.fromString(fp.topic),
              0,
              fp.start + i,
              r.tsMillis * 1000L,
              1))
          }
          override def close(): Unit = ()
        }
      }
    }
}
