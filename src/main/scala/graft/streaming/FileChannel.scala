package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** A disk-backed intermediate "topic": the offline analog of the Kafka
  * topic ksqlDB writes between persistent queries (`enriched_orders`,
  * reference README.md:448). An upstream query's `foreachBatch` appends
  * parquet files; a downstream streaming query tails the directory with
  * a file-source stream. Nothing passes through driver memory — the
  * executors write and read the files directly, so the hop scales with
  * the cluster, not the driver heap (in production this is the Kafka
  * topic or a Delta table; the operator graph is identical).
  *
  * Replay idempotence: a `_committed_<batchId>` marker is written after
  * a batch's files land; a replayed batch id whose marker exists is
  * skipped. A crash in the narrow window between the append and the
  * marker re-appends that batch once — at-least-once across crashes,
  * which the KEYED sink downstream collapses to exactly-once-per-key
  * visible state (the same delivery contract Kafka + an idempotent
  * sink gives the reference). `_`-prefixed files are invisible to the
  * parquet reader, so markers never pollute the stream.
  */
class FileChannel(spark: SparkSession, dir: String, schema: StructType) {
  Files.createDirectories(Paths.get(dir))

  /** Append one micro-batch (exactly once per batchId). */
  def write(batch: DataFrame, batchId: Long): Unit = {
    val marker = Paths.get(dir, s"_committed_$batchId")
    if (Files.exists(marker)) return
    batch.write.mode("append").parquet(dir)
    Files.createFile(marker)
    ()
  }

  /** Tail the channel as an unbounded file-source stream. */
  def readStream: DataFrame = spark.readStream.schema(schema).parquet(dir)
}
