package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The deterministic hash key used by every sampling/mixing/shuffling
  * operator: the first 8 hex digits of md5(input) as a BIGINT. A pure
  * function of the row — stable across runs, engines, cluster sizes,
  * and re-partitioning (unlike `rand()` or `spark_partition_id()`),
  * which is what makes a 100 TB corpus rebuild reproducible. md5 emits
  * identical hex in Spark and DuckDB, so [[column]] and [[sql]] are
  * bit-equal spellings of the same key; operators must use BOTH from
  * here so the two engines cannot drift.
  */
object Md5Key {

  /** Spark spelling: `conv(substring(md5(input), 1, 8), 16, 10)` as a
    * non-negative BIGINT in [0, 2^32). */
  def column(input: Column): Column =
    conv(substring(md5(input), 1, 8), 16, 10).cast(LongType)

  /** DuckDB spelling of [[column]] — same bytes, same value. */
  def sql(inputSql: String): String =
    s"('0x' || substr(md5($inputSql), 1, 8))::BIGINT"
}
