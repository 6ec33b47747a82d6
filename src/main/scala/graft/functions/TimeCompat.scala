package graft.functions

import java.time.LocalTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ksqlDB 0.28's `TIME` type surface (reference stack: ksqlDB 0.28,
  * docker-compose.yml:83). Spark 4.1's own TIME type exists but is
  * feature-gated off (`UNSUPPORTED_TIME_TYPE` at analysis), so the
  * engine models ksql TIME the way the REFERENCE's wire does: Kafka
  * Connect's `org.apache.kafka.connect.data.Time` is an int32 counting
  * MILLISECONDS SINCE MIDNIGHT, and that exact value is what a
  * Debezium/ksql pipeline carries for a TIME column. A `TIME` column
  * in stream DDL therefore lands as INT millis-of-day, and these two
  * scalar functions are ksql's converters over it:
  *
  *  - `PARSE_TIME(str, fmt)` → INT millis-of-day; java.time pattern
  *    (ksql's ParseTime uses DateTimeFormatter). Unparseable input →
  *    NULL (the engine's analog of ksql's per-record processing-log
  *    error — the row survives, the value doesn't).
  *  - `FORMAT_TIME(millisOfDay, fmt)` → STRING. Out-of-range input
  *    (negative or ≥ 86 400 000) → NULL.
  *
  * Both accept a non-literal format column; the compiled
  * DateTimeFormatter for the most recent pattern is cached per
  * expression instance (formats are almost always constant per query,
  * so the hot path compiles the pattern once per partition). */
private[graft] object TimeCompat {
  val MillisPerDay: Int = 86400000

  /** Single-slot pattern→formatter cache: formats are constant per
    * query in practice, and a 1-deep cache dodges both the per-row
    * ofPattern cost and an unbounded map. */
  final class FormatterCache extends Serializable {
    @transient private var lastPattern: String = _
    @transient private var lastFormatter: DateTimeFormatter = _
    def get(pattern: String): DateTimeFormatter = {
      if (pattern != lastPattern) {
        lastFormatter = DateTimeFormatter.ofPattern(pattern)
        lastPattern = pattern
      }
      lastFormatter
    }
  }
}

/** `PARSE_TIME(str, fmt)` → INT millis-of-day (NULL on parse failure). */
case class ParseTime(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // NullType: an untyped NULL literal is an always-NULL operand
      case (StringType | NullType, StringType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"parse_time expects (string, string), got $other")
    }

  private val cache = new TimeCompat.FormatterCache

  override def nullSafeEval(s: Any, f: Any): Any =
    try {
      val t = LocalTime.parse(s.asInstanceOf[UTF8String].toString,
        cache.get(f.asInstanceOf[UTF8String].toString))
      (t.toNanoOfDay / 1000000L).toInt
    } catch {
      // DateTimeException covers parse failures AND date-bearing
      // patterns (e.g. 'yyyy-MM-dd' → UnsupportedTemporalTypeException
      // when LocalTime lacks the field) — both follow the documented
      // NULL-on-error model, never killing the query.
      case _: java.time.DateTimeException => null
      case _: IllegalArgumentException => null // bad pattern
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ParseTime =
    copy(left = newLeft, right = newRight)
}

/** `FORMAT_TIME(millisOfDay, fmt)` → STRING (NULL if out of range). */
case class FormatTime(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType | LongType | NullType, StringType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"format_time expects (int millis-of-day, string), got $other")
    }

  private val cache = new TimeCompat.FormatterCache

  override def nullSafeEval(m: Any, f: Any): Any = {
    val millis = m.asInstanceOf[Number].longValue()
    if (millis < 0 || millis >= TimeCompat.MillisPerDay) null
    else
      try UTF8String.fromString(
        LocalTime.ofNanoOfDay(millis * 1000000L)
          .format(cache.get(f.asInstanceOf[UTF8String].toString)))
      catch {
        // a pattern that is valid for ofPattern but asks for date
        // fields (e.g. 'yyyy-MM-dd') throws
        // UnsupportedTemporalTypeException (a DateTimeException) from
        // LocalTime.format — the documented contract is NULL, not a
        // query-killing exception
        case _: java.time.DateTimeException => null
        case _: IllegalArgumentException => null // bad pattern
      }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FormatTime =
    copy(left = newLeft, right = newRight)
}
