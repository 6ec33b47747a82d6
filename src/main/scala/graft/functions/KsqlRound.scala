package graft.functions

import java.math.RoundingMode
import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types._

/** ksqlDB's `ROUND` (reference stack: ksqlDB 0.28,
  * docker-compose.yml:83). ksql's Round UDF rounds halves TOWARD
  * POSITIVE INFINITY — `HALF_UP` for non-negative values, `HALF_DOWN`
  * for negative ones — in BOTH arities (`ROUND(-2.5)` = -2,
  * `ROUND(-2.55, 1)` = -2.5), and its integral overloads are identity.
  * Spark's builtin `round` differs on every axis (half away from zero,
  * keeps the input type), so a direct pass-through silently changes
  * values; and the earlier `floor(v + 0.5)` spelling differed from
  * `Math.round` at the 0.49999999999999994 boundary (double
  * imprecision promotes the sum to 1.0) and corrupted BIGINTs beyond
  * 2^53 via the detour through DOUBLE. These two expressions implement
  * the exact semantics natively, inside whole-stage codegen.
  */
object KsqlRound {
  /** Sign-dependent half-toward-+∞ rounding at `scale` decimal places
    * (ksql's `roundBigDecimal`): HALF_UP for v ≥ 0, HALF_DOWN for
    * v < 0. NaN / ±Inf pass through (BigDecimal can't hold them). */
  def round2(v: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else JBigDecimal.valueOf(v).setScale(scale,
      if (v < 0) RoundingMode.HALF_DOWN else RoundingMode.HALF_UP)
      .doubleValue()

  /** 1-arg decimal path: same sign-dependent split at scale 0,
    * exact (no double detour). */
  def round1Dec(d: Decimal): Long = {
    val bd = d.toJavaBigDecimal
    bd.setScale(0,
      if (bd.signum() < 0) RoundingMode.HALF_DOWN else RoundingMode.HALF_UP)
      .longValue()
  }
}

/** `ROUND(v)` → BIGINT. Integral inputs are IDENTITY (no detour
  * through DOUBLE — BIGINTs beyond 2^53 stay exact); fractional inputs
  * use `Math.round` (halves toward +∞, correct at the
  * 0.49999999999999994 boundary); decimals round exactly with the
  * sign-dependent mode split. */
case class KsqlRound1(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"round expects a numeric value, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      v.asInstanceOf[Number].longValue()
    case FloatType => Math.round(v.asInstanceOf[Float].toDouble)
    case DoubleType => Math.round(v.asInstanceOf[Double])
    case _: DecimalType => KsqlRound.round1Dec(v.asInstanceOf[Decimal])
    case NullType => null
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        defineCodeGen(ctx, ev, c => s"(long)($c)")
      case FloatType =>
        defineCodeGen(ctx, ev, c => s"java.lang.Math.round((double)($c))")
      case DoubleType =>
        defineCodeGen(ctx, ev, c => s"java.lang.Math.round($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.KsqlRound.round1Dec($c)")
    }

  override protected def withNewChildInternal(
      newChild: Expression): KsqlRound1 = copy(child = newChild)
}

/** `ROUND(v, decimalPlaces)` → DOUBLE, ksql's sign-dependent
  * HALF_UP / HALF_DOWN split at the target scale (ksql resolves
  * integral inputs through its (double, int) overload, so the DOUBLE
  * result type matches; negative scales round to tens/hundreds). */
case class KsqlRound2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: NumericType | NullType,
            ByteType | ShortType | IntegerType | LongType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"round expects (numeric, integer decimalPlaces), got $other")
    }

  override def nullSafeEval(v: Any, s: Any): Any = {
    val d = left.dataType match {
      case _: DecimalType => v.asInstanceOf[Decimal].toDouble
      case _ => v.asInstanceOf[Number].doubleValue()
    }
    KsqlRound.round2(d, s.asInstanceOf[Number].intValue())
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val toD: String => String = left.dataType match {
      case _: DecimalType => c => s"$c.toDouble()"
      case _ => c => s"(double)($c)"
    }
    defineCodeGen(ctx, ev,
      (v, s) => s"graft.functions.KsqlRound.round2(${toD(v)}, (int)($s))")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KsqlRound2 =
    copy(left = newLeft, right = newRight)
}
