package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** ksqlDB 0.28's numeric byte-decoders — `INT_FROM_BYTES` /
  * `BIGINT_FROM_BYTES` / `DOUBLE_FROM_BYTES`: interpret a 4/8-byte
  * BIG-ENDIAN payload as the number (ksql's BytesUtils wraps a
  * ByteBuffer; BIG_ENDIAN is its only supported order as of 0.28).
  * The double is an IEEE-754 bit pattern — no builtin composition
  * bit-casts binary→double, hence one small native expression for
  * the family (CodegenFallback, same trade as [[CharEntropy]]).
  * A payload of the wrong width yields NULL under the engine's
  * record-error model (ksql logs the record and moves on). */
case class NumFromBytes(child: Expression, target: DataType)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = target
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, target) match {
      case (BinaryType, IntegerType | LongType | DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"num_from_bytes expects (binary → int|bigint|double), got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val want = target match {
      case IntegerType => 4
      case _ => 8
    }
    if (bytes.length != want) null
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      target match {
        case IntegerType => bb.getInt
        case LongType => bb.getLong
        case DoubleType => bb.getDouble
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): NumFromBytes = copy(child = newChild)
}
