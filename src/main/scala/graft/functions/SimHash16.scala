package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** 16-bit SimHash of a token array in one native per-row pass.
  *
  * Replaces the relational spelling (explode distinct tokens × 16-row
  * bit table cross join + two grouped aggregations — two shuffles) with
  * a narrow scan: distinct tokens hashed once (first 4 hex chars of
  * md5 → 16-bit value), ±1 per bit accumulated, sign taken. Matches
  * the DuckDB oracle bit-for-bit. At 100 TB the signature pass becomes
  * shuffle-free; only the (tiny) signature relation moves for the
  * bucketed near-dup join.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val digest: MessageDigest =
    MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val seen = new java.util.HashSet[String]()
    val md = digest
    val counts = new Array[Int](16)
    var i = 0
    while (i < n) {
      // null elements are skipped (split() never yields them)
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i).toString
        if (seen.add(t)) {
          md.reset()
          val dg = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 4 hex chars == first 2 digest bytes
          val v = ((dg(0) & 0xff) << 8) | (dg(1) & 0xff)
          var b = 0
          while (b < 16) {
            if (((v >> b) & 1) == 1) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash16", exprs => SimHash16(exprs.head), "scala_udf")

  def apply(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("simhash16", tokens)
  }
}
