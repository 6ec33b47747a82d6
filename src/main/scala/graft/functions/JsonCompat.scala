package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData,
  GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The two ksqlDB 0.28 JSON builtins whose semantics need a real JSON
  * parser rather than a builtin composition (reference stack: ksqlDB
  * 0.28, docker-compose.yml:83):
  *
  *  - `JSON_RECORDS(json)` → MAP<STRING, STRING> of the top-level
  *    object's keys to their SERIALIZED-JSON values (`"x"` keeps its
  *    quotes, objects/arrays their braces — `get_json_object` strips
  *    all of that, so no composition reproduces it). Non-object or
  *    invalid input → NULL.
  *  - `JSON_CONCAT(a, b[, ...])` → two objects merge shallowly with
  *    the RIGHT side winning duplicate keys; two arrays concatenate;
  *    any other combination (or invalid JSON) → NULL. Registered
  *    variadic by left-folding the binary node (both rules are
  *    associative, and a NULL from a mixed pair propagates — the ksql
  *    result for any mixed chain).
  *
  * Both are scalar Catalyst expressions with Jackson-backed `eval`
  * (CodegenFallback — same trade as [[CharEntropy]]: a native
  * expression beats a UDF; Jackson ships with Spark). */
private[graft] object JsonCompat {
  // per-JVM, thread-safe for readTree/writeValueAsString
  @transient lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  def parse(s: String): Option[JsonNode] =
    try Option(mapper.readTree(s)) catch { case _: Exception => None }
}

case class JsonRecords(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"json_records expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    JsonCompat.parse(input.asInstanceOf[UTF8String].toString) match {
      case Some(o: ObjectNode) =>
        val keys = new Array[Any](o.size())
        val values = new Array[Any](o.size())
        val it = o.fields()
        var i = 0
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey)
          values(i) = UTF8String.fromString(e.getValue.toString)
          i += 1
        }
        new ArrayBasedMapData(
          new GenericArrayData(keys), new GenericArrayData(values))
      case _ => null // non-object or invalid JSON, per ksql
    }

  override protected def withNewChildInternal(
      newChild: Expression): JsonRecords = copy(child = newChild)
}

case class JsonConcat(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"json_concat expects strings, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val merged = (JsonCompat.parse(l.asInstanceOf[UTF8String].toString),
      JsonCompat.parse(r.asInstanceOf[UTF8String].toString)) match {
      case (Some(a: ObjectNode), Some(b: ObjectNode)) =>
        val out = a.deepCopy(); out.setAll(b); Some(out)
      case (Some(a: ArrayNode), Some(b: ArrayNode)) =>
        val out = a.deepCopy(); out.addAll(b); Some(out)
      case _ => None // mixed kinds, scalars, or invalid → NULL
    }
    merged
      .map(n => UTF8String.fromString(JsonCompat.mapper.writeValueAsString(n)))
      .orNull
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonConcat =
    copy(left = newLeft, right = newRight)
}
