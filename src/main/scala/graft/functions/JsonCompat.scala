package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData,
  GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ksqlDB 0.28 JSON builtins whose semantics need a real JSON
  * parser rather than a builtin composition (reference stack: ksqlDB
  * 0.28, docker-compose.yml:83):
  *
  *  - `JSON_ITEMS(jsonArray)` → ARRAY<STRING> of the array elements'
  *    SERIALIZED-JSON forms (`"x"` keeps its quotes, objects their
  *    braces, JSON null becomes the string `null`). Non-array or
  *    invalid input → NULL.
  *
  *  - `JSON_RECORDS(json)` → MAP<STRING, STRING> of the top-level
  *    object's keys to their SERIALIZED-JSON values (`"x"` keeps its
  *    quotes, objects/arrays their braces — `get_json_object` strips
  *    all of that, so no composition reproduces it). Non-object or
  *    invalid input → NULL.
  *  - `JSON_CONCAT(a, b[, ...])` → ksql follows PostgreSQL's `||`
  *    rule: if EVERY input deserializes to an object, merge shallowly
  *    left-to-right (later keys win); otherwise every non-array input
  *    (object, scalar, or JSON null alike) is wrapped into a
  *    single-element array and the arrays are concatenated —
  *    `JSON_CONCAT('{"a":1}','[1]')` → `[{"a":1},1]`,
  *    `JSON_CONCAT('1','2')` → `[1,2]`. SQL NULL or unparseable input
  *    → NULL. The expression is variadic (NOT a fold of a binary op:
  *    the wrap rule is not associative — `('{"a":1}','{"b":2}','[1]')`
  *    must give `[{"a":1},{"b":2},1]`, while a left fold would first
  *    merge the two objects).
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

/** `JSON_ITEMS(jsonArray)` → ARRAY<STRING> of serialized elements
  * (ksqlDB 0.28 JsonItems). Non-array or invalid JSON → NULL. */
case class JsonItems(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      // NullType: an untyped NULL literal is an always-NULL operand
      case StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"json_items expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    JsonCompat.parse(input.asInstanceOf[UTF8String].toString) match {
      case Some(a: ArrayNode) =>
        val items = new Array[Any](a.size())
        var i = 0
        while (i < items.length) {
          items(i) = UTF8String.fromString(a.get(i).toString)
          i += 1
        }
        new GenericArrayData(items)
      case _ => null // non-array or invalid JSON, per ksql
    }

  override protected def withNewChildInternal(
      newChild: Expression): JsonItems = copy(child = newChild)
}

case class JsonConcat(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    // NullType is accepted: an untyped NULL literal operand is an
    // always-NULL input, and ksqlDB accepts JSON_CONCAT(NULL, '[1]')
    // and returns NULL — the eval path already short-circuits on it
    children.find(c =>
        c.dataType != StringType && c.dataType != NullType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"json_concat expects strings, got ${c.dataType.simpleString}")
      case None if children.size < 2 => TypeCheckResult.TypeCheckFailure(
        "json_concat expects at least 2 arguments")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val nodes = new Array[JsonNode](children.size)
    var i = 0
    while (i < nodes.length) {
      val v = children(i).eval(input)
      if (v == null) return null // SQL NULL input → NULL
      JsonCompat.parse(v.asInstanceOf[UTF8String].toString) match {
        case Some(n) => nodes(i) = n
        case None => return null // unparseable → NULL
      }
      i += 1
    }
    val out: JsonNode =
      if (nodes.forall(_.isInstanceOf[ObjectNode])) {
        // all objects: shallow merge, later keys win (PG || on objects).
        // deepCopy is generic <T extends JsonNode> T — the explicit
        // type keeps scalac from inferring T = Nothing
        val merged: ObjectNode = nodes.head.asInstanceOf[ObjectNode].deepCopy()
        nodes.tail.foreach { n => // setAll is generic too — pin T
          merged.setAll[ObjectNode](n.asInstanceOf[ObjectNode]); ()
        }
        merged
      } else {
        // any non-object present: wrap non-arrays (objects, scalars,
        // JSON null) into 1-element arrays and concatenate
        val arr = JsonCompat.mapper.createArrayNode()
        nodes.foreach {
          case a: ArrayNode => arr.addAll(a)
          // addAll(singletonList) keeps overload resolution
          // unambiguous for scalac (ArrayNode.add has ~12 overloads)
          case other =>
            arr.addAll(java.util.Collections.singletonList(other))
        }
        arr
      }
    UTF8String.fromString(JsonCompat.mapper.writeValueAsString(out))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JsonConcat =
    copy(children = newChildren)
}
