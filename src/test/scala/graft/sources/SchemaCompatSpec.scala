package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** [[SchemaCompat]] — the registry-style BACKWARD/FORWARD/FULL gate
  * over Spark schemas (the reference's Schema Registry enforces
  * BACKWARD by default on every subject). */
class SchemaCompatSpec extends AnyFunSuite {

  private def s(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nl) => StructField(n, t, nl) })

  private val base = s(("id", LongType, false), ("name", StringType, true))

  test("adding a nullable field is BACKWARD compatible; non-nullable is not") {
    val plus = s(("id", LongType, false), ("name", StringType, true),
      ("score", DoubleType, true))
    assert(SchemaCompat.isBackwardCompatible(base, plus))
    val plusStrict = s(("id", LongType, false), ("name", StringType, true),
      ("score", DoubleType, false))
    val issues = SchemaCompat.backwardIssues(base, plusStrict)
    assert(issues.exists(i => i.path == "score" &&
      i.reason.contains("non-nullable")), issues.mkString(", "))
    // ...and the mirror: the ADD is not FORWARD compatible only if
    // the old reader can't fill it — old reader just ignores it
    assert(SchemaCompat.isForwardCompatible(base, plus))
  }

  test("removing a field: BACKWARD fine, FORWARD only if it was nullable") {
    val minus = s(("id", LongType, false))
    assert(SchemaCompat.isBackwardCompatible(base, minus))
    assert(SchemaCompat.isForwardCompatible(base, minus)) // name nullable
    val strictBase = s(("id", LongType, false), ("name", StringType, false))
    assert(!SchemaCompat.isForwardCompatible(strictBase, minus))
  }

  test("lossless widenings pass; narrowings and cross-type changes fail") {
    val w1 = s(("id", IntegerType, false))
    val w2 = s(("id", LongType, false))
    assert(SchemaCompat.isBackwardCompatible(w1, w2))
    assert(!SchemaCompat.isBackwardCompatible(w2, w1)) // narrowing
    assert(SchemaCompat.isBackwardCompatible(
      s(("x", FloatType, true)), s(("x", DoubleType, true))))
    assert(!SchemaCompat.isBackwardCompatible(
      s(("x", LongType, true)), s(("x", StringType, true))))
    // decimal: precision may grow at fixed scale, not shrink
    assert(SchemaCompat.isBackwardCompatible(
      s(("d", DecimalType(10, 2), true)), s(("d", DecimalType(12, 2), true))))
    assert(!SchemaCompat.isBackwardCompatible(
      s(("d", DecimalType(12, 2), true)), s(("d", DecimalType(10, 2), true))))
  }

  test("nested structs, arrays, and maps recurse; map keys must match") {
    val oldS = s(("c", s(("street", StringType, true)), true),
      ("tags", ArrayType(IntegerType, containsNull = true), true),
      ("m", MapType(StringType, IntegerType, valueContainsNull = true), true))
    val newS = s(
      ("c", s(("street", StringType, true), ("zip", IntegerType, true)), true),
      ("tags", ArrayType(LongType, containsNull = true), true),
      ("m", MapType(StringType, LongType, valueContainsNull = true), true))
    assert(SchemaCompat.isBackwardCompatible(oldS, newS),
      SchemaCompat.backwardIssues(oldS, newS).mkString(", "))
    val badKey = s(("m",
      MapType(LongType, IntegerType, valueContainsNull = true), true))
    val issues = SchemaCompat.backwardIssues(
      s(("m", MapType(StringType, IntegerType, true), true)), badKey)
    assert(issues.exists(_.path == "m<key>"), issues.mkString(", "))
  }

  test("FULL = both directions; the mergeSchema evolution case is FULL") {
    // exactly the src_schema_evolution shape: v2 adds a nullable col
    val v1 = s(("n_nationkey", LongType, true), ("n_name", StringType, true))
    val v2 = s(("n_nationkey", LongType, true), ("n_name", StringType, true),
      ("n_len", LongType, true))
    assert(SchemaCompat.isFullyCompatible(v1, v2))
    // a type REPLACEMENT is compatible in neither direction
    val v3 = s(("n_nationkey", StringType, true), ("n_name", StringType, true))
    assert(!SchemaCompat.isBackwardCompatible(v1, v3) &&
      !SchemaCompat.isForwardCompatible(v1, v3))
  }

  test("field matching is case-insensitive, like Spark's resolver") {
    val upper = s(("ID", LongType, false), ("NAME", StringType, true))
    assert(SchemaCompat.isFullyCompatible(base, upper))
  }
}
