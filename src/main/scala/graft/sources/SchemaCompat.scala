package graft.sources

import org.apache.spark.sql.types._

/** Schema-evolution compatibility checks — the gate the reference's
  * Schema Registry applies before accepting a new schema version
  * (reference docker-compose.yml:95-103 runs a registry; its default
  * compatibility level is BACKWARD). Re-expressed over Spark
  * StructTypes so the same gate protects parquet/lake evolution:
  *
  *  - BACKWARD: a reader with the NEW schema can read data written
  *    with the OLD one. Adding a field is fine only if the new field
  *    is nullable (the reader fills NULL — exactly what a mergeSchema
  *    read does); removing a field is always fine (the reader ignores
  *    it); a type may only WIDEN along a lossless path.
  *  - FORWARD: a reader with the OLD schema can read NEW data —
  *    the mirror image (old readers ignore added fields; removed
  *    fields must have been nullable for the old reader to fill).
  *  - FULL: both.
  *
  * Widening paths are the lossless numeric promotions parquet/Avro
  * readers perform: byte→short→int→long, float→double, and
  * decimal(p,s)→decimal(p',s) with p' ≥ p. Nested structs recurse
  * with the same rules; arrays/maps recurse on their element/value
  * types (keys must match exactly). Field name matching is
  * case-insensitive, like Spark's resolver.
  */
object SchemaCompat {

  final case class Incompatibility(path: String, reason: String) {
    override def toString: String = s"$path: $reason"
  }

  /** Problems a NEW-schema reader has with OLD-schema data (empty =
    * backward compatible). */
  def backwardIssues(oldSchema: StructType,
                     newSchema: StructType): Seq[Incompatibility] =
    structIssues(oldSchema, newSchema, "")

  /** Problems an OLD-schema reader has with NEW-schema data (empty =
    * forward compatible) — the mirror check. */
  def forwardIssues(oldSchema: StructType,
                    newSchema: StructType): Seq[Incompatibility] =
    structIssues(newSchema, oldSchema, "")

  def isBackwardCompatible(oldSchema: StructType,
                           newSchema: StructType): Boolean =
    backwardIssues(oldSchema, newSchema).isEmpty

  def isForwardCompatible(oldSchema: StructType,
                          newSchema: StructType): Boolean =
    forwardIssues(oldSchema, newSchema).isEmpty

  def isFullyCompatible(oldSchema: StructType,
                        newSchema: StructType): Boolean =
    isBackwardCompatible(oldSchema, newSchema) &&
      isForwardCompatible(oldSchema, newSchema)

  /** Can a reader with schema `reader` consume data written as
    * `writer`? */
  private def structIssues(writer: StructType, reader: StructType,
                           path: String): Seq[Incompatibility] = {
    val writerByName = writer.fields
      .map(f => f.name.toLowerCase -> f).toMap
    reader.fields.toSeq.flatMap { rf =>
      val p = if (path.isEmpty) rf.name else s"$path.${rf.name}"
      writerByName.get(rf.name.toLowerCase) match {
        case None if rf.nullable => Nil // reader fills NULL
        case None => Seq(Incompatibility(p,
          "field added as non-nullable — old data has no value for it"))
        case Some(wf) =>
          val nullabilityIssue =
            if (wf.nullable && !rf.nullable)
              Seq(Incompatibility(p,
                "reader requires non-null but old data may hold nulls"))
            else Nil
          nullabilityIssue ++ typeIssues(wf.dataType, rf.dataType, p)
      }
    }
  }

  private val widenings: Set[(DataType, DataType)] = {
    val chain = Seq(ByteType, ShortType, IntegerType, LongType)
    val numeric = for {
      (from, i) <- chain.zipWithIndex
      to <- chain.drop(i + 1)
    } yield (from: DataType, to: DataType)
    numeric.toSet + ((FloatType: DataType, DoubleType: DataType))
  }

  private def typeIssues(writer: DataType, reader: DataType,
                         path: String): Seq[Incompatibility] =
    (writer, reader) match {
      case (w, r) if w == r => Nil
      case (w, r) if widenings.contains((w, r)) => Nil
      case (w: DecimalType, r: DecimalType)
          if r.scale == w.scale && r.precision >= w.precision => Nil
      case (w: StructType, r: StructType) => structIssues(w, r, path)
      case (w: ArrayType, r: ArrayType) =>
        typeIssues(w.elementType, r.elementType, s"$path[]") ++
          (if (w.containsNull && !r.containsNull)
             Seq(Incompatibility(s"$path[]",
               "reader forbids null elements old data may hold"))
           else Nil)
      case (w: MapType, r: MapType) =>
        (if (w.keyType != r.keyType)
           Seq(Incompatibility(s"$path<key>",
             s"map key ${w.keyType.simpleString} → " +
               s"${r.keyType.simpleString} (keys must match exactly)"))
         else Nil) ++
          typeIssues(w.valueType, r.valueType, s"$path<value>")
      case (w, r) => Seq(Incompatibility(path,
        s"${w.simpleString} → ${r.simpleString} is not a lossless widening"))
    }
}
