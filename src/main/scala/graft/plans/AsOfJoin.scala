package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AS-OF JOIN as a full custom operator (SURVEY.md §2.4 notes the
  * reference exercises no as-of join; this supplies it as an engine
  * capability — the guide's preference-ladder path (c): LogicalPlan +
  * SparkStrategy + SparkPlan, registered via SparkSessionExtensions).
  *
  * Semantics: LEFT OUTER backward as-of — for each left row, the
  * single right row with equal key and the greatest right-time ≤
  * left-time; null right side if none.
  *
  * Physical: sort-merge. `requiredChildDistribution` clusters both
  * sides by key and `requiredChildOrdering` sorts by (key, time), so
  * EnsureRequirements plans one shuffle + sort per side; the merge is
  * then a single forward pass per co-located partition pair — state is
  * ONE remembered row, versus the window-function formulation which
  * buffers whole partitions, or the equi-join + groupBy-max which
  * shuffles the join product. At 100 TB: shuffle is linear in input,
  * no join explosion, no skew amplification beyond the key
  * distribution itself.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both children must land on the SAME partition count for
    * zipPartitions: pinning requiredNumPartitions makes
    * EnsureRequirements produce exactly-N shuffles on both sides and
    * stops AQE from coalescing them independently (which would
    * mispair or fail to zip). */
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions
    Seq(ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(n)),
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(n)))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  private def ordFor(dt: DataType): Ordering[Any] = dt match {
    case LongType | IntegerType | ShortType | ByteType | TimestampType |
         TimestampNTZType | DateType =>
      Ordering.by((v: Any) => v.asInstanceOf[Number].longValue())
    case DoubleType | FloatType =>
      Ordering.by((v: Any) => v.asInstanceOf[Number].doubleValue())
    case StringType =>
      Ordering.comparatorToOrdering(
        (a: Any, b: Any) => a.asInstanceOf[UTF8String]
          .compareTo(b.asInstanceOf[UTF8String]))
    case other =>
      throw new IllegalArgumentException(s"as-of join key/time type: $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = ordFor(leftKey.dataType)
    val timeOrd = ordFor(leftTime.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // bind against the NULLABLE output schema — binding the original
      // (non-nullable) right attributes would skip null checks and
      // read garbage for unmatched rows
      val proj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      val rBuf = rIt.buffered
      // one remembered candidate: the latest right row seen whose key
      // equals matchKey (both iterators ascend by (key, time))
      var matchRow: InternalRow = null
      var matchKey: Any = null

      lIt.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        if (lk != null && lt != null) {
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = rTimeB.eval(head)
            if (rk == null || rt == null) { rBuf.next(); () }
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next(); () } // key fully behind: discard
              else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                matchRow = rBuf.next().copy()
                matchKey = rKeyB.eval(matchRow)
              } else continue = false
            }
          }
        }
        val rightSide =
          if (lk != null && matchRow != null && keyOrd.compare(matchKey, lk) == 0)
            matchRow
          else nullRight
        proj(joined(l, rightSide))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API. Column names of the two sides must be disjoint (pass a
  * renamed right side — fresh exprIds also make self-joins safe). */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "as-of join requires disjoint column names; rename the right side")
    val spark = left.sparkSession
    // usable on sessions built without GraftExtensions too
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      GraftBridge.expression(leftKey), GraftBridge.expression(rightKey),
      GraftBridge.expression(leftTime), GraftBridge.expression(rightTime))
    GraftBridge.ofRows(left.sparkSession, plan)
  }
}
