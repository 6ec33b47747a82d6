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
  * Semantics: LEFT OUTER as-of with the pandas `merge_asof` surface —
  * for each left row, the single right row with equal key and
  *   - `backward` (default): the greatest right-time ≤ left-time;
  *   - `forward`: the smallest right-time ≥ left-time;
  *   - `nearest`: whichever of those two is closer in time
  *     (exact tie → backward, the pandas rule);
  * optionally bounded by `tolerance` (max |Δtime| in the time
  * column's native units — microseconds for timestamps); null right
  * side if none qualifies. Rows tied on (key, time) are
  * interchangeable for matching: deterministic outputs should project
  * the matched TIME (or other functionally-dependent values), as the
  * intra-tie file order is not defined after a shuffle.
  *
  * Physical: sort-merge. `requiredChildDistribution` clusters both
  * sides by key and `requiredChildOrdering` sorts by (key, time), so
  * EnsureRequirements plans one shuffle + sort per side; the merge is
  * then a single forward pass per co-located partition pair — state is
  * ONE remembered row plus a peek at the stream head (the forward
  * candidate), versus the window-function formulation which buffers
  * whole partitions, or the equi-join + groupBy-max which shuffles the
  * join product. At 100 TB: shuffle is linear in input, no join
  * explosion, no skew amplification beyond the key distribution
  * itself; all three directions share the identical single pass.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        direction: String = "backward",
                        tolerance: Option[Long] = None)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        direction: String,
                        tolerance: Option[Long])
    extends BinaryExecNode {

  require(Set("backward", "forward", "nearest").contains(direction),
    s"as-of direction must be backward|forward|nearest, got $direction")

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

  /** |a - b| as a double — only needed by `nearest`/`tolerance`, so
    * string times stay legal for plain backward/forward. */
  private def distFor(dt: DataType): (Any, Any) => Double = dt match {
    case LongType | IntegerType | ShortType | ByteType | TimestampType |
         TimestampNTZType | DateType =>
      (a, b) => math.abs(a.asInstanceOf[Number].longValue() -
        b.asInstanceOf[Number].longValue()).toDouble
    case DoubleType | FloatType =>
      (a, b) => math.abs(a.asInstanceOf[Number].doubleValue() -
        b.asInstanceOf[Number].doubleValue())
    case other => throw new IllegalArgumentException(
      s"as-of nearest/tolerance needs a numeric or time column, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = ordFor(leftKey.dataType)
    val timeOrd = ordFor(leftTime.dataType)
    val needDist = direction == "nearest" || tolerance.isDefined
    val dist: (Any, Any) => Double =
      if (needDist) distFor(leftTime.dataType) else null
    val tol = tolerance.map(_.toDouble)
    val dir = direction
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
      // one remembered candidate: the latest right row seen with
      // time STRICTLY BELOW the current left time (both iterators
      // ascend by (key, time)); the stream head supplies the ≥ side
      var backRow: InternalRow = null
      var backKey: Any = null
      var backTime: Any = null

      def within(rt: Any, lt: Any): Boolean =
        tol.forall(t => dist(rt, lt) <= t)

      lIt.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        var fwdRow: InternalRow = null
        var fwdTime: Any = null
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
              else if (c == 0 && timeOrd.compare(rt, lt) < 0) {
                backRow = rBuf.next().copy()
                backKey = rKeyB.eval(backRow)
                backTime = rTimeB.eval(backRow)
              } else {
                // head is (key == lk, time ≥ lt) or a later key: the
                // forward candidate if the key matches. NOT consumed —
                // it may serve later left rows too.
                if (c == 0) { fwdRow = head; fwdTime = rt }
                continue = false
              }
            }
          }
        }
        // a null key or null time can never match any right row: short-
        // circuit BEFORE haveBack/within — a stale backRow from an
        // earlier same-key left row must not leak in, and dist(_, null)
        // (tolerance path) would NPE
        val rightSide: InternalRow = if (lk == null || lt == null) nullRight
        else {
        val haveBack = backRow != null && keyOrd.compare(backKey, lk) == 0
        // a right row at EXACTLY the left time sits at the stream
        // head (strict < consumption): it is the best "≤" match too
        val backAtTie = fwdRow != null && timeOrd.compare(fwdTime, lt) == 0
        dir match {
          case "backward" =>
            if (backAtTie && within(fwdTime, lt)) fwdRow
            else if (haveBack && within(backTime, lt)) backRow
            else nullRight
          case "forward" =>
            if (fwdRow != null && within(fwdTime, lt)) fwdRow else nullRight
          case "nearest" =>
            val b = if (haveBack && within(backTime, lt)) backRow else null
            val f = if (fwdRow != null && within(fwdTime, lt)) fwdRow
              else null
            if (backAtTie) fwdRow // exact tie is distance 0 both ways
            else if (b != null && f != null)
              // strictly-closer forward wins; ties go backward
              if (dist(fwdTime, lt) < dist(backTime, lt)) f else b
            else if (b != null) b
            else if (f != null) f
            else nullRight
        }
        }
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
           leftTime: Column, rightTime: Column,
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
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
      GraftBridge.expression(leftTime), GraftBridge.expression(rightTime),
      direction, tolerance)
    GraftBridge.ofRows(left.sparkSession, plan)
  }
}
