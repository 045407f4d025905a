package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** AS-OF JOIN as a first-class operator — the full custom-operator ladder
  * (SURVEY §7.3 preference (c)): logical node → planner strategy →
  * physical exec, injected at runtime via `experimental.extraStrategies`.
  *
  * Spark has no as-of join; the composed formulation (union + window,
  * `ops/Temporal.q46AsofJoin`) walks every event through a whole-row
  * `last()` window. This operator instead asks the planner for the exact
  * physical properties the algorithm needs — both children hash-clustered
  * on the key and sorted by (key, time) — and then streams a single
  * forward merge per partition: O(n) after the sort, one buffered right
  * row of state, no row replication. EnsureRequirements inserts the
  * shuffles/sorts only when the children aren't already partitioned that
  * way (a bucketed layout makes them no-ops).
  *
  * Semantics: for every left row, the LAST right row of the same key with
  * `rightTime <= leftTime` (ties within an equal `rightTime` resolved by
  * the trailing `rightTieBreak` ordering, matching the oracle's
  * `ORDER BY c.ts DESC, c.event_id DESC ... rn = 1`); left outer — left
  * rows with no match emit nulls on the right. NULL times and NULL keys
  * never match (SQL equi-join semantics).
  */
final case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] into [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tie) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on the join key → EnsureRequirements makes the
    * partitionings compatible (same mechanism sort-merge join uses). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (key, time) ascending per partition; the right side additionally
    * tie-breaks so "last match" is deterministic among equal times. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeBound = BindReferences.bindReference(leftTime, lOut)
      val rTimeBound = BindReferences.bindReference(rightTime, rOut)
      val keyOrd = new org.apache.spark.sql.catalyst.expressions.InterpretedOrdering(
        keyTypes.zipWithIndex.map { case (dt, i) =>
          SortOrder(org.apache.spark.sql.catalyst.expressions.BoundReference(i, dt, nullable = true), Ascending)
        })
      val timeOrd = PhysicalDataType.ordering(timeType).asInstanceOf[Ordering[Any]]
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeBound.eval(lRow)
        // SQL equi-join semantics: a NULL key never matches (the
        // interpreted ordering would treat null == null as equal, so
        // null-keyed rows must not enter the merge at all)
        if (lTime != null && !lKey.anyNull) {
          var advance = true
          while (advance && rRow != null) {
            val rKey = rKeyProj(rRow)
            if (rKey.anyNull) {
              // nulls sort first under Ascending: skip them outright
              rRow = if (rIter.hasNext) rIter.next() else null
            } else {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              // right still on an earlier key: skip forward
              rRow = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0) {
              val rTime = rTimeBound.eval(rRow)
              if (rTime != null && timeOrd.lteq(rTime, lTime)) {
                lastMatch = rRow.copy()      // iterators reuse row buffers
                lastMatchKey = lKey.copy()
                rRow = if (rIter.hasNext) rIter.next() else null
              } else if (rTime == null) {
                rRow = if (rIter.hasNext) rIter.next() else null // never matches
              } else advance = false
            } else advance = false
            }
          }
        }
        val m =
          if (!lKey.anyNull && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0) lastMatch
          else null
        resultProj(joined(lRow, if (m == null) nullRight else m))
      }
    }
  }
}

/** Public API + runtime registration. */
object Asof {
  /** Install the planner strategy on the session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** `left ASOF JOIN right ON key, rightTime <= leftTime` keeping the last
    * right row per left row. Column names across the two sides must be
    * distinct (rename before joining, as with any self-join). The right
    * side is re-aliased internally so a self-join gets fresh attribute
    * ids. */
  def join(
      left: DataFrame, right: DataFrame, key: String,
      leftTimeCol: String, rightTimeCol: String,
      rightTieBreakCols: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // fresh exprIds on the right so self-joins (same scan both sides) work
    val r = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String) = p.output.find(_.name == name)
      .getOrElse(sys.error(s"no column $name in ${p.output.map(_.name)}"))
    val keyL = attr(lPlan, key)
    val keyR = attr(rPlan, key)
    GraftSqlShim.ofRows(spark, AsofJoin(
      lPlan, rPlan,
      Seq(keyL), Seq(keyR),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
      rightTieBreakCols.map(attr(rPlan, _))))
  }
}
