package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Bounded-window INTERVAL JOIN as a first-class operator — the
  * multi-match generalization of [[AsofJoin]]: for every left row, ALL
  * right rows of the same key with `rightTime ∈ [leftTime − window,
  * leftTime)` (inner join).
  *
  * Spark executes this shape as a sort-merge equi-join with the band
  * condition as a post-join filter — O(per-key-pairs) work and memory in
  * the matcher. This operator asks the planner for co-clustered,
  * (key, time)-sorted children and sweeps each partition once with a ring
  * buffer holding ONLY the rows inside the current window: O(n + matches)
  * time, O(window density) state — the batch twin of the watermarked
  * stream-stream join (StreamingOps.purchaseClickJoin), which bounds the
  * same buffer by the watermark.
  *
  * Time columns must be timestamp or long (the window is in the column's
  * internal units — microseconds for timestamps). NULL keys and NULL
  * times never match.
  */
final case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    window: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, lt, rt, w) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, w) :: Nil
    case _ => Nil
  }
}

final case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    window: Long) extends BinaryExecNode {

  require(Seq(leftTime.dataType, rightTime.dataType).forall(
    dt => dt == TimestampType || dt == LongType),
    s"interval join needs timestamp/long time columns, got ${leftTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val w = window
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeBound = BindReferences.bindReference(leftTime, lOut)
      val rTimeBound = BindReferences.bindReference(rightTime, rOut)
      val keyOrd = new org.apache.spark.sql.catalyst.expressions.InterpretedOrdering(
        keyTypes.zipWithIndex.map { case (dt, i) =>
          SortOrder(org.apache.spark.sql.catalyst.expressions.BoundReference(i, dt, nullable = true), Ascending)
        })
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow

      // rows of the CURRENT left key whose time is still inside the most
      // recent window — times enter ascending, so eviction pops from the
      // head. Entries: (rtime, copied row).
      val buf = new java.util.ArrayDeque[(Long, InternalRow)]
      var bufKey: UnsafeRow = null
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null

      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeV = lTimeBound.eval(lRow)
        if (lTimeV == null || lKey.anyNull) Iterator.empty
        else {
          val lTime = lTimeV.asInstanceOf[Long]
          val lo = lTime - w
          // new key: previous key's buffer can never match again
          if (bufKey == null || keyOrd.compare(bufKey, lKey) != 0) {
            buf.clear()
            bufKey = lKey.copy()
          }
          // evict same-key rows that fell out of the advancing window
          while (!buf.isEmpty && buf.peekFirst()._1 < lo) buf.pollFirst()
          // pull right forward: everything strictly before (lKey, lTime)
          var advance = true
          while (advance && rRow != null) {
            val rKey = rKeyProj(rRow)
            if (rKey.anyNull) {
              rRow = if (rIter.hasNext) rIter.next() else null
            } else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) {
                rRow = if (rIter.hasNext) rIter.next() else null
              } else if (c == 0) {
                val rTimeV = rTimeBound.eval(rRow)
                if (rTimeV == null) {
                  rRow = if (rIter.hasNext) rIter.next() else null
                } else {
                  val rTime = rTimeV.asInstanceOf[Long]
                  if (rTime < lTime) {
                    if (rTime >= lo) buf.addLast((rTime, rRow.copy()))
                    // rTime < lo: expired for this and every later left row
                    rRow = if (rIter.hasNext) rIter.next() else null
                  } else advance = false // needed by later left rows
                }
              } else advance = false
            }
          }
          val it = buf.iterator()
          new Iterator[InternalRow] {
            override def hasNext: Boolean = it.hasNext
            override def next(): InternalRow = resultProj(joined(lRow, it.next()._2))
          }
        }
      }
    }
  }
}

/** Public API + runtime registration. */
object Interval {
  /** Install the planner strategy on the session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy

  /** `left INTERVAL JOIN right ON key, rightTime ∈ [leftTime − window,
    * leftTime)`. `window` is in the time column's internal units
    * (microseconds for timestamps). Column names across the two sides
    * must be distinct except the key; the right side is re-aliased
    * internally so self-joins get fresh attribute ids. */
  def join(
      left: DataFrame, right: DataFrame, key: String,
      leftTimeCol: String, rightTimeCol: String, window: Long): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val r = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String) = p.output.find(_.name == name)
      .getOrElse(sys.error(s"no column $name in ${p.output.map(_.name)}"))
    GraftSqlShim.ofRows(spark, IntervalJoin(
      lPlan, rPlan,
      Seq(attr(lPlan, key)), Seq(attr(rPlan, key)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol), window))
  }
}
