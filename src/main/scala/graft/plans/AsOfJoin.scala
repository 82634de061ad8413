package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.bridge

/** As-of join: for each left row, the LATEST right row of the same key with
  * `rightTime <= leftTime` (optionally within a tolerance). Spark has no
  * such operator (the DataFrame restatement is a join + per-pair ranking —
  * O(pairs) work and a huge intermediate); databases ship it natively
  * (DuckDB `ASOF JOIN`, which is this operator's oracle).
  *
  * Full custom-operator ladder: logical node → planner Strategy → physical
  * merge-scan exec, registered via `spark.experimental.extraStrategies` /
  * `GraftExtensions`.
  *
  * Scale design: the exec demands hash co-partitioning on the key and
  * (key, time) in-partition ordering — EnsureRequirements inserts exactly
  * one exchange + sort per side (the same shape as SortMergeJoin). The
  * merge itself is a single forward pass per partition holding ONE
  * buffered candidate row — O(left + right) time, O(1) memory, no pair
  * blow-up, valid at any scale factor.
  *
  * Constraints (by construction of the API): equi-key of any orderable
  * type evaluated as Long (bigint keys), times are TimestampType
  * (microsecond Longs internally).
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // one exchange per side, co-clustered on the key — SortMergeJoin's shape
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // in-partition (key, time) order so the merge is a single forward pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val tol = toleranceMicros
    val lKeyB = bindLong(leftKey, left.output)
    val lTimeB = bindLong(leftTime, left.output)
    val rKeyB = bindLong(rightKey, right.output)
    val rTimeB = bindLong(rightTime, right.output)
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outputAttrs, outputAttrs)
      val rBuf = rIt.buffered

      var candKey = 0L
      var candTime = 0L
      var cand: InternalRow = null

      lIt.flatMap { l =>
        val lkB = lKeyB(l); val ltB = lTimeB(l)
        // null key/time rows can never match (equality/ordering with NULL is
        // undefined) — emit nothing rather than silently unboxing to 0
        if (lkB == null || ltB == null) Iterator.empty
        else {
          val lk = lkB.longValue(); val lt = ltB.longValue()
          // advance the right side up to (lk, lt), keeping the latest
          // candidate for key lk (rows of earlier keys are discarded)
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val rkB = rKeyB(head)
            if (rkB == null) { rBuf.next() } // null-keyed right row: discard
            else {
              val rk = rkB.longValue()
              if (rk < lk) {
                rBuf.next(); if (cand != null && candKey < lk) cand = null
              } else if (rk == lk) {
                val rtB = rTimeB(head)
                if (rtB == null) { rBuf.next() } // null-time right row: discard
                else if (rtB.longValue() <= lt) {
                  val r = rBuf.next()
                  candKey = lk; candTime = rtB.longValue(); cand = r.copy()
                } else continue = false
              } else continue = false
            }
          }
          if (cand != null && candKey == lk && lt - candTime <= tol)
            Iterator.single(project(joined(l, cand)))
          else Iterator.empty
        }
      }
    }
  }

  /** Nullable eval: returns null for NULL keys/times so callers can skip the
    * row instead of silently treating it as key 0 / epoch 0.
    */
  private def bindLong(
      e: Expression, attrs: Seq[Attribute]): InternalRow => java.lang.Long = {
    val bound = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(e, org.apache.spark.sql.catalyst.expressions.AttributeSeq(attrs))
    row => bound.eval(row).asInstanceOf[java.lang.Long]
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: lower the logical AsOfJoin to its exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

object AsOf {

  /** As-of join two frames on a bigint key and timestamp columns.
    * Registers the planner strategy on first use (also injectable via
    * `GraftExtensions`).
    */
  def join(
      leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceMicros: Long = Long.MaxValue): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = bridge.analyzedPlan(leftDf)
    val rp = bridge.analyzedPlan(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    bridge.ofRows(spark, AsOfJoin(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTime), attr(rp, rightTime), toleranceMicros))
  }
}
