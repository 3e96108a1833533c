package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, Ascending, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A whole-operator as-of join, implemented the Spark-native way for
  * an operator Catalyst lacks (SURVEY.md §2.5 J7; builder-prompt
  * preference (c)): a custom logical node, a planner strategy, and a
  * physical merge exec, injectable via SparkSessionExtensions.
  *
  * Semantics (matching DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t`): every left row is emitted once, joined to the LAST
  * right row (in (key, time, tieBreak) order) of the same key whose
  * time is <= the left row's time, or to nulls when no such row
  * exists.
  *
  * Scale design: the exec demands ClusteredDistribution on the key
  * from both children and a (key, time) sort — EnsureRequirements
  * inserts the hash exchanges and sorts exactly as it does for a
  * sort-merge join, so the operator shuffles each side ONCE and then
  * streams both sorted partitions through a two-pointer merge with
  * O(1) state (one buffered right row): no per-key buffering of the
  * full right group (the union-tag window alternative in
  * [[graft.analytics.Events.asofSignup]] carries every signup row
  * through a window state instead). AQE still plans the exchanges; a
  * 1000-executor run partitions by key like any equi-join.
  */
object AsOfJoinPlan {

  /** Match direction — pandas merge_asof's vocabulary. BACKWARD joins
    * each left row to the LAST right row at or before it (ties: max
    * tie-break); FORWARD to the FIRST right row at or after it (ties:
    * min tie-break). Both stream the same (key, time)-sorted merge;
    * forward needs NO buffered candidate at all — the match is the
    * right head itself once everything strictly behind is consumed
    * (consumption is safe: left times ascend within a key, so a
    * passed-over right row can never match a later left row).
    */
  sealed trait AsOfDirection
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection

  /** NEAREST: smaller absolute gap wins; an exact tie prefers the
    * backward match (pandas' rule). Falls out of the backward
    * machinery for free: after the backward advance, `best` is the
    * last at-or-before row and the right head is exactly the first
    * strictly-after row — compare the two gaps.
    */
  case object Nearest extends AsOfDirection

  /** Logical node. Children are already-analyzed plans and the key /
    * time / tie-break expressions are resolved attributes, so the node
    * itself is resolved on construction.
    */
  final case class AsOfJoin(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      rightTieBreak: Seq[Expression],
      toleranceMicros: Option[Long] = None,
      direction: AsOfDirection = Backward) extends BinaryNode {

    // The node is resolved on construction, so the analyzer never
    // type-checks it — validate here: comparing a right row with an
    // ordering built from the LEFT types would silently misread bytes.
    require(leftKeys.length == rightKeys.length &&
      leftKeys.zip(rightKeys).forall { case (l, r) =>
        GraftBridge.sameType(l.dataType, r.dataType) },
      s"as-of key types differ: ${leftKeys.map(_.dataType)} vs " +
        s"${rightKeys.map(_.dataType)}")
    require(GraftBridge.sameType(leftTime.dataType, rightTime.dataType),
      s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
    // tolerance compares raw internal longs, so it is only defined for
    // micros-backed timestamps (and raw longs)
    require((toleranceMicros.isEmpty && direction != Nearest) ||
      leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
      leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.LongType],
      "as-of tolerance / nearest direction need a timestamp/long time " +
        s"column (gap arithmetic on raw longs), got ${leftTime.dataType}")

    // left outer: right side becomes nullable on no-match
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
      copy(left = newLeft, right = newRight)
  }

  /** Predicate pushdown through the custom node — the optimizer-rule
    * rung of the extension ladder. Stock PushDownPredicates stops at
    * any LogicalPlan it doesn't know, so a filter written above the
    * as-of join would otherwise execute join-side and the parquet scan
    * would lose its PushedFilters. As-of semantics are per-left-row
    * (every left row joins independently of other LEFT rows), so any
    * deterministic predicate over left columns alone commutes with the
    * join; right-side predicates do NOT (dropping a right row changes
    * which row is "last at or before" for surviving left rows).
    */
  object AsOfJoinFilterPushdown extends Rule[LogicalPlan]
      with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, j: AsOfJoin) =>
        val (pushable, kept) = splitConjunctivePredicates(cond)
          .partition(p => p.deterministic &&
            p.references.subsetOf(j.left.outputSet))
        if (pushable.isEmpty) f
        else {
          val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
          kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Plans the logical AsOfJoin into its exec. Injected either via
    * `SparkSessionExtensions.injectPlannerStrategy` or
    * `spark.experimental.extraStrategies` (see [[join]]).
    */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoin(l, r, lk, rk, lt, rt, tb, tol, dir) =>
        AsOfJoinExec(lk, rk, lt, rt, tb, tol, dir,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Physical streamed merge as-of join.
    *
    * Both inputs arrive hash-clustered on the key and sorted by
    * (key, time[, tieBreak]) — declared below, enforced by
    * EnsureRequirements. Per partition a single forward pass advances
    * the right iterator while its (key, time) is <= the current left
    * row's, remembering only the most recent in-range right row; left
    * rows with a null key or null time never match (SQL join-key
    * semantics).
    */
  final case class AsOfJoinExec(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      rightTieBreak: Seq[Expression],
      toleranceMicros: Option[Long],
      direction: AsOfDirection,
      left: SparkPlan,
      right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

    // rows stream out exactly as the (shuffled) left child delivered
    // them — advertising that clustering lets a downstream groupBy /
    // join on the key reuse the exchange instead of shuffling again
    override def outputPartitioning =
      left.outputPartitioning

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    protected override def doExecute(): RDD[InternalRow] = {
      val keyTypes = leftKeys.map(_.dataType)
      val timeType = leftTime.dataType
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
        val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
        val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
        val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
        val nullRight = new GenericInternalRow(right.output.length)
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(output, output)
        val rBuf = rIter.buffered

        new Iterator[InternalRow] {
          // the last right row seen with key == current left key and
          // time <= current left time (copied: UnsafeRows are reused)
          private var best: InternalRow = _
          private var bestKey: InternalRow = _
          private var bestTimeMicros: Long = Long.MinValue

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lTime = lTimeProj(lRow)
            if (lKey.anyNull || lTime.isNullAt(0)) {
              // null key / null time never matches anything
              outProj(joined(lRow, nullRight))
            } else if (direction == Forward) {
              // consume everything strictly behind this left row:
              // smaller keys, null-key/null-time rows, and same-key
              // rows with time < left time (left times ascend within
              // the key, so none of these can match a later left row)
              var advancing = true
              while (advancing && rBuf.hasNext) {
                val rKey = rKeyProj(rBuf.head)
                val kCmp = if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
                if (kCmp < 0) { rBuf.next() }
                else if (kCmp > 0) { advancing = false }
                else {
                  val rTime = rTimeProj(rBuf.head)
                  if (rTime.isNullAt(0)) { rBuf.next() }
                  else if (timeOrd.compare(rTime, lTime) < 0) { rBuf.next() }
                  else advancing = false
                }
              }
              // the head (if same-keyed) IS the first at-or-after row —
              // the (time, tieBreak) ascending sort makes ties take the
              // smallest tie-break, pandas' first-occurrence rule
              var m: InternalRow = nullRight
              if (rBuf.hasNext) {
                val rKey = rKeyProj(rBuf.head)
                if (!rKey.anyNull && keyOrd.compare(rKey, lKey) == 0) {
                  val rTime = rTimeProj(rBuf.head)
                  if (toleranceMicros.forall(t =>
                      rTime.getLong(0) - lTime.getLong(0) <= t))
                    m = rBuf.head
                }
              }
              outProj(joined(lRow, m))
            } else {
              // drop a buffered match from an earlier, different key
              if (bestKey != null && keyOrd.compare(bestKey, lKey) != 0) {
                best = null; bestKey = null
              }
              // advance right up to (and including) the left position
              var advancing = true
              while (advancing && rBuf.hasNext) {
                val rKey = rKeyProj(rBuf.head)
                val kCmp = if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
                if (kCmp < 0) { rBuf.next() } // behind (or null key): skip
                else if (kCmp > 0) { advancing = false } // ahead: stop
                else {
                  val rTime = rTimeProj(rBuf.head)
                  if (!rTime.isNullAt(0) &&
                      timeOrd.compare(rTime, lTime) <= 0) {
                    bestTimeMicros = rTime.getLong(0)
                    best = rBuf.next().copy()
                    bestKey = rKeyProj(best).copy()
                  } else if (rTime.isNullAt(0)) {
                    rBuf.next() // null time never matches
                  } else {
                    advancing = false // right time ahead of left: stop
                  }
                }
              }
              // the remembered match must also satisfy the staleness
              // tolerance for THIS left row (it can pass for an early
              // left row and fail for a later one — staleness grows
              // until a fresher right row replaces the match)
              val bwdOk = best != null && toleranceMicros.forall(t =>
                lTime.getLong(0) - bestTimeMicros <= t)
              if (direction == Nearest) {
                // forward candidate: after the backward advance the
                // right head (if same-keyed) is the first strictly-
                // after row; equal-time rows were consumed into `best`
                var fwd: InternalRow = null
                var fwdGap = Long.MaxValue
                if (rBuf.hasNext) {
                  val rKey = rKeyProj(rBuf.head)
                  if (!rKey.anyNull && keyOrd.compare(rKey, lKey) == 0) {
                    val rTime = rTimeProj(rBuf.head)
                    if (!rTime.isNullAt(0)) {
                      val g = rTime.getLong(0) - lTime.getLong(0)
                      if (toleranceMicros.forall(g <= _)) {
                        fwd = rBuf.head; fwdGap = g
                      }
                    }
                  }
                }
                val bwdGap =
                  if (bwdOk) lTime.getLong(0) - bestTimeMicros
                  else Long.MaxValue
                // tie prefers backward (<=)
                val m = if (bwdOk && bwdGap <= fwdGap) best
                  else if (fwd != null) fwd
                  else nullRight
                outProj(joined(lRow, m))
              } else {
                outProj(joined(lRow, if (bwdOk) best else nullRight))
              }
            }
          }
        }
      }
    }
  }

  /** DataFrame-level API. Columns are resolved by NAME against each
    * side's analyzed output (as-of keys are always concrete columns).
    * Registers the strategy on the session once (idempotent) so plain
    * sessions work without `.withExtensions`.
    */
  def join(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTimeCol: String, rightTimeCol: String,
           rightTieBreakCols: Seq[String] = Nil,
           tolerance: Option[java.time.Duration] = None,
           direction: AsOfDirection = Backward): DataFrame = {
    val spark = leftDf.sparkSession
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)
    GraftBridge.addOptimization(spark, AsOfJoinFilterPushdown)
    val l = leftDf.queryExecution.analyzed
    val r = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    GraftBridge.ofRows(spark,
      AsOfJoin(l, r,
        Seq(attr(l, leftKey)), Seq(attr(r, rightKey)),
        attr(l, leftTimeCol), attr(r, rightTimeCol),
        rightTieBreakCols.map(attr(r, _)),
        tolerance.map(d => d.toNanos / 1000L),
        direction))
  }
}
