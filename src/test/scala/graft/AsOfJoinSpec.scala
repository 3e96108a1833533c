package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinPlan

class AsOfJoinSpec extends SparkSpec {

  private def crafted() = {
    import spark.implicits._
    val trades = Seq(
      (1L, "A", 100L), // before any quote -> null
      (2L, "A", 205L), // matches quote @200
      (3L, "A", 300L), // matches quote @300 (exact tie on time)
      (4L, "B", 500L), // B has no quotes at all -> null
      (5L, null.asInstanceOf[String], 100L) // null key -> null
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, "A", 200L, 1.0),
      (11L, "A", 200L, 2.0), // same instant: tie-break max quote_id wins
      (12L, "A", 300L, 3.0),
      (13L, "A", 400L, 4.0), // after every trade -> never matched
      (14L, "C", 100L, 9.0)  // key absent from left -> ignored
    ).toDF("quote_id", "q_sym", "q_t", "px")
    AsOfJoinPlan.join(trades, quotes,
      leftKey = "sym", rightKey = "q_sym",
      leftTimeCol = "t", rightTimeCol = "q_t",
      rightTieBreakCols = Seq("quote_id"))
  }

  test("as-of merge exec: matches, ties, no-match nulls, null keys") {
    val out = crafted().collect()
      .map(r => r.getAs[Long]("trade_id") ->
        (if (r.isNullAt(r.fieldIndex("quote_id"))) None
         else Some(r.getAs[Long]("quote_id")))).toMap
    assert(out == Map(
      1L -> None,       // too early
      2L -> Some(11L),  // last quote <= 205, max id among the 200s
      3L -> Some(12L),  // inclusive bound: t >= q_t
      4L -> None,       // key with no right rows
      5L -> None))      // null key never matches
  }

  test("as-of plan shape: custom exec, one exchange+sort per side") {
    val plan = crafted().queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the exec prints "AsOfJoin"
    assert(plan.contains("AsOfJoin "), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges:\n$plan")
    assert("\\bSort\\b".r.findAllIn(plan).length >= 2, plan)
  }

  test("custom as-of operator agrees with the window-rewrite on real events") {
    val a = graft.analytics.Events.asofSignup(spark, sf)
    val b = graft.analytics.Events.asofSignupCustom(spark, sf)
    assert(a.count() > 0)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0,
      "custom as-of join diverges from the union-tag window rewrite")
  }

  test("GraftExtensions injects the as-of planner strategy") {
    // prove the .withExtensions path registers the strategy (without
    // tearing down the shared test session to build a fresh one):
    // apply the extensions object and inspect what it contributes
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(e)
    val injected = org.apache.spark.sql.GraftBridge
      .plannerStrategies(e, spark)
    assert(injected.contains(AsOfJoinPlan.AsOfJoinStrategy),
      s"extensions contributed: $injected")
    // and the strategy itself plans the logical node into the exec
    val node = crafted().queryExecution.optimizedPlan
      .collectFirst { case a: AsOfJoinPlan.AsOfJoin => a }.get
    val planned = AsOfJoinPlan.AsOfJoinStrategy(node)
    assert(planned.exists(_.isInstanceOf[AsOfJoinPlan.AsOfJoinExec]))
  }

  test("left-only filters push through the custom join down to the parquet scan") {
    // a predicate written ABOVE the as-of join, referencing only left
    // columns, must cross the custom node (AsOfJoinFilterPushdown) and
    // land in the scan's PushedFilters — and it must filter correctly
    val base = graft.analytics.Events.asofSignupCustom(spark, sf)
    val filtered = base.filter(col("user_id") < 50)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(user_id,50)"),
      s"left filter did not reach the scan:\n$plan")
    val expected = base.collect().count(_.getAs[Long]("user_id") < 50)
    assert(filtered.count() == expected)
    // a right-side predicate must NOT push through (it would change
    // which signup is 'last at or before' for surviving purchases)
    val rightFiltered = base.filter(col("signup_event_id") > 0)
    val optimized = rightFiltered.queryExecution.optimizedPlan
    val joinNode = optimized.collectFirst {
      case a: AsOfJoinPlan.AsOfJoin => a }.get
    assert(joinNode.right.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).exists(_ == "signup_event_id") => f
    }.isEmpty, "right-side predicate was illegally pushed below the as-of join")
  }

  test("randomized differential: merge exec equals brute-force as-of on 2k rows") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812)
    val keys = (0 until 12).map(i => s"K$i")
    // duplicate times on both sides are deliberate: ties exercise the
    // tie-break ordering and the inclusive <= bound
    val left = (1 to 1200).map(i =>
      (i.toLong, keys(rng.nextInt(keys.length)), rng.nextInt(300).toLong))
    val right = (1 to 800).map(i =>
      (i.toLong, keys(rng.nextInt(keys.length)), rng.nextInt(300).toLong))
    val lDf = left.toDF("lid", "k", "t")
    val rDf = right.toDF("rid", "rk", "rt")
    val out = AsOfJoinPlan.join(lDf, rDf, "k", "rk", "t", "rt",
        rightTieBreakCols = Seq("rid"))
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // brute force: for each left row, the right row of the same key
    // with max rt <= t, ties broken by max rid
    val expected = left.map { case (lid, k, t) =>
      val m = right.filter { case (_, rk, rt) => rk == k && rt <= t }
        .sortBy { case (rid, _, rt) => (rt, rid) }.lastOption.map(_._1)
      lid -> m
    }.toMap
    assert(out.size == left.size, "custom as-of dropped/duplicated left rows")
    val diffs = expected.collect {
      case (lid, e) if out(lid) != e => (lid, e, out(lid)) }
    assert(diffs.isEmpty, s"mismatches (first 5): ${diffs.take(5)}")
  }

  test("tolerance: stale matches are rejected in-exec; brute-force differential with a window") {
    import spark.implicits._
    val rng = new scala.util.Random(20260814)
    val keys = (0 until 8).map(i => s"K$i")
    val left = (1 to 800).map(i =>
      (i.toLong, keys(rng.nextInt(keys.length)), rng.nextInt(300).toLong))
    // right side SPARSE (~8 rows per key over a 300-tick span, mean
    // gap ~40 > tol) so the tolerance genuinely rejects stale matches
    val right = (1 to 64).map(i =>
      (i.toLong, keys(rng.nextInt(keys.length)), rng.nextInt(300).toLong))
    val lDf = left.toDF("lid", "k", "t")
    val rDf = right.toDF("rid", "rk", "rt")
    val tol = 25L
    val out = AsOfJoinPlan.join(lDf, rDf, "k", "rk", "t", "rt",
        rightTieBreakCols = Seq("rid"),
        tolerance = Some(java.time.Duration.ofNanos(tol * 1000)))
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // brute force WITH the window: same best-match rule, then reject
    // matches staler than tol (this is merge_asof(tolerance=...)
    // semantics — the match is still the latest <= t, never an older
    // in-window one)
    val expected = left.map { case (lid, k, t) =>
      val m = right.filter { case (_, rk, rt) => rk == k && rt <= t }
        .sortBy { case (rid, _, rt) => (rt, rid) }.lastOption
        .filter { case (_, _, rt) => t - rt <= tol }.map(_._1)
      lid -> m
    }.toMap
    val diffs = expected.collect {
      case (lid, e) if out(lid) != e => (lid, e, out(lid)) }
    assert(diffs.isEmpty, s"mismatches (first 5): ${diffs.take(5)}")
    // the tolerance must actually reject something on this fixture,
    // and keep something
    assert(out.values.exists(_.isEmpty) && out.values.exists(_.nonEmpty))
    val without = AsOfJoinPlan.join(lDf, rDf, "k", "rk", "t", "rt",
        rightTieBreakCols = Seq("rid"))
      .select(col("lid"), col("rid")).collect()
      .count(!_.isNullAt(1))
    assert(out.values.count(_.nonEmpty) < without,
      "tolerance rejected nothing the plain as-of matched — vacuous")
  }

  test("forward direction: randomized differential incl. tolerance, ties take min tie-break") {
    import spark.implicits._
    val rng = new scala.util.Random(20260814)
    val keys = (0 until 10).map(i => s"K$i")
    val left = (1 to 1000).map(i =>
      (i.toLong, keys(rng.nextInt(keys.length)), rng.nextInt(300).toLong))
    // sparse right (~6 rows per key over a 300-tick span, mean forward
    // gap ~25 > the tight tolerance) so the tolerance genuinely binds
    val right = (1 to 64).map(i =>
      (i.toLong, keys(rng.nextInt(keys.length)), rng.nextInt(300).toLong))
    val lDf = left.toDF("lid", "k", "t")
    val rDf = right.toDF("rid", "rk", "rt")
    def run(tol: Option[Long]): Map[Long, Option[Long]] =
      AsOfJoinPlan.join(lDf, rDf, "k", "rk", "t", "rt",
          rightTieBreakCols = Seq("rid"),
          tolerance = tol.map(t => java.time.Duration.ofNanos(t * 1000)),
          direction = AsOfJoinPlan.Forward)
        .select(col("lid"), col("rid"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    def brute(tol: Option[Long]): Map[Long, Option[Long]] =
      left.map { case (lid, k, t) =>
        val m = right
          .filter { case (_, rk, rt) =>
            rk == k && rt >= t && tol.forall(rt - t <= _) }
          .sortBy { case (rid, _, rt) => (rt, rid) }.headOption.map(_._1)
        lid -> m
      }.toMap
    for (tol <- Seq(None, Some(20L))) {
      val out = run(tol)
      assert(out.size == left.size, s"tol=$tol dropped/duplicated left rows")
      val exp = brute(tol)
      val diffs = exp.collect { case (lid, e) if out(lid) != e => (lid, e, out(lid)) }
      assert(diffs.isEmpty, s"tol=$tol mismatches (first 5): ${diffs.take(5)}")
    }
    // non-vacuity: some matched, some null, and tolerance changed something
    val all = run(None); val tight = run(Some(20L))
    assert(all.values.exists(_.isDefined) && all.values.exists(_.isEmpty))
    assert(all != tight, "tolerance never binds - vacuous fixture")
  }

  test("nearest direction: randomized differential, ties prefer backward") {
    import spark.implicits._
    val rng = new scala.util.Random(20260815)
    val keys = (0 until 10).map(i => s"K$i")
    val left = (1 to 900).map(i =>
      (i.toLong, keys(rng.nextInt(keys.length)), rng.nextInt(200).toLong))
    // coarse right times force frequent EXACT |gap| ties in both
    // directions (the tie rule is the thing under test)
    val right = (1 to 120).map(i =>
      (i.toLong, keys(rng.nextInt(keys.length)), (rng.nextInt(20) * 10).toLong))
    val lDf = left.toDF("lid", "k", "t")
    val rDf = right.toDF("rid", "rk", "rt")
    val tol = 35L
    val out = AsOfJoinPlan.join(lDf, rDf, "k", "rk", "t", "rt",
        rightTieBreakCols = Seq("rid"),
        tolerance = Some(java.time.Duration.ofNanos(tol * 1000)),
        direction = AsOfJoinPlan.Nearest)
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = left.map { case (lid, k, t) =>
      val cands = right.filter { case (_, rk, rt) =>
        rk == k && math.abs(rt - t) <= tol }
      val m = if (cands.isEmpty) None else Some(cands.minBy {
        case (rid, _, rt) =>
          // |gap| asc; backward before forward; among equal-time
          // backward rows max rid (the <= sort keeps the LAST), among
          // forward rows min rid (the head is the FIRST)
          (math.abs(rt - t), if (rt <= t) 0L else 1L,
            if (rt <= t) -rid else rid)
      }._1)
      lid -> m
    }.toMap
    assert(out.size == left.size)
    val diffs = expected.collect {
      case (lid, e) if out(lid) != e => (lid, e, out(lid)) }
    assert(diffs.isEmpty, s"mismatches (first 5): ${diffs.take(5)}")
    // non-vacuity: matches on both sides of the left time, and nulls
    val gaps = left.flatMap { case (lid, _, t) =>
      out(lid).map(rid => right.find(_._1 == rid).get._3 - t) }
    assert(gaps.exists(_ < 0) && gaps.exists(_ > 0), "one-sided fixture")
    assert(out.values.exists(_.isEmpty), "tolerance never produced a null")
  }

  test("mismatched key/time types are rejected at construction, not silently merged") {
    import spark.implicits._
    val l = Seq((1L, "A", 100L)).toDF("id", "k", "t")
    val rIntTime = Seq((2, "A", 100)).toDF("rid", "rk", "rt") // rt: int
    intercept[IllegalArgumentException] {
      AsOfJoinPlan.join(l, rIntTime, "k", "rk", "t", "rt")
    }
  }
}
