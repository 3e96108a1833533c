package graft

import org.apache.spark.sql.functions._
import graft.analytics.Events

class EventsSpec extends SparkSpec {

  test("every events query returns rows and has an oracle") {
    assert(Events.queries.keySet == Events.oracles.keySet)
    Events.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("sessionization: no intra-session gap exceeds the threshold, session count is sane") {
    val sessions = Events.sessionize(spark, sf)
    // durations are non-negative and every session has >= 1 event
    val bad = sessions.filter(col("duration_s") < 0 || col("n_events") < 1).count()
    assert(bad == 0)
    // total events across sessions == total events in the table
    val total = sessions.agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(total == graft.ingest.Sources.events(spark, sf).count())
  }

  test("sessionization plan shuffles once on user_id (window + groupBy share the exchange)") {
    val p = plan(Events.sessionize(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$p")
  }

  test("event props extraction parses every row's k") {
    val withK = graft.ingest.Sources.events(spark, sf)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
    assert(withK.filter(col("k").isNull).count() == 0)
  }

  test("funnel user counts sum to the number of distinct users") {
    val users = graft.ingest.Sources.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val funnelTotal = Events.eventFunnel(spark, sf)
      .agg(sum(col("n_users"))).collect().head.getLong(0)
    assert(funnelTotal == users)
  }

  test("sessionization invariants on the real table: intra-gaps <= threshold, inter-gaps > threshold") {
    import org.apache.spark.sql.expressions.Window
    val gap = Events.SessionGapSeconds
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val marked = graft.ingest.Sources.events(spark, sf)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      .withColumn("prev_s", lag(col("epoch_s"), 1).over(w))
      .withColumn("gap_s", col("epoch_s") - col("prev_s"))
    val sessions = Events.sessionize(spark, sf)
    // join each event's gap to its session via the start/end interval
    val joined = marked.filter(col("prev_s").isNotNull)
      .join(sessions,
        marked("user_id") === sessions("user_id") &&
          col("epoch_s").between(col("session_start_s"), col("session_end_s")))
    // an event inside a session whose predecessor gap exceeded the
    // threshold must be that session's FIRST event (start boundary)
    val violations = joined
      .filter(col("gap_s") > gap && col("epoch_s") =!= col("session_start_s"))
      .count()
    assert(violations == 0,
      "found an over-gap event strictly inside a session")
    // exact converse (both directions at once): per user, the number
    // of sessions must equal 1 + number of over-threshold gaps — an
    // over-eager splitter OR an under-splitter breaks this equality
    val expected = marked.groupBy(col("user_id"))
      .agg(sum(when(col("gap_s") > gap, 1).otherwise(0)).as("n_breaks"))
    val actual = sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"))
    val mismatched = expected.join(actual, "user_id")
      .filter(col("n_sessions") =!= col("n_breaks") + 1)
      .count()
    assert(mismatched == 0, "session count != 1 + over-gap count for some user")
  }

  test("transition matrix rows normalize and bigram mass equals events minus users") {
    val rows = Events.eventTransitions(spark, sf).collect()
    val ev = graft.ingest.Sources.events(spark, sf)
    val expectedBigrams = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expectedBigrams,
      "each user contributes exactly (events - 1) transitions")
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val pSum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"row $src sums to $pSum")
    }
  }

  test("SCD2 intervals tile each user's timeline with one open row") {
    val rows = Events.scd2Status(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.toString).getOrElse("~")))
      // exactly one open (current) row per user, and it is the last
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1,
        s"user $u must have exactly one open SCD row")
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")),
        s"user $u: last interval must be open")
      // closed intervals chain: valid_to == next row's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"),
            s"user $u: intervals do not tile")
          // consecutive duplicates collapsed: status must change
          assert(a.getAs[String]("status") != b.getAs[String]("status") ||
            a.getAs[Long]("valid_from") != b.getAs[Long]("valid_from"),
            s"user $u: un-collapsed duplicate row")
        case _ =>
      }
      // statuses alternate (no adjacent equal statuses survive collapse)
      sorted.map(_.getAs[String]("status")).sliding(2).foreach {
        case Array(x, y) => assert(x != y, s"user $u: adjacent equal status")
        case _ =>
      }
    }
    assert(rows.nonEmpty)
  }

  test("ordered funnel is monotone and never exceeds the unordered funnel") {
    val r = Events.orderedFunnel(spark, sf).head()
    val (nv, nc, np) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_purchase"))
    assert(nv >= nc && nc >= np, s"funnel not monotone: $nv >= $nc >= $np")
    assert(nv > 0)
    // unordered upper bound: users with both view and click flags
    val unordered = Events.eventFunnel(spark, sf).collect()
    val unorderedVC = unordered.filter(x =>
      x.getAs[Int]("has_view") == 1 && x.getAs[Int]("has_click") == 1)
      .map(_.getAs[Long]("n_users")).sum
    assert(nc <= unorderedVC,
      s"ordered click-converts $nc exceed unordered view+click users $unorderedVC")
    assert(math.abs(r.getAs[Double]("view_to_click") -
      BigDecimal(nc.toDouble / nv).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("SCD2 lookup via the custom as-of exec equals a window-join rewrite") {
    val custom = Events.scd2Lookup(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val dim = graft.ingest.Sources.events(spark, sf)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id").as("d_user"), col("event_id").as("d_eid"),
        col("event_type").as("status"), unix_timestamp(col("ts")).as("d_from"))
    val p = graft.ingest.Sources.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        (unix_timestamp(col("ts")) - 1).as("probe_t"))
    val byPurchase = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("d_from").desc, col("d_eid").desc)
    val matched = p.join(broadcast(dim),
        col("user_id") === col("d_user") && col("d_from") <= col("probe_t"))
      .withColumn("rn", row_number().over(byPurchase))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("status"))
    val rewrite = p.join(matched, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("status"), lit("none")).as("prev_status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(custom == rewrite,
      s"custom as-of diverges from window rewrite on ${
        custom.count { case (k, v) => rewrite.get(k) != Some(v) }} purchases")
    assert(custom.values.exists(_ != "none") && custom.values.exists(_ == "none"),
      "fixture should exercise both matched and first-event purchases")
  }

  test("attribution equals a driver-side scan of each user's touch history") {
    val out = graft.analytics.Events.attribution(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[String]("first_touch_type")),
          Option(r.getAs[java.lang.Long]("first_touch_us")).map(_.toLong),
          Option(r.getAs[String]("last_touch_type")),
          Option(r.getAs[java.lang.Long]("last_touch_us")).map(_.toLong),
          r.getAs[Long]("n_touches"))).toMap
    val ev = graft.ingest.Sources.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    val expect = ev.filter(_._4 == "purchase").map { case (u, eid, us, _) =>
      val touches = byUser(u)
        .filter(t => (t._4 == "click" || t._4 == "view") &&
          t._3 < us && t._3 >= us - graft.analytics.Events.AttribWindowUs)
        // the packed-BIGINT tie rule: at equal us, click (code 1)
        // precedes view (code 2)
        .map(t => t._3 * 4 + (if (t._4 == "click") 1 else 2)).sorted
      val ft = touches.headOption
      val lt = touches.lastOption
      def tpe(p: Long) = if (p % 4 == 1) "click" else "view"
      eid -> (ft.map(tpe), ft.map(_ / 4), lt.map(tpe), lt.map(_ / 4),
        touches.length.toLong)
    }.toMap
    assert(out.keySet == expect.keySet)
    expect.foreach { case (eid, e) =>
      assert(out(eid) == e, s"purchase $eid: got ${out(eid)}, scan says $e")
    }
    assert(out.values.exists(_._5 > 0) && out.values.exists(_._5 == 0),
      "fixture should exercise both touched and untouched conversions")
  }

  test("follows matrix equals brute-force eventually-follows over raw events") {
    val ev = graft.ingest.Sources.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val types = ev.map(_._2).distinct.sorted
    val expect = (for {
      a <- types; b <- types if a != b
      both = byUser.values.filter(rs =>
        rs.exists(_._2 == a) && rs.exists(_._2 == b))
      if both.nonEmpty
    } yield {
      val nf = both.count { rs =>
        val ta = rs.filter(_._2 == a).map(_._3).min
        val tb = rs.filter(_._2 == b).map(_._3).max
        ta < tb
      }
      (a, b) -> (both.size.toLong, nf.toLong)
    }).toMap
    val got = graft.analytics.Events.followsMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_users_both"), r.getAs[Long]("n_follows"))).toMap
    assert(got == expect, s"matrix mismatch: ${(got.toSet diff expect.toSet)
      .take(3)} vs ${(expect.toSet diff got.toSet).take(3)}")
    // structural invariants: co-occurrence is symmetric, follows is
    // bounded by it (dense per-user histories make n_follows itself
    // near-symmetric here - that's data, not a bug)
    got.foreach { case ((a, b), (both, nf)) =>
      assert(got((b, a))._1 == both, s"($a,$b) co-occurrence asymmetric")
      assert(nf <= both && nf >= 0, s"($a,$b) follows out of range")
    }
  }

  test("conversion hazard: risk sets telescope, events bounded, censoring replayed") {
    val out = graft.analytics.Events.conversionHazard(spark, sf).collect()
    val days = out.map(_.getAs[Long]("day"))
    assert(days.sameElements(days.sorted) && days.distinct.length == days.length)
    // n_risk telescopes: risk(d) - risk(d+1) = users whose event or
    // censor day is exactly d (>= n_conv at d)
    out.sliding(2).foreach {
      case Array(a, b) =>
        val leaving = a.getAs[Long]("n_risk") - b.getAs[Long]("n_risk")
        assert(leaving >= a.getAs[Long]("n_conv") && leaving >= 0,
          s"day ${a.getAs[Long]("day")}: risk set not telescoping")
      case _ => ()
    }
    out.foreach { r =>
      val (nr, nc, h) = (r.getAs[Long]("n_risk"), r.getAs[Long]("n_conv"),
        r.getAs[Long]("hazard_permille"))
      assert(nc <= nr, "more events than users at risk")
      assert(h == 1000 * nc / nr, "hazard is not the exact permille ratio")
    }
    // day-0 risk set = every user with a view (everyone enters at t0)
    val nViewers = graft.ingest.Sources.events(spark, sf)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(out.head.getAs[Long]("day") == 0L &&
      out.head.getAs[Long]("n_risk") == nViewers,
      "day-0 risk set must be all observed viewers")
    // conversions within horizon = converted users (exactly once each)
    val nConv = out.map(_.getAs[Long]("n_conv")).sum
    assert(nConv > 0 && nConv <= nViewers)
  }

  test("Markov stationary: replays the fixed-point power iteration from the transition counts") {
    import graft.analytics.Events
    val out = Events.markovStationary(spark, sf).collect()
    assert(out.nonEmpty)
    // independently recount transitions and replay the iteration
    val counts = Events.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
    val types = counts.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val idx = types.zipWithIndex.toMap
    val k = types.length
    val outCnt = Array.fill(k)(0L)
    counts.foreach { case (a, _, n) => outCnt(idx(a)) += n }
    val ppm = Array.ofDim[Long](k, k)
    counts.foreach { case (a, b, n) =>
      ppm(idx(a))(idx(b)) = Events.MarkovScale * n / outCnt(idx(a))
    }
    var v = Array.fill(k)(Events.MarkovScale / k)
    (1 to Events.MarkovIters).foreach { _ =>
      val raw = Array.tabulate(k)(j =>
        (0 until k).map(i => v(i) * ppm(i)(j)).sum)
      val tot = raw.sum
      if (tot != 0L) v = raw.map(r => Events.MarkovScale * r / tot)
    }
    assert(out.map(_.getString(0)).toSeq == types.toSeq,
      "type alphabet or ordering differs")
    out.foreach { r =>
      val i = idx(r.getString(0))
      assert(r.getAs[Long]("out_transitions") == outCnt(i))
      assert(r.getAs[Long]("stationary_ppm") == v(i),
        s"${types(i)}: stationary does not replay")
    }
    // a (renormalized) distribution: mass within floor loss of the scale
    val mass = out.map(_.getAs[Long]("stationary_ppm")).sum
    assert(mass <= Events.MarkovScale && mass >= Events.MarkovScale - k,
      s"stationary mass $mass outside [scale-k, scale]")
    assert(out.forall(_.getAs[Long]("stationary_ppm") >= 0L))
  }

  test("cold-start coverage: accounting replays driver-side; ppm bounds hold") {
    import graft.analytics.Events
    val cutoff = java.sql.Timestamp.valueOf(Events.ColdStartCutoff + " 00:00:00")
    val ev = graft.ingest.Sources.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("ts")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[java.sql.Timestamp](2)))
    val hist = ev.filter(_._3.before(cutoff)).map(_._2).toSet
    val eval_ = ev.filter(!_._3.before(cutoff))
    val out = Events.coldStartCoverage(spark, sf).collect()
    assert(out.nonEmpty, "no eval-period events — cutoff outside the corpus span")
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val mine = eval_.filter(_._1 == et)
      val users = mine.map(_._2).distinct
      val seen = users.count(hist)
      val covered = mine.count(t => hist(t._2))
      assert(r.getAs[Long]("n_events") == mine.length)
      assert(r.getAs[Long]("n_users") == users.length)
      assert(r.getAs[Long]("n_seen_users") == seen)
      assert(r.getAs[Long]("seen_users_ppm") ==
        1000000L * seen / users.length)
      assert(r.getAs[Long]("covered_events_ppm") ==
        1000000L * covered / mine.length)
      assert(r.getAs[Long]("seen_users_ppm") <= 1000000L)
    }
  }

  test("Kaplan-Meier: risk set telescopes, survival is a monotone ppm curve") {
    val out = graft.analytics.Events.kaplanMeier(spark, sf).collect()
    assert(out.nonEmpty)
    // survival starts <= 1e6 and never increases
    val survs = out.sortBy(_.getAs[Long]("day")).map(_.getAs[Long]("surv_ppm"))
    assert(survs.head <= 1000000L && survs.forall(_ >= 0))
    survs.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"survival increased: $a -> $b")
      case _ =>
    }
    // risk-set accounting: n_risk(t) >= d(t), and strictly decreasing
    // across emitted event days (events + censored leave the set)
    val rows = out.sortBy(_.getAs[Long]("day"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_risk") >= r.getAs[Long]("d_events"))
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_risk") <
          a.getAs[Long]("n_risk"), "risk set did not shrink")
      case _ =>
    }
    // total users who ever signed up bounds the first risk set
    val nSignup = graft.ingest.Sources.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_risk") <= nSignup)
  }

  test("diff-in-diff: cells recompute from raw events; identity holds") {
    import org.apache.spark.sql.functions._
    val row = graft.analytics.Events.diffInDiff(spark, sf).head()
    val raw = graft.ingest.Sources.events(spark, sf)
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val bound = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    def cell(treat: Boolean, post: Boolean) = {
      val xs = raw.filter { case (u, ts, _) =>
        (u % 2 == 1) == treat && ts.after(bound) == post &&
          (post || ts.before(bound)) }
      (xs.length.toLong, xs.map(_._3).sum)
    }
    val (nCpre, sCpre) = cell(treat = false, post = false)
    val (nTpost, sTpost) = cell(treat = true, post = true)
    assert(row.getAs[Long]("control_pre_n") == nCpre)
    assert(row.getAs[Long]("treat_post_n") == nTpost)
    assert(row.getAs[Long]("control_pre_micro") == sCpre * 10000L / nCpre)
    assert(row.getAs[Long]("treat_post_micro") == sTpost * 10000L / nTpost)
    // the emitted estimate is exactly the four-mean identity
    val did = (row.getAs[Long]("treat_post_micro")
      - row.getAs[Long]("treat_pre_micro")) -
      (row.getAs[Long]("control_post_micro")
        - row.getAs[Long]("control_pre_micro"))
    assert(row.getAs[Long]("did_micro") == did)
    // every event is in exactly one cell
    assert(row.getAs[Long]("control_pre_n") + row.getAs[Long]("control_post_n")
      + row.getAs[Long]("treat_pre_n") + row.getAs[Long]("treat_post_n")
      == raw.length.toLong)
  }

  test("top paths: counts recompute from per-user ordered event streams") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Events.topPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= graft.analytics.Events.PathTopK)
    val streams = graft.ingest.Sources.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(x => (x._2.getTime, x._2.getNanos, x._3))
        .map(_._4).toSeq).toMap
    val counts = streams.values.flatMap(ets =>
      if (ets.length >= 3) ets.sliding(3).map(_.mkString(">")) else Nil)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(counts(r.getAs[String]("path")) == r.getAs[Long]("n"),
        s"count mismatch for ${r.getAs[String]("path")}")
    }
    // the emitted list IS the global top-k under (n desc, path asc)
    val expect = counts.toSeq.sortBy { case (p2, n) => (-n, p2) }
      .take(rows.length).map(_._1)
    assert(rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[String]("path")).toSeq
      == expect)
  }
}
