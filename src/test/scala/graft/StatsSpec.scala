package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.analytics.{Stats, TimeSeries}
import graft.operators.Scale

/** Stats / reshaping / sampling / time-series operators. */
class StatsSpec extends SparkSpec {

  test("price histogram bins partition the domain: counts sum to table size") {
    val h = Stats.priceHistogram(spark, sf).collect()
    val total = h.map(_.getAs[Long]("n_orders")).sum
    val nOrders = graft.ingest.Sources.orders(spark, sf).count()
    assert(total == nOrders, s"histogram lost rows: $total != $nOrders")
    val bins = h.map(_.getAs[Int]("bin"))
    assert(bins.forall(b => b >= 0 && b <= 19))
    assert(bins.distinct.length == bins.length, "duplicate bin rows")
  }

  test("unpivot emits one row per (group, metric) with matching values") {
    val wide = graft.ingest.Sources.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("double").as("n_orders"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val long = Stats.priorityMetricsUnpivot(spark, sf)
      .filter(col("metric") === "n_orders").collect()
    assert(long.length == wide.size)
    long.foreach { r =>
      assert(r.getAs[Double]("val") == wide(r.getString(0)))
    }
  }

  test("hash split is deterministic, partition-invariant and ~80/10/10") {
    val base = Scale.orderSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_orders")).toMap
    // identical result from a differently-partitioned input: the split
    // is a pure function of the key, not of physical layout
    val repart = graft.ingest.Sources.orders(spark, sf).repartition(13)
      .withColumn("split", Scale.hashSplit(col("o_orderkey")))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base == repart, s"split not layout-invariant: $base vs $repart")
    val n = base.values.sum.toDouble
    assert(math.abs(base("train") / n - 0.8) < 0.05, s"train share off: $base")
    assert(math.abs(base("valid") / n - 0.1) < 0.04, s"valid share off: $base")
    assert(math.abs(base("test") / n - 0.1) < 0.04, s"test share off: $base")
  }

  test("LOCF gap fill: dense grid, carried values, correct gap flags") {
    import scala.jdk.CollectionConverters._
    val out = TimeSeries.gapFillLocf(spark, sf)
    val rows = out.collect()
    // dense: per user, hr values are exactly [min..max] with no holes
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      val hrs = rs.map(_.getAs[Long]("hr")).sorted
      assert(hrs.last - hrs.head + 1 == hrs.length, s"grid has holes for $u")
    }
    // every gap row carries the most recent non-gap value before it
    byUser.head match { case (_, rs) =>
      val sortedRs = rs.sortBy(_.getAs[Long]("hr"))
      var lastObserved: Option[Double] = None
      sortedRs.foreach { r =>
        val v = if (r.isNullAt(2)) None else Some(r.getDouble(2))
        if (!r.getAs[Boolean]("is_gap")) lastObserved = v
        else assert(v == lastObserved, "gap row does not carry last observation")
      }
    }
    // no gap before the first observation (grid starts at an observation)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val first = rs.minBy(_.getAs[Long]("hr"))
      assert(!first.getAs[Boolean]("is_gap"), s"grid for $u starts with a gap")
    }
  }

  test("fuzzy match distance is symmetric levenshtein and respects the threshold") {
    // pin the function against a hand-checked pair through production code
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("kitten", "sitting")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType))))
    val d = df.select(levenshtein(col("a"), col("b"))).head().getInt(0)
    assert(d == 3)
    val agg = Stats.partFuzzyMatch(spark, sf, maxDist = 4).collect()
    agg.foreach { r =>
      assert(r.getAs[Long]("min_dist") >= 0 && r.getAs[Long]("min_dist") <= 4)
      assert(r.getAs[Double]("avg_dist") <= 4.0)
    }
  }

  test("crosstab marginals reconcile and chi2 contributions are non-negative") {
    val rows = Stats.segmentRegionCrosstab(spark, sf).collect()
    val nCustomers = graft.ingest.Sources.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("obs")).sum == nCustomers)
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2_contrib") >= 0.0)
      assert(r.getAs[Double]("expected") > 0.0)
    }
    // expected frequencies reconstruct the grand total per row-group
    val bySeg = rows.groupBy(_.getString(0))
    bySeg.foreach { case (seg, rs) =>
      val expSum = rs.map(_.getAs[Double]("expected")).sum
      val obsSum = rs.map(_.getAs[Long]("obs")).sum.toDouble
      assert(math.abs(expSum - obsSum) < 0.01,
        s"row $seg: expected-sum $expSum != marginal $obsSum")
    }
  }

  test("value heatmap tiles all events into valid (hour, bin) cells") {
    val rows = Stats.valueHeatmap(spark, sf).collect()
    val total = graft.ingest.Sources.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Int]("hod") >= 0 && r.getAs[Int]("hod") <= 23)
      assert(r.getAs[Int]("bin") >= 0 && r.getAs[Int]("bin") <= 9)
      assert(r.getAs[Long]("n") > 0)
    }
    assert(rows.map(r => (r.getAs[Int]("hod"), r.getAs[Int]("bin"))).distinct.length
      == rows.length, "duplicate heatmap cells")
  }

  test("deciles are equi-depth, ordered, and mass-conserving") {
    val rows = Stats.priceDeciles(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val total = graft.ingest.Sources.orders(spark, sf).count()
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sum == total)
    assert(ns.max - ns.min <= 1, s"equi-depth violated: ${ns.toSeq}")
    // deciles partition the value axis: hi(d) <= lo(d+1)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9,
          s"decile overlap at ${a.getAs[Int]("decile")}")
      case _ =>
    }
  }

  test("shipping lag buckets cover every lineitem with sane bounds") {
    val rows = Stats.shippingLag(spark, sf).collect()
    val total = graft.ingest.Sources.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val b = r.getAs[Int]("lag_bucket")
      assert(b >= -1 && b <= 4)
      assert(r.getAs[Long]("min_lag") <= r.getAs[Long]("max_lag"))
      if (b == -1) assert(r.getAs[Long]("max_lag") < 0,
        "anomaly bucket must hold only ship-before-order lines")
      else if (b < 4) {
        assert(r.getAs[Long]("min_lag") >= 30L * b &&
          r.getAs[Long]("max_lag") < 30L * (b + 1),
          s"bucket $b bounds: ${r.getAs[Long]("min_lag")}..${r.getAs[Long]("max_lag")}")
      } else assert(r.getAs[Long]("min_lag") >= 120L)
    }
  }

  test("snapshot drift: dense bins, conserved counts, chi2 recompute") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Stats.snapshotDrift(spark, sf).collect()
    // dense spine: EVERY bin present exactly once, in order
    assert(rows.map(_.getLong(0)).toSeq ==
      (0L until graft.analytics.Stats.DriftBins).toSeq)
    val docs = graft.ingest.Sources.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect()
    val nBatch = docs.count(_.getLong(0) % 5 == 4)
    val nHist = docs.length - nBatch
    assert(rows.map(_.getAs[Long]("n_hist")).sum == nHist)
    assert(rows.map(_.getAs[Long]("n_batch")).sum == nBatch)
    // chi2 recompute from the emitted integer counts
    val k = graft.analytics.Stats.DriftBins
    rows.foreach { r =>
      val (h, b) = (r.getAs[Long]("n_hist"), r.getAs[Long]("n_batch"))
      val exp = (h + 1).toDouble * (nBatch + k) / (nHist + k)
      assert(math.abs(r.getAs[Double]("expected_batch") - exp) < 1e-5)
      val chi2 = (b + 1 - exp) * (b + 1 - exp) / exp
      assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-5,
        s"bin ${r.getLong(0)}: chi2 off")
      assert(r.getAs[Double]("chi2") >= 0.0)
    }
    // the split is ~80/20 of the same corpus: no bin should scream
    val worst = rows.map(_.getAs[Double]("chi2")).max
    assert(worst < 50.0, s"same-distribution split drifted: chi2=$worst")
  }

  test("length resample: bounded rates, kept subset, deterministic reruns") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Stats.lengthResample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, rate, kept) = (r.getAs[Long]("n_batch"),
        r.getAs[Double]("keep_rate"), r.getAs[Long]("n_kept"))
      assert(rate > 0.0 && rate <= 1.0, s"bin ${r.getLong(0)}: rate $rate")
      assert(kept >= 0 && kept <= nb, s"bin ${r.getLong(0)}: kept > batch")
      // a full-keep bin keeps everything (rate 1.0 ⇒ u < 1.0 always)
      if (rate == 1.0) assert(kept == nb, s"bin ${r.getLong(0)}: rate-1 bin dropped docs")
    }
    // batch docs are conserved across bins
    val nBatch = graft.ingest.Sources.documents(spark, sf)
      .filter(col("doc_id") % 5 === 4).count()
    assert(rows.map(_.getAs[Long]("n_batch")).sum == nBatch)
    // determinism: a rerun keeps the IDENTICAL documents
    val again = graft.analytics.Stats.lengthResample(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getAs[Long]("n_kept"))).toSeq ==
      again.map(r => (r.getLong(0), r.getAs[Long]("n_kept"))).toSeq)
  }

  test("Benford digits: exact leading-digit recount; expectation column is Benford") {
    val rows = Stats.benfordDigits(spark, sf).collect()
    val digits = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_totalprice").cast("double")).collect()
      .map(r => math.round(r.getDouble(0) * 100).toString.head.asDigit)
    val byD = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getInt(0)).toSet == byD.keySet, "digit set mismatch")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orders") == byD(r.getInt(0)),
        s"digit ${r.getInt(0)} count")
      val expected = BigDecimal(math.log10(1 + 1.0 / r.getInt(0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("benford_share") - expected) < 1e-9)
      assert(r.getAs[Double]("obs_share") > 0.0 &&
        r.getAs[Double]("obs_share") <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n_orders")).sum == digits.length.toLong,
      "digit counts must conserve the table")
    // Benford shares over 1..9 are a complete distribution
    assert(math.abs((1 to 9).map(d => math.log10(1 + 1.0 / d)).sum - 1.0) < 1e-9)
  }

  test("PSI drift: terms replay driver-side; PSI >= 0 with equality iff identical shares") {
    import graft.analytics.Stats
    val out = Stats.psiDrift(spark, sf).collect()
    assert(out.length == Stats.DriftBins, "dense spine broken")
    val B = Stats.DriftBins
    val ht = out.map(_.getAs[Long]("n_hist")).sum
    val bt = out.map(_.getAs[Long]("n_batch")).sum
    var cum = 0.0
    out.sortBy(_.getAs[Long]("bin")).foreach { r =>
      val ph = (r.getAs[Long]("n_hist") + 1).toDouble / (ht + B)
      val pb = (r.getAs[Long]("n_batch") + 1).toDouble / (bt + B)
      val term = (pb - ph) * math.log(pb / ph)
      assert(term >= 0.0, "a PSI term is negative — impossible by form")
      assert(math.abs(r.getAs[Double]("psi_term") -
        math.rint(term * 1e6) / 1e6) <= 1e-9, s"bin ${r.getAs[Long]("bin")}")
      cum += term
      assert(math.abs(r.getAs[Double]("psi_cum") -
        math.rint(cum * 1e6) / 1e6) <= 1e-9)
    }
    // final row IS the index; smoothed shares of a same-source split
    // should read as stable-to-moderate, and never exactly zero
    val psi = out.maxBy(_.getAs[Long]("bin")).getAs[Double]("psi_cum")
    assert(psi > 0.0 && psi < 0.5, s"PSI $psi implausible for the fixture")
  }

  test("KS drift: statistic matches a driver-side ECDF walk on the binned grid") {
    val row = Stats.ksDrift(spark, sf).head()
    val o = graft.ingest.Sources.orders(spark, sf)
      .select(year(col("o_orderdate")).as("yr"),
        col("o_totalprice").cast("double")).collect()
      .map(r => (r.getInt(0),
        math.floor(r.getDouble(1) / Stats.KsBinWidth).toLong))
      .filter(t => t._1 == 1995 || t._1 == 1996)
    val a = o.filter(_._1 == 1995).map(_._2)
    val b = o.filter(_._1 == 1996).map(_._2)
    val (n, m) = (a.length.toLong, b.length.toLong)
    assert(row.getAs[Long]("n_1995") == n && row.getAs[Long]("n_1996") == m)
    var (best, bestBin, ca, cb) = (-1L, -1L, 0L, 0L)
    (a ++ b).distinct.sorted.foreach { bin =>
      ca += a.count(_ == bin); cb += b.count(_ == bin)
      val num = math.abs(ca * m - cb * n)
      if (num > best) { best = num; bestBin = bin } // first max = min bin
    }
    val ks = BigDecimal(best.toDouble / (n * m))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("ks_stat") - ks) < 1e-9,
      s"ks ${row.getAs[Double]("ks_stat")} != $ks")
    assert(row.getAs[Long]("at_price") == bestBin * Stats.KsBinWidth,
      "argmax grid point differs")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("price deciles: 2-phase sharded rank is bit-identical to the window ntile") {
    // the distributed global rank (round-9 rewrite of the
    // single-partition ntile window) must reproduce Spark's own
    // ntile(10) bucket-for-bucket — INCLUDING the front-loaded
    // remainder rows — at a row count not divisible by 10
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    def viaNtile(input: org.apache.spark.sql.DataFrame) = input
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"),
        round(sum(col("o_totalprice")), 2).as("mass"))
      .orderBy(col("decile")).collect().map(_.toSeq).toSeq
    // full table (what the oracle gates) AND a filtered frame whose
    // row count is NOT ≡ 0 (mod 10): sf0.001 orders is exactly 1500
    // rows, so the full table alone never exercises the front-loaded
    // remainder buckets
    val full = graft.ingest.Sources.orders(spark, sf)
    assert(Stats.priceDeciles(spark, sf).collect().map(_.toSeq).toSeq
      == viaNtile(full), "sharded rank deciles diverge on the full table")
    val odd = full.filter(col("o_orderkey") % 7 =!= 0)
    val nOdd = odd.count()
    assert(nOdd % 10 != 0, s"probe subset n=$nOdd still divisible by 10")
    assert(Stats.decilesOf(odd).collect().map(_.toSeq).toSeq
      == viaNtile(odd),
      s"sharded rank deciles diverge at n=$nOdd (remainder=${nOdd % 10})")
  }

  test("sketch quantiles: estimate matches a driver-side histogram walk, error within one bin") {
    val rows = Stats.sketchQuantiles(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("p50", "p90", "p99"))
    val xs = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_extendedprice").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    val w = Stats.SkqWidth
    val binCnt = xs.groupBy(x => math.floor(x / w).toLong)
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (num, den) = r.getString(0) match {
        case "p50" => (1L, 2L); case "p90" => (9L, 10L); case _ => (99L, 100L)
      }
      val rank = (xs.length * num + den - 1) / den
      assert(r.getAs[Long]("at_rank") == rank, s"${r.getString(0)} rank")
      // walk the histogram exactly as the operator defines it
      var cum = 0L
      val bin = binCnt.keys.toSeq.sorted.find { b =>
        cum += binCnt(b); cum >= rank
      }.get
      val prev = cum - binCnt(bin)
      val est = BigDecimal(bin * w + w * (rank - prev).toDouble / binCnt(bin))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("sketch_est") - est) < 1e-9,
        s"${r.getString(0)}: ${r.getAs[Double]("sketch_est")} != $est")
      // justified bound: the estimate lands in the bin of the
      // nearest-rank value (≤ one bin width off it); the interpolated
      // exact percentile can add at most the local gap between the
      // adjacent order statistics around that rank
      val lo = xs(math.max(rank - 2, 0).toInt)
      val hi = xs(math.min(rank, xs.length - 1).toInt)
      assert(r.getAs[Double]("abs_err") <= w.toDouble + (hi - lo) + 1e-6,
        s"${r.getString(0)} error above the bin-width + local-gap bound")
      // and the audit column is consistent with its inputs
      assert(math.abs(r.getAs[Double]("abs_err") -
        BigDecimal(math.abs(r.getAs[Double]("sketch_est") -
          r.getAs[Double]("exact_val")))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("bootstrap CI: deterministic, brackets the sample mean, unit-mean weights") {
    val a = Stats.bootstrapCi(spark, sf).collect()
    val b = Stats.bootstrapCi(spark, sf).collect()
    // the resampling is a pure function of (orderkey, replicate) — two
    // runs (fresh plans, fresh task orders) must agree bit-for-bit
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val nOrders = graft.ingest.Sources.orders(spark, sf).count()
    assert(a.map(_.getAs[Long]("n_orders")).sum == nOrders)
    a.foreach { r =>
      val (m, lo, hi) = (r.getAs[Double]("mean_price"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= hi, s"${r.getString(0)}: ci_lo $lo > ci_hi $hi")
      // percentile-bootstrap CI of the mean must bracket the sample
      // mean on groups this large (thousands of orders per priority)
      assert(lo <= m && m <= hi, s"${r.getString(0)}: [$lo, $hi] misses $m")
      // and be a real interval: zero width would mean degenerate draws
      assert(hi - lo > 0, s"${r.getString(0)}: degenerate CI")
    }
    // the Poisson(1) multiplicities must average ~1 — otherwise the
    // replicate totals are biased against the point estimate
    val w = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_orderkey"),
        explode(sequence(lit(0), lit(Stats.BootReps - 1))).as("rep"))
      .select(Scale.md5Uniform(concat(col("o_orderkey").cast("string"),
        lit(":"), col("rep").cast("string"))).as("u"))
      .select(avg(when(col("u") < Stats.PoissonCdf(0).toDouble, 1.0)
        .otherwise(0.0)).as("p0"))
      .head().getDouble(0)
    // P(w = 0) = e^-1 ± sampling noise over n_orders × 64 draws
    assert(math.abs(p0Expected - w) < 0.01,
      s"zero-weight share $w far from e^-1")
  }

  private val p0Expected = math.exp(-1)

  test("ANOVA: F replays from exact group moments with the documented floor") {
    val ys = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_orderpriority"), round(col("o_totalprice")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = ys.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val terms = groups.values.map { g =>
      val sg = g.map(BigInt(_)).sum
      math.floor(sg.toDouble * sg.toDouble / g.length.toDouble).toLong
    }.sum
    val n = ys.length.toLong
    val k = groups.size.toLong
    val s_ = ys.map(_._2).sum
    val q = ys.map(y => y._2 * y._2).sum
    val ssb = (terms - math.floor(s_.toDouble * s_.toDouble / n.toDouble).toLong).toDouble
    val ssw = (q - terms).toDouble
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val row = graft.analytics.Stats.anovaPriority(spark, sf).collect().head
    assert(row.getAs[Long]("n") == n && row.getAs[Long]("k") == k)
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-3,
      s"F ${row.getAs[Double]("f_stat")} vs replay $f")
    assert(f > 0, "degenerate fixture")
  }

  test("weighted median: replays a driver-side cumulative-weight walk") {
    val rows = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = Stats.weightedMedian(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val fl = r.getAs[String]("l_returnflag")
      val g = rows.filter(_._1 == fl).sortBy(_._2)
      val tot = g.map(_._3).sum
      assert(r.getAs[Long]("total_qty") == tot)
      var cw = 0L
      val wm = g.find { t => cw += t._3; cw * 2 >= tot }.get._2
      assert(r.getAs[Long]("wmedian_cents") == wm, s"$fl weighted median")
      // robustness sanity: the weighted median is a real data value
      assert(g.exists(_._2 == wm))
    }
  }

  test("OLS normal equations: coefficients replay a driver-side exact-moment solve") {
    val rows = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_extendedprice")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = Stats.olsNormalEq(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val fl = r.getAs[String]("l_returnflag")
      val g = rows.filter(_._1 == fl)
      val n = g.length.toDouble
      val s1 = g.map(_._2).sum.toDouble; val s2 = g.map(_._3).sum.toDouble
      val s11 = g.map(t => t._2 * t._2).sum.toDouble
      val s22 = g.map(t => t._3 * t._3).sum.toDouble
      val s12 = g.map(t => t._2 * t._3).sum.toDouble
      val sy = g.map(_._4).sum.toDouble
      val s1y = g.map(t => t._2 * t._4).sum.toDouble
      val s2y = g.map(t => t._3 * t._4).sum.toDouble
      val mA = s11 * s22 - s12 * s12
      val mB = s1 * s22 - s12 * s2
      val mC = s1 * s12 - s11 * s2
      val det = n * mA - s1 * mB + s2 * mC
      assert(det != 0, s"degenerate design for $fl in test data")
      val b0 = (sy * mA - s1 * (s1y * s22 - s12 * s2y) +
        s2 * (s1y * s12 - s11 * s2y)) / det
      val b1 = (n * (s1y * s22 - s12 * s2y) - sy * mB +
        s2 * (s1 * s2y - s1y * s2)) / det
      val b2 = (n * (s11 * s2y - s1y * s12) -
        s1 * (s1 * s2y - s1y * s2) + sy * mC) / det
      assert(math.abs(r.getAs[Double]("intercept_usd") - b0) < 1e-2, s"$fl b0")
      assert(math.abs(r.getAs[Double]("usd_per_qty") - b1) < 1e-4, s"$fl b1")
      assert(math.abs(r.getAs[Double]("usd_per_disc_pct") - b2) < 1e-4, s"$fl b2")
      // R² is a proportion by construction (no sign/shape assumption
      // on the synthetic corpus — only the solve itself is pinned)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9, s"$fl r2=$r2 out of [0,1]")
    }
  }

  test("feature importance: one row per feature, gains ranked, quantity recomputes via stump math") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Stats.featureImportance(spark, sf).collect()
    assert(rows.map(_.getAs[String]("feature")).toSet ==
      Set("extendedprice", "quantity", "discount"))
    assert(rows.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    val gains = rows.map(_.getAs[Long]("gain_ppm")).toSeq
    assert(gains == gains.sorted(Ordering[Long].reverse))
    assert(gains.forall(_ >= 0L))
    // recompute the quantity feature's best split from its histogram
    val hist = graft.ingest.Sources.lineitem(spark, sf)
      .select(expr("CAST(round(l_quantity) AS BIGINT)").as("bin"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("pos").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val totN = hist.map(_._2).sum; val totP = hist.map(_._3).sum
    def imp(p: Long, n: Long) =
      1000000L - ((p * p + (n - p) * (n - p)) * 1000000L) / (n * n)
    var nl = 0L; var pl = 0L
    val best = hist.flatMap { case (bin, n, p) =>
      nl += n; pl += p
      if (nl > 0 && nl < totN)
        Some((bin, (nl * imp(pl, nl) + (totN - nl) * imp(totP - pl, totN - nl)) / totN))
      else None
    }.minBy(c => (c._2, c._1))
    val qRow = rows.find(_.getAs[String]("feature") == "quantity").get
    assert(qRow.getAs[Long]("split_bin") == best._1)
    assert(qRow.getAs[Long]("weighted_gini_ppm") == best._2)
  }

  test("decision stump: best split matches a driver-side histogram sweep; gain never negative") {
    import org.apache.spark.sql.functions._
    val row = graft.analytics.Stats.decisionStump(spark, sf).head()
    // rebuild the bin histogram and sweep every candidate split
    val hist = graft.ingest.Sources.orders(spark, sf)
      .select(
        expr(s"CAST(round(o_totalprice * 100) AS BIGINT) DIV ${graft.analytics.Stats.StumpBinCents}L")
          .as("bin"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("pos"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("pos").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val totN = hist.map(_._2).sum
    val totP = hist.map(_._3).sum
    def imp(p: Long, n: Long) =
      1000000L - ((p * p + (n - p) * (n - p)) * 1000000L) / (n * n)
    var nl = 0L; var pl = 0L
    val cands = hist.flatMap { case (bin, n, p) =>
      nl += n; pl += p
      if (nl > 0 && nl < totN)
        Some((bin, nl, pl,
          (nl * imp(pl, nl) + (totN - nl) * imp(totP - pl, totN - nl)) / totN))
      else None
    }
    val best = cands.minBy(c => (c._4, c._1))
    assert(row.getAs[Long]("split_bin") == best._1)
    assert(row.getAs[Long]("weighted_gini_ppm") == best._4)
    assert(row.getAs[Long]("n_left") == best._2 &&
      row.getAs[Long]("pos_left") == best._3)
    assert(row.getAs[Long]("n_left") + row.getAs[Long]("n_right") == totN)
    assert(row.getAs[Long]("pos_left") + row.getAs[Long]("pos_right") == totP)
    // splitting can never beat the parent by less than zero (floor
    // rounding is bounded by 1 ppm and cannot flip the sign)
    assert(row.getAs[Long]("gain_ppm") >= 0L)
  }

  test("WOE/IV: bins reconcile with the stump histogram; woe recomputes; zero-information total") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Stats.woeIv(spark, sf).collect()
    assert(rows.nonEmpty)
    val tp = rows.map(_.getAs[Long]("n_pos")).sum
    val tn = rows.map(_.getAs[Long]("n_neg")).sum
    val b = rows.length.toLong
    assert(tp + tn == graft.ingest.Sources.orders(spark, sf).count())
    rows.foreach { r =>
      val np = r.getAs[Long]("n_pos"); val nn = r.getAs[Long]("n_neg")
      val woe = math.floor(1e6 * math.log(
        ((np + 1).toDouble / (tp + b)) / ((nn + 1).toDouble / (tn + b)))).toLong
      assert(r.getAs[Long]("woe_micro") == woe, s"woe mismatch at bin ${r.getLong(0)}")
      val dp = np * 1000000L / tp - nn * 1000000L / tn
      assert(r.getAs[Long]("iv_contrib") == dp * woe)
    }
    // priorities are assigned independently of price in the synthetic
    // corpus; sparse tail bins inflate IV through smoothing (the
    // well-known micro-bin artifact), but the total must still sit
    // well under the >= 0.3 "strong feature" band (3e11 in micro*ppm)
    // and can only dip below zero by per-bin rounding slack
    val iv = rows.map(_.getAs[Long]("iv_contrib")).sum
    assert(iv > -1000000L, s"IV $iv negative beyond rounding slack")
    assert(iv < 300000000000L, s"IV $iv implausibly high for an uninformative feature")
  }

  test("conformal: quantile is the exact order statistic; coverage lands near 1 - alpha") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Stats.conformal(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = graft.ingest.Sources.events(spark, sf)
      .select(col("event_type"), (col("event_id") % 3).as("fold"),
        (round(col("value") * 100).cast("long") * 10000L).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val t = r.getString(0)
      val train = raw.filter(x => x._1 == t && x._2 == 0L).map(_._3)
      val mean = train.sum / train.length
      assert(r.getAs[Long]("mean_micro") == mean)
      val cal = raw.filter(x => x._1 == t && x._2 == 1L)
        .map(x => math.abs(x._3 - mean)).sorted
      val k = ((cal.length + 1) * 90 + 99) / 100
      val qhat = cal(math.min(k, cal.length) - 1)
      assert(r.getAs[Long]("qhat_micro") == qhat, s"qhat mismatch for $t")
      val test = raw.filter(x => x._1 == t && x._2 == 2L)
      val inCnt = test.count(x => math.abs(x._3 - mean) <= qhat)
      assert(r.getAs[Long]("coverage_ppm") ==
        inCnt.toLong * 1000000L / test.length)
      // the conformal guarantee: coverage concentrates near 1 - alpha
      // (finite-sample slack on a few hundred test rows)
      val cov = r.getAs[Long]("coverage_ppm")
      assert(cov > 800000L && cov <= 1000000L,
        s"coverage $cov for $t outside the plausible 90% band")
    }
  }

  test("conformal sketch: qhat within one bin of the exact order statistic; coverage readout exact for its qhat") {
    import org.apache.spark.sql.functions._
    val exact = graft.analytics.Stats.conformal(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val sk = graft.analytics.Stats.conformalSketch(spark, sf).collect()
    assert(sk.nonEmpty && sk.length == exact.size,
      "sketch variant lost or invented event types")
    val w = graft.analytics.Stats.ConformalSkqWidth
    sk.foreach { r =>
      val t = r.getString(0)
      val e = exact(t)
      // shared machinery must agree exactly
      assert(r.getAs[Long]("n_train") == e.getAs[Long]("n_train"))
      assert(r.getAs[Long]("n_cal") == e.getAs[Long]("n_cal"))
      assert(r.getAs[Long]("n_test") == e.getAs[Long]("n_test"))
      assert(r.getAs[Long]("mean_micro") == e.getAs[Long]("mean_micro"))
      // the pinned sandwich: the sketch interpolates INSIDE the bin
      // holding the exact rank, so it can miss by at most one width
      val dq = math.abs(r.getAs[Long]("qhat_micro") - e.getAs[Long]("qhat_micro"))
      assert(dq <= w, s"$t: sketch qhat off by $dq > bin width $w")
      // coverage is EXACT for the sketch's own qhat — recompute it
      val mean = r.getAs[Long]("mean_micro")
      val qhat = r.getAs[Long]("qhat_micro")
      val test = graft.ingest.Sources.events(spark, sf)
        .select(col("event_type"), (col("event_id") % 3).as("fold"),
          (round(col("value") * 100).cast("long") * 10000L).as("v"))
        .collect().filter(x => x.getString(0) == t && x.getLong(1) == 2L)
        .map(_.getLong(2))
      val inCnt = test.count(v => math.abs(v - mean) <= qhat)
      assert(r.getAs[Long]("coverage_ppm") ==
        inCnt.toLong * 1000000L / test.length)
    }
  }

  test("entity clusters lsh: refines the exact-block clustering (every exact entity lands whole inside one LSH entity)") {
    val exact = graft.analytics.Stats.entityClusters(spark, sf).collect()
      .map(r => r.getAs[String]("part_keys").split(",").map(_.toLong).toSet)
    val lsh = graft.analytics.Stats.entityClustersLsh(spark, sf).collect()
      .map(r => r.getAs[String]("part_keys").split(",").map(_.toLong).toSet)
    assert(exact.nonEmpty && lsh.nonEmpty, "vacuous fixture")
    // the union of pair sets can only MERGE components, never split
    // them: each exact entity must be a subset of exactly one LSH
    // entity, and the LSH pass must not lose any clustered record
    exact.foreach { e =>
      val homes = lsh.count(l => e.subsetOf(l))
      assert(homes == 1, s"exact entity $e split or lost by the LSH pass")
    }
    assert(lsh.map(_.size).sum >= exact.map(_.size).sum,
      "LSH pass dropped clustered records")
  }

  test("entity clusters: every cluster is edge-connected; canonical is the min key") {
    import org.apache.spark.sql.functions._
    import graft.functions.StringDistances.damerauLevenshtein
    val rows = graft.analytics.Stats.entityClusters(spark, sf).collect()
    assert(rows.nonEmpty, "no multi-record entities in the fixture — vacuous")
    val t = graft.analytics.Stats.EntityMaxDist
    val p = graft.ingest.Sources.part(spark, sf)
    val pairs = p.select(col("p_brand"), col("p_type"),
        col("p_partkey").as("ka"), col("p_name").as("na"))
      .join(p.select(col("p_brand"), col("p_type"),
        col("p_partkey").as("kb"), col("p_name").as("nb")),
        Seq("p_brand", "p_type"))
      .filter(col("ka") < col("kb") &&
        damerauLevenshtein(col("na"), col("nb")) <= t)
      .collect().map(r => (r.getAs[Long]("ka"), r.getAs[Long]("kb")))
    val adj = pairs.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val keys = r.getAs[String]("part_keys").split(",").map(_.toLong)
      assert(r.getAs[Long]("entity") == keys.min,
        "canonical entity id must be the cluster's min key")
      assert(r.getAs[Long]("n_records") == keys.length.toLong)
      assert(keys.length >= 2, "CC emits only connected (multi-record) vertices")
      // connectivity: BFS within the cluster reaches every member
      val inSet = keys.toSet
      var seen = Set(keys.head)
      var frontier = Set(keys.head)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(k => adj.getOrElse(k, Set.empty))
          .intersect(inSet) -- seen
        seen ++= frontier
      }
      assert(seen == inSet, s"cluster ${r.getAs[Long]("entity")} not connected")
    }
    // completeness: every vertex that HAS a fuzzy pair is in some cluster
    val clustered = rows.flatMap(_.getAs[String]("part_keys").split(",")
      .map(_.toLong)).toSet
    assert(clustered == adj.keySet, "cluster membership != paired vertices")
  }

  test("decimal-carrier ppm formulas are exact past the old i64 ceilings (BigInt differential)") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    // round 11: giniPpmSql / the lift and micro-mean carriers were
    // rewritten on DECIMAL(38,0) after a headroom audit found the
    // all-BIGINT forms overflow at corpus-reachable counts (gini at
    // n ~ 3e6 rows(!), lift at n_orders ~ 9e12/support). This pins the
    // widened forms against BigInt ground truth at counts 1000x past
    // the old ceilings -- the exact values the i64 forms CANNOT
    // produce -- plus small randoms where old and new must agree.
    def giniBig(p: Long, n: Long): Long = {
      val (bp, bn) = (BigInt(p), BigInt(n))
      (BigInt(1000000) -
        ((bp * bp + (bn - bp) * (bn - bp)) * 1000000) / (bn * bn)).toLong
    }
    val rnd = new scala.util.Random(23)
    val cases = Seq(
      (4_000_000_000L, 1_700_000_000L),     // past the 3e6 gini ceiling
      (9_000_000_000_000L, 123_456_789_012L), // n^2 = 8.1e25 >> i64
      (1L, 0L), (1L, 1L)                    // degenerate edges
    ) ++ (1 to 8).map { _ =>
      val n = 1L + rnd.nextInt(1000000); (n, (rnd.nextDouble() * n).toLong)
    }
    val got = cases.toDF("n", "p")
      .select(col("n"), col("p"),
        expr(graft.analytics.Stats.giniPpmSql("p", "n")).as("g")).collect()
    got.foreach { r =>
      val (n, p) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == giniBig(p, n),
        s"gini ppm diverges from BigInt at (p=$p, n=$n)")
    }
    // the lift carrier: support*n_orders*1e6 and ant_support*cnt both
    // far past i64
    val lift = Seq((1_000_000_000L, 3_000_000_000L, 2_000_000_000_000L,
        500_000_000_000L))
      .toDF("support", "ant_support", "n_orders", "cnt")
      .select(expr("(CAST(support AS DECIMAL(20,0)) * n_orders * 1000000L)" +
        " DIV (CAST(ant_support AS DECIMAL(20,0)) * cnt)").as("lift_ppm"))
      .head().getLong(0)
    val liftExp = (BigInt(1_000_000_000L) * BigInt(2_000_000_000_000L) *
      1000000 / (BigInt(3_000_000_000L) * BigInt(500_000_000_000L))).toLong
    assert(lift == liftExp, s"lift ppm diverges from BigInt: $lift != $liftExp")
    // the micro-mean carrier: a $90T cents sum (past the 9e14 ceiling)
    val micro = Seq((900_000_000_000_000_000L, 7L)).toDF("s", "n")
      .select(expr("(CAST(s AS DECIMAL(20,0)) * 10000L) DIV n").as("m"))
      .head().getLong(0)
    assert(micro == (BigInt(900_000_000_000_000_000L) * 10000 / 7).toLong,
      "micro mean diverges from BigInt")
    // the pareto share carrier: (a) decimal == split-multiplier on
    // values BOTH can represent (the algebraic identity, executed);
    // (b) decimal == BigInt past the split form's own 9.2e15 ceiling
    val shares = ((1 to 8).map { _ =>
      val t = 1L + math.abs(rnd.nextLong()) % 9_000_000_000_000L
      (math.abs(rnd.nextLong()) % (t + 1), t)
    } :+ ((300_000_000_000_000_000L, 900_000_000_000_000_000L)))
      .toDF("cents", "t")
      .select(col("cents"), col("t"),
        expr("(CAST(cents AS DECIMAL(20,0)) * 1000000L) DIV t").as("dec"))
      .collect()
    shares.foreach { r =>
      val (c, t) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == (BigInt(c) * 1000000 / t).toLong,
        s"decimal share ppm diverges from BigInt at (cents=$c, t=$t)")
      if (c <= 9_000_000_000_000_000L) {
        val split = {
          val q = c * 1000L / t; val rr = c * 1000L % t
          q * 1000L + rr * 1000L / t
        }
        assert(r.getLong(2) == split,
          s"decimal share != split-multiplier at (cents=$c, t=$t)")
      }
    }
    // the chao2 carrier: q1^2-scale product past the old ~2e6 ceiling
    val chao = Seq((4_000_000_000L, 7L, 1_000_000L, 50_000_000L))
      .toDF("q1", "q2", "m_docs", "d_grams")
      .select(expr("d_grams * 1000L + (CAST(m_docs - 1 AS DECIMAL(20,0))" +
        " * q1 * (q1 - 1) * 1000L)" +
        " DIV (CAST(m_docs AS DECIMAL(20,0)) * 2 * (q2 + 1))").as("c"))
      .head().getLong(0)
    val chaoExp = (BigInt(50_000_000L) * 1000 +
      BigInt(999_999L) * BigInt(4_000_000_000L) * BigInt(3_999_999_999L) *
        1000 / (BigInt(1_000_000L) * 2 * 8)).toLong
    assert(chao == chaoExp, s"chao2 carrier diverges from BigInt: $chao != $chaoExp")
  }
}
