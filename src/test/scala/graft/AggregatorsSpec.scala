package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Aggregators
import graft.functions.Aggregators.{Moments, WelfordMoments}

class AggregatorsSpec extends SparkSpec {

  test("welford moments match Spark built-ins on the events table") {
    val ours = Aggregators.eventMoments(spark, sf)
    val builtins = graft.ingest.Sources.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(col("value")).as("n2"),
        round(avg(col("value")), 4).as("mean2"),
        round(stddev_samp(col("value")), 4).as("sd2"))
    val joined = ours.join(builtins, "event_type")
      .filter(col("n") =!= col("n2") ||
        abs(col("mean_value") - col("mean2")) > 1e-9 ||
        abs(col("sd_value") - col("sd2")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("merge is associative-equivalent: split-and-merge equals sequential reduce") {
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)),
      Gen.chooseNum(0, 1000)) { (xs: List[Double], splitSeed: Int) =>
      val seqR = xs.foldLeft(WelfordMoments.zero)(WelfordMoments.reduce)
      val k = splitSeed % xs.length
      val (l, r) = xs.splitAt(k)
      val merged = WelfordMoments.merge(
        l.foldLeft(WelfordMoments.zero)(WelfordMoments.reduce),
        r.foldLeft(WelfordMoments.zero)(WelfordMoments.reduce))
      merged.n == seqR.n &&
        math.abs(merged.mean - seqR.mean) <= 1e-9 * math.max(1.0, math.abs(seqR.mean)) &&
        math.abs(merged.m2 - seqR.m2) <= 1e-6 * math.max(1.0, seqR.m2)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("empty and singleton buffers behave") {
    assert(WelfordMoments.merge(WelfordMoments.zero, WelfordMoments.zero) == WelfordMoments.zero)
    val one = WelfordMoments.reduce(WelfordMoments.zero, 42.0)
    assert(one == Moments(1, 42.0, 0.0))
    val out = WelfordMoments.finish(one)
    assert(out.stddev_samp.isNaN)
  }

  test("approx_count_distinct (HLL++) lands within its error bound (A4/X3)") {
    val exact = graft.ingest.Sources.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    val approx = graft.ingest.Sources.orders(spark, sf)
      .select(approx_count_distinct(col("o_custkey"), 0.02)).collect().head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.06, s"HLL rel err $relErr (exact=$exact approx=$approx)")
  }

  test("count-min sketch: estimates are one-sided and partition-order invariant (X3)") {
    import Aggregators.CountMin
    // crafted corpus: token frequencies are known exactly
    val words = (1 to 50).flatMap(i => Seq.fill(i)(s"w$i"))
    val spark2 = spark
    import spark2.implicits._
    def estimates(parts: Int): Map[String, Long] = {
      val sk = words.toDF("tok").repartition(parts)
        .agg(Aggregators.countMin(col("tok")).as("sk"))
      (1 to 50).map { i =>
        val est = words.toDF("tok").filter(col("tok") === s"w$i").limit(1)
          .crossJoin(sk)
          .select(Aggregators.cmsEstimate(col("sk"), col("tok")))
          .collect().head.getLong(0)
        s"w$i" -> est
      }.toMap
    }
    val e1 = estimates(1)
    // one-sided error: never undercounts
    (1 to 50).foreach(i => assert(e1(s"w$i") >= i, s"w$i underestimated"))
    // mergeable: 8-way partial sketches give identical estimates
    assert(estimates(8) == e1, "partition order changed the sketch")
    // sanity on the sum: total mass conserved per row
    val buf = words.foldLeft(CountMin.zero)(CountMin.reduce)
    (0 until Aggregators.CmsDepth).foreach { r =>
      val rowSum = (0 until Aggregators.CmsWidth)
        .map(b => buf.c(r * Aggregators.CmsWidth + b)).sum
      assert(rowSum == words.size.toLong, s"row $r lost mass")
    }
  }

  test("count-min JVM bucket matches the SQL md5-word rule") {
    import Aggregators.CountMin
    val spark2 = spark
    import spark2.implicits._
    val keys = Seq("alpha", "beta", "tok-42", "", "ümlaut")
    val sqlBuckets = keys.toDF("k")
      .select((0 until Aggregators.CmsDepth).map(i =>
        pmod(conv(substring(md5(col("k")), 1 + 8 * i, 8), 16, 10)
          .cast("long"), lit(Aggregators.CmsWidth.toLong)).as(s"b$i")): _*)
      .collect()
    keys.zip(sqlBuckets).foreach { case (k, row) =>
      (0 until Aggregators.CmsDepth).foreach { i =>
        assert(CountMin.bucket(k, i) == row.getLong(i).toInt,
          s"bucket mismatch for '$k' row $i")
      }
    }
  }

  test("approx_percentile lands within its accuracy contract (X3)") {
    val exact = graft.ingest.Sources.orders(spark, sf)
      .select(percentile(col("o_totalprice"), lit(0.5))).collect().head.getDouble(0)
    val approx = graft.ingest.Sources.orders(spark, sf)
      .select(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .collect().head.getDouble(0)
    // accuracy=1000 -> rank error <= n/1000; translate to a loose value
    // tolerance via the observed spread
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx median $approx too far from exact $exact")
  }

  test("TopKAgg: arbitrary partition/merge grouping equals the global top-k (X2)") {
    import Aggregators.{Scored, TopKAgg}
    val gen = for {
      k <- Gen.chooseNum(1, 8)
      n <- Gen.chooseNum(0, 60)
      scores <- Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3))
      cuts <- Gen.listOfN(6, Gen.chooseNum(0, n))
    } yield (k, scores.zipWithIndex.map { case (s, i) =>
      Scored(s, i.toLong, i.toLong) }, cuts.sorted)
    val prop = Prop.forAll(gen) { case (k, items, cuts) =>
      val agg = new TopKAgg(k)
      val truth = items.sortBy(s => (-s.score, s.id)).take(k)
      // sequential reduce
      val seqR = items.foldLeft(agg.zero)(agg.reduce)
      // split at random cuts, reduce each chunk, merge in REVERSE order
      val chunks = (0 +: cuts :+ items.length).distinct.sorted
        .sliding(2).collect { case Seq(a, b) => items.slice(a, b) }.toList
      val merged = chunks.reverse
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      seqR == truth && merged == truth
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("AMS F2: estimators recompute from raw counts; mean is in the unbiased ballpark") {
    import org.apache.spark.sql.functions._
    val rows = graft.functions.Aggregators.amsF2Tokens(spark, sf).collect()
    assert(rows.length == graft.functions.Aggregators.AmsEstimators)
    val exact = rows.head.getAs[Long]("exact_f2")
    assert(rows.forall(_.getAs[Long]("exact_f2") == exact))
    // recompute estimator j = 0 driver-side with the same md5 signs
    val counts = graft.ingest.Sources.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val s0 = counts.map { case (tok, c) =>
      val w = java.lang.Long.parseLong(md5hex("0_" + tok).substring(0, 8), 16)
      (if (w % 2 == 0) 1L else -1L) * c
    }.sum
    assert(rows.find(_.getLong(0) == 0L).get.getAs[Long]("est_f2") == s0 * s0)
    assert(exact == counts.map { case (_, c) => c * c }.sum)
    // unbiasedness sanity on the fixture: the 8-estimator mean stays
    // within a small constant factor of the exact moment
    val mean = rows.map(_.getAs[Long]("est_f2")).sum / rows.length
    assert(mean > exact / 10 && mean < exact * 10,
      s"AMS mean $mean implausibly far from exact $exact")
  }

  test("join-size sketch: one-sided estimate; exact recomputes from key counts") {
    import org.apache.spark.sql.functions._
    val row = graft.functions.Aggregators.joinSizeSketch(spark, sf).head()
    val exact = row.getAs[Long]("exact_size")
    val est = row.getAs[Long]("cms_est")
    // one-sided bound: CMS inner products only ever overcount
    assert(est >= exact, s"inner-product estimate $est below exact $exact")
    assert(row.getAs[Long]("overcount") == est - exact)
    // recompute exact from key frequencies
    val evC = graft.ingest.Sources.events(spark, sf)
      .groupBy(col("user_id").cast("string").as("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val odC = graft.ingest.Sources.orders(spark, sf)
      .groupBy(col("o_custkey").cast("string").as("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = evC.map { case (k, c) => c * odC.getOrElse(k, 0L) }.sum
    assert(exact == direct, s"exact $exact != key-count recompute $direct")
    assert(direct > 0, "probe join is empty — vacuous fixture")
    // the estimate is useful, not degenerate: within the epsilon bound
    // e/w * Na * Nb of the exact size
    val na = evC.values.sum; val nb = odC.values.sum
    val bound = exact + (3 * na * nb) / (row.getAs[Long]("w"))
    assert(est <= bound, s"estimate $est beyond the CMS error bound $bound")
  }
}
