package graft

import org.apache.spark.sql.functions._
import graft.analytics.Quality

class QualitySpec extends SparkSpec {

  test("every quality query returns rows and has an oracle") {
    assert(Quality.queries.keySet == Quality.oracles.keySet)
    Quality.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("WQI: perfect readings score 100, out-of-band scores degrade monotonically") {
    import spark.implicits._
    val df = Seq(
      (7.5, 75.0, 775.0),  // all band centers → 100
      (6.5, 75.0, 775.0),  // pH at band edge → loses full pH weight
      (4.0, 75.0, 775.0),  // pH far out of band → clamped at 0 sub-index
      (7.5, 30.0, 775.0),  // DO at band edge
      (7.5, 75.0, 5000.0)  // TDS far out
    ).toDF("ph", "do_sat", "tds")
      .withColumn("wqi", Quality.wqi(col("ph"), col("do_sat"), col("tds")))
    val scores = df.select("wqi").collect().map(_.getDouble(0))
    assert(scores(0) == 100.0)
    assert(scores(1) == 60.0)        // 100 - 40 (pH weight)
    assert(scores(2) == 60.0)        // clamped, not negative
    assert(scores(3) == 65.0)        // 100 - 35 (DO weight)
    assert(scores(4) == 75.0)        // 100 - 25 (TDS weight)
    // monotone: moving pH toward the edge never raises the score
    val seq = Seq(7.5, 7.0, 6.8, 6.6, 6.5, 5.0).map { p =>
      Seq((p, 75.0, 775.0)).toDF("ph", "do_sat", "tds")
        .select(Quality.wqi(col("ph"), col("do_sat"), col("tds")))
        .collect().head.getDouble(0)
    }
    assert(seq == seq.sorted.reverse, s"WQI not monotone in pH distance: $seq")
  }

  test("rolling z-score only scores full 12-row frames") {
    // a sensor's first 12 readings can never be scored
    val z = Quality.rollingZscore(spark, sf, zThreshold = 0.0)
    val firstEvents = graft.ingest.Sources.events(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)))
      .filter(col("rn") <= 12)
      .select(col("event_id"))
    assert(z.join(firstEvents, "event_id").count() == 0)
  }

  test("tumbling window agg shuffles once (partial+final hash aggregate)") {
    val p = plan(Quality.sensorHourly(spark, sf))
    assert(p.contains("HashAggregate"), s"plan:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("hopping windows cover each event exactly 4 times and tile the timeline") {
    import graft.analytics.Quality
    val rows = Quality.hoppingStats(spark, sf).collect()
    val nEvents = graft.ingest.Sources.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == 4 * nEvents,
      "every event must land in exactly 4 hopping windows")
    val starts = rows.map(_.getAs[Long]("win_start_s"))
    assert(starts.forall(_ % 900 == 0), "window starts must align to the 900s slide")
    assert(starts.distinct.length == starts.length, "duplicate window rows")
  }

  test("expectations: one row per rule, violations bounded, clean rules zero") {
    import graft.analytics.Quality
    val rows = Quality.orderExpectations(spark, sf).collect()
    val nOrders = graft.ingest.Sources.orders(spark, sf).count()
    val expectedRules = Set("price_positive", "date_in_range",
      "priority_in_domain", "status_not_null", "custkey_referential")
    assert(rows.map(_.getString(0)).toSet == expectedRules)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nOrders)
      val v = r.getAs[Long]("n_violations")
      assert(v >= 0 && v <= nOrders)
      assert(r.getAs[Double]("violation_rate") ==
        BigDecimal(v.toDouble / nOrders).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the synthetic data is clean — a nonzero count would mean the rule
    // itself is wrong (inverted predicate, bad domain list)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violations") == 0L,
        s"clean fixture violates ${r.getString(0)}")
    }
  }

  test("rowExpectations counts NULL predicates as violations (dirty data)") {
    import graft.analytics.Quality
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val rows = java.util.Arrays.asList(
      Row(10.0, "A"),   // clean
      Row(-1.0, "A"),   // price violation
      Row(null, "B"),   // NULL price -> violation (not a silent pass)
      Row(5.0, null),   // NULL status -> violation
      Row(null, null))  // both
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("price", DoubleType), StructField("status", StringType))))
    val out = Quality.rowExpectations(df, Seq(
      "price_positive" -> (col("price") > 0),
      "status_in_domain" -> col("status").isin("A", "B"))).collect()
      .map(r => r.getString(1) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_violations"))).toMap
    assert(out("price_positive") == (5L, 3L),
      s"NULL price must count as violation: ${out("price_positive")}")
    assert(out("status_in_domain") == (5L, 2L),
      s"NULL status must count as violation: ${out("status_in_domain")}")
  }

  test("winsorize: fences are the ceil-rank order statistics and clip counts recount") {
    val out = graft.analytics.Quality.winsorize(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("p05_cents"),
          r.getAs[Long]("p95_cents"), r.getAs[Long]("n_clipped_lo"),
          r.getAs[Long]("n_clipped_hi"))).toMap
    val raw = graft.ingest.Sources.events(spark, sf)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.keySet == raw.keySet)
    raw.foreach { case (t, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sorted.map(_._1)
      val n = sorted.length
      val p05 = sorted(((n * 5 + 99) / 100 - 1).toInt)
      val p95 = sorted(((n * 95 + 99) / 100 - 1).toInt)
      val lo = sorted.count(_ < p05).toLong
      val hi = sorted.count(_ > p95).toLong
      assert(out(t) == ((n.toLong, p05, p95, lo, hi)),
        s"$t: got ${out(t)}, recount says ${(n, p05, p95, lo, hi)}")
      assert(lo > 0 && hi > 0, s"$t clips nothing — fixture vacuous for it")
    }
  }
}
