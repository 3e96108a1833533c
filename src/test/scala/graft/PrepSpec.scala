package graft

import org.apache.spark.sql.functions._
import graft.etl.Prep

/** Golden round-trip against the reference's own output file
  * (reference: kafka/sorted_water_quality.csv IS the output of
  * kafka/sort_the_source.py:38).
  */
class PrepSpec extends SparkSpec {

  private lazy val golden =
    graft.ingest.Sources.csv(spark, Prep.referenceCsv)

  private lazy val prepared =
    Prep.prepare(Prep.reconstructRaw(spark, Prep.referenceCsv))

  test("round-trip: prepared rows equal the reference output as a multiset") {
    val cols = Seq("FullDate", "WaterbodyName", "pH",
      "Dissolved Oxygen", "Conductivity @25°C")
    val ours = prepared
      .withColumn("FullDate", col("FullDate").cast("string"))
      .groupBy(cols.map(col): _*).count()
    val theirs = golden
      .withColumn("FullDate", date_format(to_date(col("FullDate")), "yyyy-MM-dd"))
      .groupBy(cols.map(col): _*).count()
    assert(ours.count() == theirs.count())
    assert(ours.except(theirs).count() == 0 && theirs.except(ours).count() == 0)
  }

  test("output is globally sorted by FullDate") {
    val dates = prepared.select(col("FullDate")).collect().map(_.getString(0))
    assert(dates.length == 29159, s"expected 29159 rows, got ${dates.length}")
    assert(dates.zip(dates.tail).forall { case (a, b) => a <= b },
      "FullDate not non-decreasing")
  }

  test("month map: unknown keys yield null (pandas .map NaN parity)") {
    import spark.implicits._
    val df = Seq("Jan", "Dec", "JAN", "January", "", "Foo")
      .toDF("SampleDate")
      .select(Prep.monthNumber(col("SampleDate")).as("m"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(df.toSeq == Seq(Some(1), Some(12), None, None, None, None))
  }

  test("prep output schema matches the reference projection exactly") {
    assert(prepared.columns.toSeq == Seq("FullDate", "WaterbodyName",
      "pH", "Dissolved Oxygen", "Conductivity @25°C"))
  }

  test("river WQI rolls up every waterbody-year") {
    val wqi = graft.etl.Prep.riverWqi(spark, sf)
    assert(wqi.count() > 0)
    val bad = wqi.filter(col("avg_wqi") < 0 || col("avg_wqi") > 100).count()
    assert(bad == 0, "WQI outside [0,100]")
  }

  test("river WQI trend: pair counts are C(months,2); median replays for a sampled waterbody") {
    import graft.etl.Prep
    val out = Prep.riverWqiTrend(spark, sf).collect()
    assert(out.nonEmpty)
    val base = graft.etl.Prep.prepare(
      graft.etl.Prep.reconstructRaw(spark, graft.etl.Prep.referenceCsv))
      .withColumn("wqi", graft.analytics.Quality.wqiRaw(
        col("pH"), col("Dissolved Oxygen"), col("Conductivity @25°C")))
      .withColumn("d", to_date(col("FullDate")))
      .groupBy(col("WaterbodyName"),
        (year(col("d")) * 12 + month(col("d"))).cast("long").as("m"))
      .agg(round(avg(col("wqi")) * 1000).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byWb = base.groupBy(_._1)
    out.foreach { r =>
      val wb = r.getAs[String]("WaterbodyName")
      val ms = byWb(wb).sortBy(_._2)
      val n = ms.length.toLong
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2,
        s"$wb pair count not C(months,2)")
      val slopes = (for {
        i <- ms.indices; j <- (i + 1) until ms.length
      } yield (ms(j)._3 - ms(i)._3).toDouble / (ms(j)._2 - ms(i)._2)).sorted
      val med = slopes((slopes.length + 1) / 2 - 1)
      val medRounded = BigDecimal(med)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("wqi_milli_per_month") == medRounded,
        s"$wb median slope does not replay")
    }
    // the fixture must exercise both improving and degrading trends or
    // at least a nonzero one
    assert(out.exists(_.getAs[Double]("wqi_milli_per_month") != 0.0))
  }
}
