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
}
