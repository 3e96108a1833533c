package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Quality

/** The reference's batch prep ETL (reference: kafka/sort_the_source.py)
  * re-expressed as ONE lazy DataFrame chain executed at the write
  * action — month-name lookup (P5), derived first-of-month date (P6),
  * global time sort (O1), 5-column projection (P1), `yyyy-MM-dd`
  * formatting (P8).
  *
  * Semantic pins carried over from pandas (SURVEY.md §5.1):
  *  - unknown month abbreviations map to null (pandas `.map` → NaN),
  *    not an error;
  *  - the sort is by FullDate only; tie order within a date is
  *    unspecified (pandas used quicksort — not stable either).
  *
  * Scale notes: `orderBy` plans as a range-partitioned global sort —
  * at 100 TB this is the one genuinely global shuffle in the chain and
  * is exactly what Spark's TeraSort path is built for; everything else
  * is narrow.
  */
object Prep {

  /** Month-name → number map (reference: kafka/sort_the_source.py:15-19). */
  val monthMap: Map[String, Int] = Map(
    "Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4,
    "May" -> 5, "Jun" -> 6, "Jul" -> 7, "Aug" -> 8,
    "Sep" -> 9, "Oct" -> 10, "Nov" -> 11, "Dec" -> 12)

  /** P5: map-literal lookup; null on unknown keys (pandas NaN parity). */
  def monthNumber(sampleDate: Column): Column =
    element_at(typedlit(monthMap), sampleDate)

  /** The full prep chain over a raw frame with columns
    * (SampleDate, Years, WaterbodyName, pH, Dissolved Oxygen,
    * Conductivity @25°C).
    */
  def prepare(raw: DataFrame): DataFrame =
    raw
      .withColumn("MonthNumber", monthNumber(col("SampleDate")))
      .withColumn("FullDate",
        make_date(col("Years"), col("MonthNumber"), lit(1)))
      .orderBy(col("FullDate"))
      .select(
        date_format(col("FullDate"), "yyyy-MM-dd").as("FullDate"),
        col("WaterbodyName"), col("pH"),
        col("Dissolved Oxygen"), col("Conductivity @25°C"))

  /** Rebuild the (missing-from-checkout) raw input shape from the
    * reference's own output file: derive SampleDate month abbreviation
    * and Years back from FullDate. Used by the golden round-trip test
    * and the river queries.
    */
  def reconstructRaw(spark: SparkSession, path: String): DataFrame =
    graft.ingest.Sources.csv(spark, path)
      .withColumn("d", to_date(col("FullDate")))
      .withColumn("Years", year(col("d")))
      .withColumn("SampleDate", date_format(col("d"), "MMM"))
      .drop("FullDate", "d")

  val referenceCsv = "/root/reference/kafka/sorted_water_quality.csv"

  /** Rows-only query: the complete reference ETL exercised end-to-end
    * on the reference's own corpus (no DuckDB oracle — the input is a
    * CSV outside the harness star schema; correctness is pinned by the
    * golden round-trip spec instead).
    */
  def riverPrep(spark: SparkSession, dir: String): DataFrame =
    prepare(reconstructRaw(spark, referenceCsv))

  /** Rows-only query: per-waterbody yearly WQI over the river corpus —
    * the analytical tail the reference documents but never built
    * (reference: README.md:5-6), using the X1 composite.
    */
  def riverWqi(spark: SparkSession, dir: String): DataFrame =
    prepare(reconstructRaw(spark, referenceCsv))
      .withColumn("wqi", Quality.wqi(
        col("pH"), col("Dissolved Oxygen"), col("Conductivity @25°C")))
      .groupBy(col("WaterbodyName"),
        year(to_date(col("FullDate"))).as("yr"))
      .agg(count(lit(1)).as("n_samples"),
        round(avg(col("wqi")), 4).as("avg_wqi"),
        round(min(col("wqi")), 4).as("min_wqi"))
      .orderBy(col("WaterbodyName"), col("yr"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_river_prep" -> (riverPrep _),
    "q_river_wqi" -> (riverWqi _)
  )

  /** No oracle entries: inputs live outside the harness schema. */
  val oracles: Map[String, String] = Map.empty
}
