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

  /** The complete reference ETL exercised end-to-end on the
    * reference's own corpus. Oracle reads the same CSV via DuckDB
    * read_csv — the input sits outside the harness star schema but is
    * equally visible to both engines, so the hash compare applies.
    */
  def riverPrep(spark: SparkSession, dir: String): DataFrame =
    prepare(reconstructRaw(spark, referenceCsv))

  /** Per-waterbody yearly WQI over the river corpus — the analytical
    * tail the reference documents but never built (reference:
    * README.md:5-6), using the X1 composite.
    */
  def riverWqi(spark: SparkSession, dir: String): DataFrame =
    prepare(reconstructRaw(spark, referenceCsv))
      // aggregate the RAW wqi; round only in the projection (averaging
      // pre-rounded values lands exactly on .xxxx5 cross-engine
      // rounding boundaries)
      .withColumn("wqi", Quality.wqiRaw(
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

  /** Both engines read the reference CSV directly; prep rebuilds
    * first-of-month FullDate exactly as `prepare` does, and the WQI
    * formula is inlined with the same literal band constants as
    * graft.analytics.Quality.wqiRaw — deliberately UNROUNDED per row:
    * per-row round(,4) before the yearly average lands on .xxxx5
    * binary-vs-decimal boundaries where the engines disagree, so
    * rounding happens once, after aggregation.
    */
  val riverPrepSql: String =
    s"""WITH raw AS (
      |  SELECT CAST(FullDate AS DATE) AS d, WaterbodyName,
      |    pH, "Dissolved Oxygen", "Conductivity @25°C"
      |  FROM read_csv('$referenceCsv', header=true)
      |)
      |SELECT strftime(make_date(CAST(year(d) AS INT), CAST(month(d) AS INT), 1),
      |                '%Y-%m-%d') AS FullDate,
      |  WaterbodyName, pH, "Dissolved Oxygen", "Conductivity @25°C"
      |FROM raw""".stripMargin

  val riverWqiSql: String =
    s"""WITH raw AS (
      |  SELECT CAST(FullDate AS DATE) AS d, WaterbodyName,
      |    pH AS ph, "Dissolved Oxygen" AS do_sat, "Conductivity @25°C" AS tds
      |  FROM read_csv('$referenceCsv', header=true)
      |), scored AS (
      |  SELECT WaterbodyName, CAST(year(d) AS INT) AS yr,
      |    greatest(0.0, 100.0 * (1.0 - abs(ph - 7.5) / 1.0)) * 0.4 +
      |    greatest(0.0, 100.0 * (1.0 - abs(do_sat - 75.0) / 45.0)) * 0.35 +
      |    greatest(0.0, 100.0 * (1.0 - abs(tds - 775.0) / 725.0)) * 0.25 AS wqi
      |  FROM raw
      |)
      |SELECT WaterbodyName, yr, count(*) AS n_samples,
      |  round(avg(wqi), 4) AS avg_wqi, round(min(wqi), 4) AS min_wqi
      |FROM scored
      |GROUP BY WaterbodyName, yr
      |ORDER BY WaterbodyName, yr""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_river_prep" -> riverPrepSql,
    "q_river_wqi" -> riverWqiSql
  )
}
