package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ingest.Sources._

/** Time-series regularization operators: dense time-grid generation
  * and last-observation-carried-forward (LOCF) gap filling — the prep
  * every model-training pipeline runs over irregular sensor feeds
  * (the reference's stream is exactly such a feed, reference:
  * kafka/producer.py:37-47).
  *
  * Scale notes (100 TB): the grid is generated per key with
  * `sequence` + `explode` — size is keys × span, independent of event
  * count, and generation is scan-side (no shuffle). The LOCF window
  * shares the hourly aggregation's user_id partitioning, so the whole
  * plan is one shuffle plus one narrow generator stage.
  */
object TimeSeries {

  /** Hourly LOCF gap fill per user: aggregate events to (user, hour),
    * densify the hour range, and carry the last observed hourly mean
    * forward through the gaps. Gap decisions and grid bounds are on
    * floor-second epoch hours so both engines agree exactly.
    */
  def gapFillLocf(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .select(col("user_id"),
        expr("unix_timestamp(ts) DIV 3600").as("hr"), col("value"))
      .groupBy(col("user_id"), col("hr"))
      .agg(avg(col("value")).as("v"))
    val grid = hourly
      .groupBy(col("user_id"))
      .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("hr"))
    val locf = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        round(last(col("v"), ignoreNulls = true).over(locf), 4).as("value_locf"),
        col("v").isNull.as("is_gap"))
      .orderBy(col("user_id"), col("hr"))
  }

  val gapFillLocfSql: String =
    """WITH hourly AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
      |    avg(value) AS v
      |  FROM events GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(lo, hi)) AS hr
      |  FROM (SELECT user_id, min(hr) AS lo, max(hr) AS hi
      |        FROM hourly GROUP BY user_id)
      |)
      |SELECT g.user_id, g.hr,
      |  round(last_value(h.v IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value_locf,
      |  (h.v IS NULL) AS is_gap
      |FROM grid g LEFT JOIN hourly h
      |  ON g.user_id = h.user_id AND g.hr = h.hr
      |ORDER BY g.user_id, g.hr""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gap_fill_locf" -> (gapFillLocf _)
  )

  val oracles: Map[String, String] = Map(
    "q_gap_fill_locf" -> gapFillLocfSql
  )
}
