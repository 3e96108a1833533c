package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.ingest.Sources

/** Custom typed aggregates (SURVEY.md §2.7 X2).
  *
  * Welford/Chan parallel moments: numerically stable mean + variance
  * with an exact MERGE step — the property that matters on a cluster,
  * where partial aggregates combine in arbitrary order across
  * partitions. (A naive exponentially-weighted mean is order-dependent
  * and therefore not a lawful distributed aggregate; time-decayed
  * stats live in window functions instead — see
  * graft.analytics.Quality.rollingZscore.)
  */
object Aggregators {

  /** Running moments buffer: count, mean, and M2 (sum of squared
    * deviations from the current mean).
    */
  final case class Moments(n: Long, mean: Double, m2: Double)

  final case class MomentsOut(n: Long, mean: Double, stddev_samp: Double)

  /** Chan et al. parallel-merge Welford aggregator. */
  object WelfordMoments extends Aggregator[Double, Moments, MomentsOut] {
    override def zero: Moments = Moments(0L, 0.0, 0.0)

    override def reduce(b: Moments, x: Double): Moments = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      Moments(n, mean, b.m2 + delta * (x - mean))
    }

    override def merge(a: Moments, b: Moments): Moments =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        Moments(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }

    override def finish(r: Moments): MomentsOut =
      MomentsOut(r.n, r.mean,
        if (r.n > 1) math.sqrt(r.m2 / (r.n - 1)) else Double.NaN)

    override def bufferEncoder: Encoder[Moments] = Encoders.product
    override def outputEncoder: Encoder[MomentsOut] = Encoders.product
  }

  /** Column form for untyped DataFrames. */
  val welford: Column => Column = {
    val u = udaf(WelfordMoments)
    (c: Column) => u(c)
  }

  /** Oracle-checked query: per-event-type moments via the custom
    * aggregator; DuckDB recomputes with its built-ins — equality (to
    * 4 decimals) proves the merge math, since local[*] merges partial
    * buffers across 32 partitions in arbitrary order.
    */
  def eventMoments(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(welford(col("value")).as("m"))
      .select(col("event_type"), col("m.n").as("n"),
        round(col("m.mean"), 4).as("mean_value"),
        round(col("m.stddev_samp"), 4).as("sd_value"))
      .orderBy(col("event_type"))

  val eventMomentsSql: String =
    """SELECT event_type, count(value) AS n,
      |  round(avg(value), 4) AS mean_value,
      |  round(stddev_samp(value), 4) AS sd_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_moments" -> (eventMoments _)
  )

  val oracles: Map[String, String] = Map(
    "q_event_moments" -> eventMomentsSql
  )
}
