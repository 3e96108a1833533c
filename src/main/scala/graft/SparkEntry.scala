package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; where the semantics are ANSI-SQL-expressible the paired
  * DuckDB oracle lives in [[oracleSql]] (hash-compared by the driver on
  * sf0.01). Non-SQL-expressible ops (LSH bucketing internals, streaming
  * state machines, multimodal decode) get rows-only checks plus their
  * own ScalaTest suites.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast join + aggregation — exercises scan, pushdown,
    * broadcast strategy and partial aggregation in one DAG.
    */
  def entry(spark: SparkSession): DataFrame =
    analytics.Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Relational.queries ++
      analytics.Affinity.queries ++
      analytics.Stats.queries ++
      analytics.TimeSeries.queries ++
      analytics.Events.queries ++
      analytics.TextOps.queries ++
      analytics.Similarity.queries ++
      analytics.Quality.queries ++
      analytics.Privacy.queries ++
      analytics.Packing.queries ++
      analytics.Multimodal.queries ++
      functions.Aggregators.queries ++
      operators.Scale.queries ++
      sinks.Sinks.queries ++
      etl.Prep.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    analytics.Relational.oracles ++
      analytics.Affinity.oracles ++
      analytics.Stats.oracles ++
      analytics.TimeSeries.oracles ++
      analytics.Events.oracles ++
      analytics.TextOps.oracles ++
      analytics.Similarity.oracles ++
      analytics.Quality.oracles ++
      analytics.Privacy.oracles ++
      analytics.Packing.oracles ++
      functions.Aggregators.oracles ++
      operators.Scale.oracles ++
      sinks.Sinks.oracles ++
      analytics.Multimodal.oracles ++
      etl.Prep.oracles
}
