package graft.spark

import org.apache.spark.sql.SparkSession

/** Single place every graft entry point builds its SparkSession from,
  * so session-scoped behavior is uniform instead of order-dependent on
  * which query ran first.
  *
  * In particular `spark.sql.legacy.parquet.nanosAsLong` is set HERE,
  * at construction: the harness `events` table stores TIMESTAMP(NANOS)
  * which Spark 4 otherwise rejects, and flipping the conf lazily (as a
  * side effect of the first `events()` call) would make every later
  * nanos-parquet read silently change type depending on call order.
  * With the conf pinned up front, ALL nanos columns uniformly arrive
  * as LongType and `graft.ingest.Sources.events` converts explicitly.
  */
object Sessions {

  /** Pre-configured builder; callers add master/app-specific confs.
    * The engine's SparkSessionExtensions are installed here, so every
    * graft session plans the custom operators (as-of strategy, its
    * pushdown rule, SQL function registration) with the rules inside
    * the optimizer's main fixed-point batch — an injected pushdown
    * interleaves with stock PushDownPredicates, which the runtime
    * `experimental.extraOptimizations` fallback (a late, separate
    * batch) cannot do.
    */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // OPTIMIZATION r14: write timestamps as TIMESTAMP_MICROS, not
      // the legacy INT96 default — micros IS Spark's internal
      // precision (lossless round-trip), INT96 is deprecated and
      // carries NO parquet column statistics, which would force every
      // timestamp-keyed ManifestTable commit onto the legacy
      // full-rescan stats path (see ManifestTable.footerStats) and
      // blinds row-group skipping on event-time predicates at scale.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  /** The standard local session used by Verify/Bench/tools. */
  def local(cores: String, shufflePartitions: String): SparkSession = {
    val s = builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
