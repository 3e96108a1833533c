package graft

import org.apache.spark.sql.functions._

/** The audit that audits the audit: PlanForensics exists because the
  * round-6 regex audit misread a corpus-sized broadcast as a 3-row
  * frame. These specs prove the classifier actually fires on the
  * failure shape (a raw fact-table broadcast) and stays quiet on the
  * legitimate ones — otherwise "corpusbcast=0 everywhere" could mean
  * a broken detector.
  */
class PlanForensicsSpec extends SparkSpec {

  private def fin(df: org.apache.spark.sql.DataFrame) =
    org.apache.spark.sql.GraftBridge.finalPlan(df)

  test("flags a forced raw fact-table broadcast (the r6 q_phrase_search shape)") {
    val spark2 = spark
    import spark2.implicits._
    val probe = Seq(1L, 2L, 3L).toDF("doc_id")
    val bad = probe.join(
      broadcast(graft.ingest.Sources.documents(spark, sf)
        .select(col("doc_id"), col("text"))), "doc_id")
    val offenders = graft.tools.PlanForensics.rawCorpusBroadcasts(fin(bad))
    assert(offenders.contains("documents"),
      s"raw documents broadcast not flagged: $offenders")
  }

  test("filter-bounded corpus broadcast is soft-flagged, not raw") {
    val spark2 = spark
    import spark2.implicits._
    val probe = Seq(1L, 2L, 3L).toDF("doc_id")
    val filtered = probe.join(
      broadcast(graft.ingest.Sources.documents(spark, sf)
        .filter(col("doc_id") < 5).select(col("doc_id"), col("text"))),
      "doc_id")
    val all = graft.tools.PlanForensics.corpusBroadcasts(fin(filtered))
    assert(all.exists(c => c.filtered && c.tables.contains("documents")),
      s"filtered broadcast not classified: $all")
    assert(graft.tools.PlanForensics.rawCorpusBroadcasts(fin(filtered)).isEmpty,
      "filter-bounded broadcast wrongly counted as raw")
  }

  test("aggregate/limit-bounded and dim broadcasts stay clean") {
    val spark2 = spark
    import spark2.implicits._
    val probe = Seq(0L, 1L).toDF("n_key")
    // aggregate-bounded: documents collapsed to per-lang counts
    val agged = probe.join(
      broadcast(graft.ingest.Sources.documents(spark, sf)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_key"))
        .select(col("n_key"))), "n_key")
    assert(graft.tools.PlanForensics.corpusBroadcasts(fin(agged)).isEmpty)
    // limit-bounded
    val limited = probe.crossJoin(
      broadcast(graft.ingest.Sources.documents(spark, sf)
        .select(col("doc_id")).orderBy(col("doc_id")).limit(3)))
    assert(graft.tools.PlanForensics.corpusBroadcasts(fin(limited)).isEmpty)
    // dim table: never corpus-classified at all
    val dim = graft.ingest.Sources.orders(spark, sf)
      .join(broadcast(graft.ingest.Sources.customer(spark, sf)),
        col("o_custkey") === col("c_custkey"))
    assert(graft.tools.PlanForensics.corpusBroadcasts(fin(dim)).isEmpty)
  }
}
