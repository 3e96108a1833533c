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

  // ——— single-partition window detector (round 9) ———————————————
  // The round-8 judge found two single-task window sorts the
  // broadcast-only audit was blind to. These specs pin the detector
  // on the exact pre-fix shapes, so "spwindow=0 everywhere" can't
  // mean a broken detector. Windows are audited on the STATIC
  // physical plan (AQE's EliminateLimits strips redundant limit
  // proofs — see PlanAudit).
  private def stat(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan
  private def spw(df: org.apache.spark.sql.DataFrame) =
    graft.tools.PlanForensics.singlePartitionWindows(stat(df))

  import org.apache.spark.sql.expressions.Window

  test("raw single-partition window over a fact table is hard-flagged (the r8 q_price_deciles shape)") {
    val bad = graft.ingest.Sources.orders(spark, sf)
      .withColumn("d", ntile(10).over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    val f = spw(bad)
    assert(f.exists(w => w.bound == "none" && w.tables.contains("orders")),
      s"raw fact-table window not flagged: $f")
  }

  test("agg-fed and checkpoint-fed single-partition windows are soft-flagged (the r8 q_link_prediction shape)") {
    // an aggregate sits between window and scan — bounded only by its
    // GROUP DOMAIN, which the detector cannot certify
    val agged = graft.ingest.Sources.orders(spark, sf)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("n").desc, col("o_custkey"))))
    val fa = spw(agged)
    assert(fa.exists(w => w.bound == "agg" && w.tables.contains("orders")),
      s"agg-fed window not soft-flagged: $fa")
    // a localCheckpoint hides the scan behind an RDD leaf — the
    // detector must treat the opaque leaf as corpus-derived, or it
    // misses exactly the r8 headline finding (linkPrediction
    // checkpoints its edge list before the candidate ranking)
    val ckpt = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).localCheckpoint()
      .withColumn("r", row_number().over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    val fc = spw(ckpt)
    assert(fc.exists(_.bound == "ckpt"),
      s"checkpoint-fed window not soft-flagged: $fc")
  }

  test("limit-bounded and partitioned windows stay clean") {
    // the bm25Ranked discipline: TakeOrdered cut FIRST, rank after
    val ranked = graft.ingest.Sources.orders(spark, sf)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5)
      .withColumn("r", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
    assert(spw(ranked).isEmpty,
      s"limit-bounded window wrongly flagged: ${spw(ranked)}")
    // a PARTITIONED window is Spark's parallel path — never flagged
    val part = graft.ingest.Sources.orders(spark, sf)
      .withColumn("r", row_number().over(Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))))
    assert(spw(part).isEmpty,
      s"partitioned window wrongly flagged: ${spw(part)}")
  }

  test("the two r8 findings audit clean post-fix") {
    assert(spw(graft.analytics.Stats.priceDeciles(spark, sf)).isEmpty,
      "q_price_deciles still plans a single-partition window over the fact table")
    assert(spw(graft.analytics.Affinity.linkPrediction(spark, sf)).isEmpty,
      "q_link_prediction still ranks the full candidate set in one task")
  }

  test("InferWindowGroupLimit fires on partitioned rank-filters and NOT on unpartitioned ones") {
    // Pins the Spark 4.1 behavior the r8 judge probe discovered
    // manually: a `rank <= k` filter over a PARTITIONED window gets
    // the group-limit rewrite (partial + final WindowGroupLimitExec),
    // but the UNPARTITIONED variant gets NOTHING — it really does
    // sort the whole input in one task, which is why rank-then-filter
    // over a global order must be written limit-then-rank in this
    // repo. If a Spark upgrade changes either side, this fails and
    // the discipline gets re-evaluated.
    val part = graft.ingest.Sources.orders(spark, sf)
      .withColumn("r", row_number().over(Window
        .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)))
      .filter(col("r") <= 2)
    assert(graft.tools.PlanForensics.windowGroupLimits(stat(part)) === ((3, 2)),
      "partitioned rank-filter lost the WindowGroupLimit rewrite")
    val global = graft.ingest.Sources.orders(spark, sf)
      .withColumn("r", row_number().over(
        Window.orderBy(col("o_totalprice").desc)))
      .filter(col("r") <= 2)
    // the UNPARTITIONED variant gets no group-limit — instead 4.1's
    // LimitPushDownThroughWindow plants a TakeOrderedAndProject BELOW
    // the window (probed: the r8 link_prediction plan shows the rule
    // does NOT fire on every real shape — its multi-column rank
    // survived to a bare single-task Window — so the repo discipline
    // stays limit-then-rank rather than trusting the rewrite)
    assert(graft.tools.PlanForensics.windowGroupLimits(stat(global)) === ((1, 0)),
      "unpartitioned rank-filter unexpectedly got a group-limit rewrite")
    assert(spw(global).isEmpty,
      "limit-pushed rank-filter wrongly flagged — TakeOrderedAndProject below the window IS the bound")
  }

  test("spWindowInputRows measures the bounding aggregate's output as the window's input") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // a single-partition window over a 7-row aggregate: the probe must
    // execute the frame and read EXACTLY 7 from the nearest counted
    // descendant (the final HashAggregate), one entry per window —
    // this is the measurement WindowBounds' 1×-vs-4× gate rests on
    val agg = spark.range(1000)
      .groupBy((col("id") % 7).as("g"))
      .agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(Window.orderBy(col("n").desc, col("g"))))
    val m = graft.tools.PlanForensics.spWindowInputRows(agg)
    assert(m.size == 1, s"expected one single-partition window, got $m")
    assert(m.head._2 == 7L, s"window input should be the 7-row group domain: $m")
    // a partitioned window must NOT appear
    val part = spark.range(1000)
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id") % 7).orderBy(col("id"))))
    assert(graft.tools.PlanForensics.spWindowInputRows(part).isEmpty,
      "partitioned window wrongly measured as single-partition")
  }
}
