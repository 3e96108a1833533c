package graft.tools

/** Measured bounds for the corpus-broadcast SOFT tiers (round 12):
  * [[PlanAudit]] prints two "~" notes that until now rode docstring
  * ARGUMENTS — `~ filter-bounded corpus broadcast (verify
  * selectivity)` and `~ size-pick raw broadcast (re-plans to shuffle
  * at scale)`. This harness makes both claims mechanical, the way
  * [[WindowBounds]] did for the `spwagg` window tier: run each
  * flagged query at sf0.1 and at a K× [[ScaleUp.materialize]]
  * replica, read every flagged broadcast's measured build-side rows
  * and bytes from the executed plan
  * ([[PlanForensics.corpusBroadcastRows]]), and decide EMPIRICALLY —
  * no hand-maintained classification to go stale:
  *
  *  - Measured FLAT at K× (ratio ≤ [[Tolerance]]), or gone: the
  *    build side is probe-/constant-bounded (the sq8 family's
  *    `vec_id < nQueries` query set, a literal-key bloom probe…) —
  *    the "verify selectivity" claim is PROVEN, hint or no hint.
  *
  *  - GROWN at K×: the build side is corpus-shaped (a selectivity
  *    filter like q_upsert_orders' urgent slice, or a small-at-SF
  *    fact side), which is fine exactly when the broadcast is the
  *    planner's SIZE PICK — it re-plans to a shuffle join once the
  *    size estimate crosses autoBroadcastJoinThreshold. The HARD
  *    check, measured at K×: re-run with the threshold at −1
  *    (auto-broadcast off — PlanAudit's forced-vs-pick
  *    discriminator) and require the flagged broadcast to VANISH:
  *    only a broadcast() hint survives −1, and a hinted
  *    corpus-shaped build side never re-plans. (A
  *    lowered-but-positive threshold is the wrong probe: the
  *    planner compares its ESTIMATE, which can sit far below the
  *    exchange's measured dataSize, so an honest size-pick survives
  *    it — the first cut of this harness misread exactly that as a
  *    hint.) The measured bytes vs the threshold are the SOFT
  *    number: the planner's estimate is compressed-scan-based while
  *    the materialized HashedRelation is uncompressed-with-hashmap,
  *    so an honest pick can ship factor× the configured threshold
  *    before its (linear-in-corpus) estimate crosses and the pick
  *    flips — the factor is the estimate error, a bounded data
  *    property, NOT unbounded growth. It is printed per query and
  *    fails only past [[MaxOvershoot]] (a transient broadcast that
  *    large stops being a sane pick at any scale).
  *
  * Broadcasts are keyed by (tables, filtered-or-raw): a query can
  * legitimately carry BOTH a hinted flat probe and a size-picked
  * corpus side over the same table (q_ann_recall: the 200-row
  * brute-force query sample + the LSH candidate side), and pooling
  * them by table alone misreads "flat hinted + grown size-pick" as
  * "grown hinted" — the first cut of this harness did exactly that.
  *
  * [[DefaultQueries]] is every query whose final plan carried a "~"
  * corpus-broadcast note in the round-12 full PlanAudit sweep;
  * `PlanAudit --gate` fails when its flagged set drifts from this
  * list, so the two stay in sync mechanically (the WindowBounds
  * lesson: a keep-in-sync comment is not a mechanism).
  *
  * args: [scaledDir] [k] [query...] — defaults /tmp/graft_scaled, 4,
  * [[DefaultQueries]]. Reuses an existing scaled dir.
  */
object BroadcastBounds {

  val Tolerance = 1.5

  /** Cap on measured-bytes ÷ threshold for a grown size-picked
    * broadcast: the estimate-error factor by which a pick can
    * overshoot the configured threshold before it flips to shuffle.
    * 32× a 10 MB threshold is a ~320 MB transient broadcast — past
    * any sane per-executor budget, so a factor beyond this is a
    * plan that needs restructuring, not an estimate quirk (largest
    * measured this round: 11.2×, q_integrity_audit).
    */
  val MaxOvershoot = 32.0

  /** Queries whose final post-AQE plans carry "~" corpus-broadcast
    * notes (round-12 full sweep). PlanAudit --gate enforces set
    * equality with its own per-run findings.
    */
  val DefaultQueries: Seq[String] = Seq(
    "q_ann_recall", "q_bloom_pruned_join", "q_chunk_dedup",
    "q_customer_order_counts", "q_customers_with_big_orders",
    "q_customers_without_orders", "q_dedup_quality_reps", "q_dup_spans",
    "q_embed_near_dup", "q_hard_negatives", "q_hybrid_rrf",
    "q_integrity_audit", "q_interval_overlap", "q_knn_bruteforce",
    "q_knn_lsh", "q_ndcg_eval", "q_order_priority_revenue",
    "q_ordered_funnel", "q_rbo_eval", "q_shipping_lag",
    "q_sq8_knn", "q_sq8_recall", "q_upsert_orders")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_scaled")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val qs = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val marker = new java.io.File(s"$out/lineitem.parquet")
    if (!marker.exists()) ScaleUp.materialize(spark, src, out, k)
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val thresholdBytes: Long = {
      val v = spark.conf.get(thresholdKey)
      // conf strings like "10MB"/"10485760b"/"-1"
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        if (v.forall(c => c.isDigit || c == '-')) v + "b" else v)
    }
    var bad = 0
    println(f"${"query"}%-28s ${"tables"}%-16s ${"rows@1x"}%9s ${"rows@" + k + "x"}%9s ${"bytes@" + k + "x"}%12s  verdict")
    qs.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      try {
        def keyOf(m: PlanForensics.BroadcastMeasure): String =
          m.tables + (if (m.filtered) "/filt" else "/raw")
        val base = PlanForensics.corpusBroadcastRows(fn(spark, src))
        val big = PlanForensics.corpusBroadcastRows(fn(spark, out))
        if (base.isEmpty && big.isEmpty)
          println(f"$q%-28s ${"-"}%-16s (no flagged broadcast — note resolved? drop from DefaultQueries)")
        val keys = (base.map(keyOf) ++ big.map(keyOf)).distinct
        keys.foreach { t =>
          val aRows = base.filter(keyOf(_) == t).map(_.rows).sum
          val b = big.filter(keyOf(_) == t)
          val bRows = b.map(_.rows).sum
          val bBytes = b.map(_.bytes).sum
          val ratio =
            if (aRows > 0) bRows.toDouble / aRows
            else if (bRows == 0) 1.0 else Double.PositiveInfinity
          val verdict =
            if (b.isEmpty) "flat (re-planned away at Kx)"
            else if (ratio <= Tolerance) f"flat (x$ratio%.2f) — probe-bounded proven"
            else {
              // corpus-shaped: the claim under test is the re-plan
              val prev = spark.conf.get(thresholdKey)
              spark.conf.set(thresholdKey, "-1")
              val demoted =
                try PlanForensics.corpusBroadcastRows(fn(spark, out))
                  .filter(keyOf(_) == t)
                finally spark.conf.set(thresholdKey, prev)
              val factor = bBytes.toDouble / thresholdBytes
              if (demoted.nonEmpty)
                f"!! grows (x$ratio%.2f) AND SURVIVES THRESHOLD -1 (hinted — never re-plans at scale)"
              else if (factor > MaxOvershoot)
                f"!! grows (x$ratio%.2f), overshoot x$factor%.1f past MaxOvershoot — restructure the plan"
              else if (factor > 1.0)
                f"grows (x$ratio%.2f), size-pick: re-plan demonstrated at -1; overshoot x$factor%.1f (estimate error, bounded)"
              else
                f"grows (x$ratio%.2f), size-pick: re-plan demonstrated at -1"
            }
          if (verdict.startsWith("!!")) bad += 1
          println(f"$q%-28s $t%-16s $aRows%9d $bRows%9d $bBytes%12d  $verdict")
        }
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"$q ERROR ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
    if (bad > 0) {
      println(s"$bad broadcast bound(s) failed — a soft-tier scale claim broke")
      sys.exit(1)
    }
  }
}
