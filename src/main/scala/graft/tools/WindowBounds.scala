package graft.tools

/** Measured bounds for the `spwagg` soft tier (round 10): every
  * single-partition window that PlanAudit classifies as agg-bounded
  * rides a docstring ARGUMENT that its group domain (digits, bins,
  * months, sources…) is corpus-independent. This harness makes the
  * bound mechanical: run each flagged query at sf0.1 and at a K×
  * [[ScaleUp.materialize]] replica, read every single-partition
  * window's measured INPUT row count from the executed plan
  * ([[PlanForensics.spWindowInputRows]]), and FAIL (exit 1) if any
  * window's input grew materially with the corpus — flat = the
  * domain claim is proven, grown = the docstring lied.
  *
  * Tolerance: ratio ≤ [[Tolerance]] passes. Domains are not all
  * bit-constant — a margin-histogram's bin count tracks the margin
  * RANGE (which can widen slightly under the disjoint-vocab 4×
  * morph), month/source domains are exactly constant — so the gate
  * is "does not scale with rows" (4× data must not mean ~4× window
  * input), not "identical".
  *
  * args: [scaledDir] [k] [query...] — defaults /tmp/graft_scaled, 4,
  * [[DefaultQueries]] (the queries whose static plans carry spwagg
  * flags in the round-10 audit). Reuses an existing scaled dir.
  */
object WindowBounds {

  val Tolerance = 1.5

  /** Windows bounded by an explicit DOMAIN constant instead of a flat
    * row count: a clamped histogram's bin count may legitimately vary
    * BELOW its clamp (corpus content moves the occupied range), so the
    * gate for these is measured@Kx ≤ cap, not flatness. The cap is the
    * production constant itself — if the operator's clamp drifts, this
    * fails loudly.
    */
  val DomainCaps: Map[String, Long] = Map(
    "q_nb_ks_sketch" -> (graft.analytics.TextOps.NbKsMaxBin + 1))

  /** Queries whose static plans carry agg-bounded (or checkpoint-fed)
    * single-partition windows (from the round-10 PlanAudit sweep —
    * keep in sync with `spwagg`/`spwckpt` flags).
    */
  val DefaultQueries: Seq[String] = Seq(
    "q_benford_digits", "q_conversion_hazard", "q_curriculum_stages",
    "q_decision_stump", "q_feature_importance", "q_kaplan_meier",
    "q_ks_drift", "q_length_resample", "q_mix_weights",
    "q_nb_ks_sketch", "q_order_skyline", "q_psi_drift",
    "q_sketch_quantiles", "q_snapshot_drift", "q_source_gini")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_scaled")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val qs = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val marker = new java.io.File(s"$out/lineitem.parquet")
    if (!marker.exists()) ScaleUp.materialize(spark, src, out, k)
    var grown = 0
    println(f"${"query"}%-28s win ${"input"}%-14s ${"rows@1x"}%10s ${s"rows@${k}x"}%10s  ratio")
    qs.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      try {
        val base = PlanForensics.spWindowInputRows(fn(spark, src))
        val big = PlanForensics.spWindowInputRows(fn(spark, out))
        if (base.size != big.size) {
          // a plan whose single-partition-window COUNT changes with
          // corpus size is itself the regression this harness exists
          // to catch (round-11 advice: the zip below would silently
          // truncate to the shorter list and could still exit 0)
          grown += 1
          println(s"$q  !! WINDOW COUNT DIFFERS: ${base.size} vs ${big.size}")
        }
        base.zip(big).zipWithIndex.foreach {
          case (((lbl, a), (_, b)), i) =>
            val ratio = if (a > 0) b.toDouble / a else if (b == 0) 1.0 else Double.PositiveInfinity
            val cap = DomainCaps.get(q)
            val bad = ratio > Tolerance && cap.forall(b > _)
            if (bad) grown += 1
            val note =
              if (bad) "  !! GROWS WITH CORPUS"
              else cap.map(c => s"  (domain cap $c)").getOrElse("")
            println(f"$q%-28s  $i%2d $lbl%-14s $a%10d $b%10d  $ratio%5.2f$note")
        }
      } catch {
        case e: Throwable =>
          grown += 1
          println(s"$q ERROR ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
    if (grown > 0) {
      println(s"$grown single-partition window(s) grew past ${Tolerance}x — the agg-bound claim failed")
      sys.exit(1)
    }
  }
}
