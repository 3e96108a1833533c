package graft.tools

import org.apache.spark.sql.GraftBridge

/** Per-query physical-plan audit over the FINAL (post-AQE) plan —
  * query stages are executed so the join/exchange choices printed here
  * are the ones that actually ran, not the static guess. Optional
  * args restrict to named queries (the full sweep executes every
  * query once at sf0.01).
  *
  * `corpusbcast` is the number this audit exists for: unbounded
  * fact-table broadcasts (see [[PlanForensics.corpusBroadcasts]]),
  * with build-side provenance printed — the round-6 audit's bare
  * broadcast COUNT misread a corpus-sized postings broadcast as a
  * 3-row phrase frame.
  *
  * `spwindow` (round 9) is the second hard gate: single-partition
  * WindowExec over an unbounded corpus-derived frame (see
  * [[PlanForensics.singlePartitionWindows]]) — the round-8 judge
  * found two of these (q_price_deciles' ntile over the raw fact
  * table, q_link_prediction's rank over all wedge candidates) that
  * the broadcast-only audit was blind to. `spwagg` is the soft tier
  * (an aggregate bounds the frame to its group domain — safe only if
  * the domain is corpus-independent, which a docstring must argue);
  * `win`/`wgl` report how many window nodes exist and how many got
  * Spark's InferWindowGroupLimit rewrite.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // --gate (round 11): exit 1 on any HARD flag — forced corpus
    // broadcast, raw single-partition window, CartesianProduct, or a
    // query that fails to plan — so scripts/gate.sh can hold the
    // plan-shape line mechanically instead of a human re-reading the
    // sweep each round. Soft tiers (size-pick broadcasts, agg/ckpt
    // windows) stay warnings: they are re-plans-at-scale or
    // WindowBounds' jurisdiction respectively.
    val gate = args.contains("--gate")
    var hard = 0
    val spark = graft.spark.Sessions.local("8", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val wanted = args.filterNot(_ == "--gate").toSet
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    // queries whose plans carry "~" corpus-broadcast notes this run —
    // compared against BroadcastBounds.DefaultQueries after a FULL
    // sweep, so the measured-bounds harness can never silently miss a
    // new soft broadcast (round 12; the WindowBounds count-mismatch
    // lesson applied to list membership)
    val bcastFlagged = scala.collection.mutable.Set.empty[String]
    qs.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        // window forensics run on the STATIC physical plan: AQE's
        // EliminateLimits strips a limit whose bound runtime stats
        // prove redundant (measured: priceDeciles' 34-row offsets
        // cap), which would erase exactly the cardinality proof the
        // window detector keys on. Empty partitionSpec is structural
        // — identical pre/post AQE — so static loses nothing there.
        // Broadcast forensics stay on the FINAL plan, where they must
        // be (size-picked vs forced is a runtime distinction).
        val static = df.queryExecution.sparkPlan
        val fin = GraftBridge.finalPlan(df)
        val p = fin.toString
        val nodes = PlanForensics.walk(fin)
        def n(cls: String) =
          nodes.count(_.getClass.getSimpleName == cls)
        val scans = nodes.count(
          _.getClass.getSimpleName.contains("FileSourceScan"))
        val shuffles = n("ShuffleExchangeExec")
        val bcast = n("BroadcastExchangeExec")
        val reused = n("ReusedExchangeExec")
        val bnlj = n("BroadcastNestedLoopJoinExec")
        val cart = n("CartesianProductExec")
        val corpus = PlanForensics.corpusBroadcasts(fin)
        val raw = corpus.filterNot(_.filtered)
        val soft = corpus.filter(_.filtered)
        // a RAW flag is FORCED only if it survives with the broadcast
        // threshold off — otherwise it was the planner's size pick at
        // this SF, which self-corrects at scale (size estimates grow
        // past the threshold and the join goes to SMJ/SHJ)
        val forced =
          if (raw.isEmpty) Seq.empty[String]
          else {
            val key = "spark.sql.autoBroadcastJoinThreshold"
            val prev = spark.conf.get(key)
            spark.conf.set(key, "-1")
            try PlanForensics.rawCorpusBroadcasts(
              fn(spark, sf).queryExecution.executedPlan)
            finally spark.conf.set(key, prev)
          }
        val spw = PlanForensics.singlePartitionWindows(static)
        val spwRaw = spw.filter(_.bound == "none")
        val spwCkpt = spw.filter(_.bound == "ckpt")
        val spwAgg = spw.filter(_.bound == "agg")
        val (nWin, nWgl) = PlanForensics.windowGroupLimits(fin)
        val flag =
          (if (forced.nonEmpty)
             s"  !! FORCED raw corpus broadcast: ${forced.mkString(", ")}"
           else if (raw.nonEmpty)
             s"  ~ size-pick raw broadcast (re-plans to shuffle at scale): ${raw.map(_.tables).mkString(", ")}"
           else "") +
          (if (soft.isEmpty) ""
           else s"  ~ filter-bounded corpus broadcast (verify selectivity): ${soft.map(_.tables).mkString(", ")}") +
          (if (spwRaw.isEmpty) ""
           else s"  !! RAW single-partition window over: ${spwRaw.map(_.tables).mkString(", ")}") +
          (if (spwCkpt.isEmpty) ""
           else s"  ~ checkpoint-fed single-partition window (verify the checkpointed frame's bound): ${spwCkpt.map(_.tables).mkString(", ")}") +
          (if (spwAgg.isEmpty) ""
           else s"  ~ agg-bounded single-partition window (verify group domain): ${spwAgg.map(_.tables).mkString(", ")}")
        println(f"$name%-32s scans=$scans shuffles=$shuffles bcast=$bcast reused=$reused bnlj=$bnlj cart=$cart corpusbcast=${forced.size} spwindow=${spwRaw.size} spwckpt=${spwCkpt.size} spwagg=${spwAgg.size} win=$nWin wgl=$nWgl$flag")
        if (forced.isEmpty && corpus.nonEmpty) bcastFlagged += name
        hard += forced.size + spwRaw.size + cart
        if (sys.env.contains("GRAFT_AUDIT_VERBOSE") && corpus.nonEmpty)
          println(p)
      } catch {
        case e: Throwable =>
          hard += 1
          println(s"$name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
    if (wanted.isEmpty) {
      // full sweep: the soft-broadcast query set must equal the list
      // BroadcastBounds measures, or a scale claim is going unmeasured
      val expected = BroadcastBounds.DefaultQueries.toSet
      val missing = bcastFlagged.toSet -- expected
      val stale = expected -- bcastFlagged
      if (missing.nonEmpty || stale.nonEmpty) {
        hard += 1
        if (missing.nonEmpty) println(
          s"!! soft corpus broadcast NOT in BroadcastBounds.DefaultQueries (unmeasured scale claim): ${missing.toSeq.sorted.mkString(", ")}")
        if (stale.nonEmpty) println(
          s"!! BroadcastBounds.DefaultQueries entries no longer flagged (stale list): ${stale.toSeq.sorted.mkString(", ")}")
      }
    }
    if (gate && hard > 0) {
      println(s"$hard hard plan flag(s) — forced corpus broadcast, raw single-partition window, cartesian product, plan error, or BroadcastBounds list drift")
      sys.exit(1)
    }
  }
}
