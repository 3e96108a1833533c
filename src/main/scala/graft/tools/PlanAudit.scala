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
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("8", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val wanted = args.toSet
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    qs.foreach { case (name, fn) =>
      try {
        val fin = GraftBridge.finalPlan(fn(spark, sf))
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
        val flag =
          (if (forced.nonEmpty)
             s"  !! FORCED raw corpus broadcast: ${forced.mkString(", ")}"
           else if (raw.nonEmpty)
             s"  ~ size-pick raw broadcast (re-plans to shuffle at scale): ${raw.map(_.tables).mkString(", ")}"
           else "") +
          (if (soft.isEmpty) ""
           else s"  ~ filter-bounded corpus broadcast (verify selectivity): ${soft.map(_.tables).mkString(", ")}")
        println(f"$name%-32s scans=$scans shuffles=$shuffles bcast=$bcast reused=$reused bnlj=$bnlj cart=$cart corpusbcast=${forced.size}$flag")
        if (sys.env.contains("GRAFT_AUDIT_VERBOSE") && corpus.nonEmpty)
          println(p)
      } catch {
        case e: Throwable =>
          println(s"$name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
