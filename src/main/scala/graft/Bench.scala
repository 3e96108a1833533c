package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Drop every block the previous query may have left in the block
    * manager. Operators localCheckpoint shared subtrees (LSH signatures,
    * oriented edges, IVF index, per-round ranks) and hand the cached frame
    * to the caller — correct for a real user session, but in a 106-query
    * benchmark loop the blocks accumulate and later queries pay eviction
    * and GC for earlier queries' state. Measured round 4: q_part_pagerank
    * 4.4–5.2 s standalone but 14.3 s when benched after 7 other queries in
    * the same JVM. Clearing between queries makes each measurement start
    * from a clean storage state, so the artifact measures plans, not suite
    * position.
    */
  private def dropCaches(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.spark.Sessions.local(cpus, cpus)
    // Warm up the session (executor threads, codegen compiler, parquet
    // reader classes) so the first timed query doesn't absorb JVM init.
    spark.range(1000).selectExpr("sum(id)").collect()
    // warm-up must never kill the run — a bad sfDir should surface as
    // per-query errors in the JSON, not as a silent crash with no output
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up read failed: ${e.getMessage}")
    }
    // Three timed runs per query in INTERLEAVED pass order
    // (A,B,C,…,A,B,C,…): run 1 absorbs one-shot plan codegen that
    // amortizes to nothing on a long-lived cluster, and interleaving
    // means an ambient-load spike (the round-6 artifact showed 2–4×
    // inflation on 4 queries despite min-of-2 back-to-back runs) hits
    // DIFFERENT queries each pass instead of both runs of the same
    // one — the min is then a trustworthy recurring-cost signal. The
    // max and the relative spread ((max−min)/min) are reported so the
    // driver can discount rows that were noisy anyway.
    // A failed run must NOT be timed as a (fast) success: a query with
    // ANY failed run lands in "errors"; its value is the min of the
    // successful runs, or -1 if none succeeded.
    // optional args: query names to bench (default all) — lets local
    // iteration time one hot query without paying for the whole suite
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(",")} — benching nothing " +
        "would read as 'no regression'")
    val picked = if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    // Sorted-name order: Map iteration order is arbitrary and changes as
    // queries are added, which made run-to-run artifacts incomparable.
    val names = picked.toSeq.sortBy(_._1)
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      names.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    (1 to nRuns).foreach { _ =>
      names.foreach { case (name, fn) =>
        dropCaches(spark)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          acc(name) = acc(name) :+ (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
      }
    }
    val results = acc.toSeq
    dropCaches(spark)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.minOption.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val qmax = results.map { case (k, v) => s"\"" + k + "\":" + v.maxOption.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val qspread = results.map { case (k, v) =>
      val sp = (for (mn <- v.minOption; mx <- v.maxOption)
        yield (mx - mn) / math.max(mn, 1e-9)).getOrElse(-1.0)
      s"\"" + k + "\":" + math.round(sp * 100.0) / 100.0
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v.size < nRuns => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2.minOption).sum
    val streaming = StreamBench.run(spark, sfDir)
    // Per-query detail first, compact total summary as the FINAL line:
    // the driver keeps only the output tail, and a 99-entry map on the
    // same line as the total previously truncated the total away.
    val lines = Seq(
      s"""{"metric":"queries","queries":$qs,"sf":"$sfDir"}""",
      s"""{"metric":"queries_max","queries":$qmax,"sf":"$sfDir"}""",
      s"""{"metric":"queries_rel_spread","queries":$qspread,"sf":"$sfDir"}""",
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir","runs":$nRuns,"agg":"min","order":"interleaved","errors":$errors,"streaming_rows_per_sec":$streaming,"full_artifact":"$benchOut"}""")
    // The driver's tail capture truncated ~2/3 of the round-8 per-query
    // map, blinding round-over-round diffs — so the FULL artifact also
    // lands in a file (path echoed in the total line above).
    try java.nio.file.Files.write(java.nio.file.Paths.get(benchOut),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $benchOut: ${e.getMessage}")
    }
    lines.foreach(println)
    spark.stop()
  }
}
