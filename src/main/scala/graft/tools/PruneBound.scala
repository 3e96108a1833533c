// scratch diagnostic: does the dedup skipping-index prune hold at real file counts?
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 instrument for VERDICT r12 #3: `dedupPrunedFiles` was
  * measured only against the toy 32-file index, but a 100 TB serving
  * index is ~10⁶ files and the prune runs once per MICRO-BATCH — so
  * its file-count scaling is a per-batch driver/latency question, not
  * a one-off. This measures the per-call prune latency against
  * SYNTHETIC manifests (manifest text written directly — the prune
  * never opens data files, so none need exist) of 32 → 10⁵ envelopes
  * laid contiguously over the packed 51-bit key space, for two lanes:
  *
  *  - `new`    — the shipped r13 shape: per-version broadcast interval
  *               index + distributed binary search, only matched NAMES
  *               collected (first call per version pays the
  *               build+broadcast; steady-state calls reuse it).
  *  - `legacy` — an inline replica of the r12 shape for A/B: re-read
  *               manifest, re-expand envelopes per band, re-broadcast
  *               a files-sized local relation, join, collect — all of
  *               it per call.
  *
  * Probes: 2048 docs (a fat micro-batch; its uniform md5 keys touch
  * nearly every file at these synthetic counts — worst-case collect)
  * and 64 docs (a thin batch where pruning actually skips). Reading:
  * `new` steady-state should be flat-ish in file count (log-factor
  * task work, matched-size collect); `legacy` should grow linearly —
  * the curve that motivated the rewrite.
  *
  * Round-14 APPENDED lane (r13 verdict #2: "measure the prune and the
  * verdict as tranche count grows, then ship the re-lay trigger"):
  * the SAME corpus laid as T ∈ {1..64} appended tranches over REAL
  * data files (total file count held ~constant at 64, so tranche
  * count — i.e. envelope overlap depth — is the only variable).
  * Measures per T: overlap depth, kept files for a 512-doc probe,
  * and the full probe→verdict seconds (file reads included); verdict
  * rows are checked IDENTICAL across every layout, and a final
  * [[graft.analytics.TextOps.compactDedupIndex]] row shows the
  * re-lay restoring the T=1 floor. The growth curve is what
  * `TextOps.DedupRelayDepth` bounds in production.
  *
  * args: [calls-per-cell] (default 10) [lane: synthetic|appended|all]
  * (default all)
  */
object PruneBound {

  /** Write a fake n-file manifest: contiguous bkey envelopes spanning
    * the full (band, bucket-prefix) key space, exactly the layout
    * [[graft.analytics.TextOps.dedupIndexWrite]] produces.
    */
  private def writeManifest(dir: java.io.File, n: Int): String = {
    val path = new java.io.File(dir, s"idx_$n")
    val mdir = new java.io.File(path, "_manifests")
    mdir.mkdirs()
    val span = graft.analytics.TextOps.LshBands.toDouble * (1L << 48).toDouble
    val lines = (0 until n).map { i =>
      val mn = span * i / n
      val mx = span * (i + 1) / n - 1.0
      f"f$i%06d.parquet\tbkey=$mn%s..$mx%s"
    }
    java.nio.file.Files.write(
      new java.io.File(mdir, "manifest-%09d".format(0)).toPath,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    path.toString
  }

  /** Inline replica of the round-12 dedupPrunedFiles shape (per-call
    * manifest read + band expansion + local-relation broadcast join),
    * kept ONLY as the A/B baseline for this measurement.
    */
  private def legacyPrune(spark: SparkSession, path: String,
      probeBanded: DataFrame): Int = {
    import graft.analytics.TextOps.LshBands
    val stats = graft.sinks.ManifestTable.snapshotStats(spark, path)
    val bandSpan = (1L << 48).toDouble
    val (enveloped, blind) = stats.partition(_._2.contains("bkey"))
    val envRows = enveloped.flatMap { case (f, st) =>
      val (mn, mx) = st("bkey")
      val bLo = math.max(0L, math.floor(mn / bandSpan).toLong)
      val bHi = math.min((LshBands - 1).toLong, math.floor(mx / bandSpan).toLong)
      (bLo to bHi).map(b => (f, b.toInt, mn, mx))
    }
    val bkey = col("band").cast("long") * (1L << 48) +
      expr("conv(substring(bucket, 1, 12), 16, 10)").cast("long")
    import spark.implicits._
    val env = envRows.toDF("f", "e_band", "mn", "mx")
    val hit = probeBanded.select(col("band"), bkey.as("bkey"))
      .join(broadcast(env), col("band") === col("e_band") &&
        col("bkey") >= col("mn") && col("bkey") <= col("mx"))
      .select(col("f")).distinct()
      .collect().map(_.getString(0)).toSeq
    (hit ++ blind.map(_._1)).distinct.size
  }

  /** The appended-layout lane, modeling the DAILY shape: each tranche
    * appends with a FIXED file count (DedupIndexFiles/4 = 8, the
    * append path's documented daily share), so T tranches leave 8·T
    * files whose envelopes each tile the key space once — overlap
    * depth ~T. Probed FAT (512 docs — a big micro-batch whose keys
    * blanket the space: kept-files = all of them at every T, so its
    * cost curve is pure file-count) and THIN (16 docs — the
    * steady-state micro-batch, where kept-files growth ∝ depth is
    * visible). Verdict rows are require()d identical across every
    * layout and after the final compaction.
    */
  private def appendedLane(spark: SparkSession, docs: DataFrame,
                           calls: Int): Unit = {
    import graft.analytics.TextOps
    val isBatch = graft.operators.Scale.isBatch(col("doc_id"))
    val hist = TextOps.bandIndexOf(docs.filter(!isBatch))
      .localCheckpoint(true)
    val probes = Seq(
      "fat512" -> docs.filter(isBatch).orderBy(col("doc_id")).limit(512)
        .localCheckpoint(true),
      "thin16" -> docs.filter(isBatch).orderBy(col("doc_id")).limit(16)
        .localCheckpoint(true))
    val baselines = scala.collection.mutable.Map.empty[String, Seq[String]]
    def checkAll(path: String, tag: String): Unit =
      probes.foreach { case (pname, pdocs) =>
        report(spark, s"$tag probe=$pname", path, pdocs, calls,
          verdict => {
            val b = baselines.getOrElseUpdate(pname, verdict)
            require(verdict == b,
              s"verdict diverged at $tag probe=$pname — layout must " +
                "be physically invisible")
          })
      }
    val dir = java.nio.file.Files.createTempDirectory("graft_tranche_").toFile
    try {
      for (t <- Seq(1, 4, 16, 64)) {
        val path = new java.io.File(dir, s"idx_t$t").toString
        (0 until t).foreach { i =>
          TextOps.dedupIndexAppend(hist.filter(col("doc_id") % t === i),
            path, files = math.max(1, TextOps.DedupIndexFiles / 4),
            relayDepth = 0): Unit
        }
        checkAll(path, s"tranches=$t")
        if (t == 64) {
          // the re-lay trigger's effect: one compaction restores the
          // write-layout floor on the SAME table
          val c0 = System.nanoTime()
          TextOps.compactDedupIndex(spark, path): Unit
          val compactMs = (System.nanoTime() - c0) / 1e6
          println(f"[tranchebound] compactDedupIndex on tranches=64 " +
            f"took $compactMs%.0f ms")
          checkAll(path, "tranches=64+compact")
        }
      }
    } finally graft.sinks.Sinks.deleteRecursively(dir)
  }

  private def report(spark: SparkSession, tag: String, path: String,
                     probeDocs: DataFrame, calls: Int,
                     check: Seq[String] => Unit): Unit = {
    import graft.analytics.TextOps
    val depth = TextOps.dedupIndexOverlapDepth(spark, path)
    val total = graft.sinks.ManifestTable.snapshotFiles(spark, path).size
    val probe = TextOps.bandIndexOf(probeDocs)
    // warm call pays the per-snapshot envelope build
    TextOps.dedupPrunedFiles(spark, path, probe): Unit
    var kept = 0
    val pruneTs = (1 to calls).map { _ =>
      val t0 = System.nanoTime()
      kept = TextOps.dedupPrunedFiles(spark, path, probe)._1.size
      (System.nanoTime() - t0) / 1e6
    }
    var verdict: Seq[String] = null
    val probeTs = (1 to calls).map { _ =>
      val t0 = System.nanoTime()
      val v = TextOps.probePrunedBatch(probeDocs, path)
      verdict = v.collect().map(_.toString).sorted.toSeq
      (System.nanoTime() - t0) / 1e6
    }
    check(verdict)
    println(f"[tranchebound] $tag%-20s depth=$depth%3d files=$total%3d " +
      f"kept=$kept%3d  prune: min=${pruneTs.min}%7.1f ms " +
      f"mean=${pruneTs.sum / pruneTs.size}%7.1f  " +
      f"probe+verdict: min=${probeTs.min}%8.1f ms " +
      f"mean=${probeTs.sum / probeTs.size}%8.1f")
  }

  def main(args: Array[String]): Unit = {
    val calls = args.headOption.map(_.toInt).getOrElse(10)
    val lane = args.lift(1).getOrElse("all")
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.analytics.TextOps
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.ingest.Sources.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

    if (lane == "appended" || lane == "all") appendedLane(spark, docs, calls)
    if (lane == "synthetic" || lane == "all") {

    val dir = java.nio.file.Files.createTempDirectory("graft_prunebound_").toFile
    try {
      for (probeDocs <- Seq(2048, 64)) {
        val probe = TextOps.bandIndexOf(docs.orderBy(col("doc_id"))
          .limit(probeDocs)).persist()
        probe.count()
        for (n <- Seq(32, 1024, 10240, 102400)) {
          val path = writeManifest(dir, n)
          // warm call builds + broadcasts the per-version envelope
          // index; timed separately — it's the once-per-snapshot cost
          val w0 = System.nanoTime()
          TextOps.dedupPrunedFiles(spark, path, probe)
          val warmMs = (System.nanoTime() - w0) / 1e6
          def time(f: => Int): (Double, Double, Int) = {
            var kept = 0
            val ts = (1 to calls).map { _ =>
              val t0 = System.nanoTime()
              kept = f
              (System.nanoTime() - t0) / 1e6
            }
            (ts.min, ts.sum / ts.size, kept)
          }
          val (nMin, nMean, nKept) =
            time(TextOps.dedupPrunedFiles(spark, path, probe)._1.size)
          val (lMin, lMean, lKept) = time(legacyPrune(spark, path, probe))
          println(f"[prunebound] probe=$probeDocs%5d files=$n%6d  " +
            f"new: min=$nMin%7.1f ms mean=$nMean%7.1f (build1st=$warmMs%7.1f, kept=$nKept%6d)  " +
            f"legacy: min=$lMin%7.1f ms mean=$lMean%7.1f (kept=$lKept%6d)")
          require(nKept == lKept,
            s"prune divergence at n=$n probe=$probeDocs: new=$nKept legacy=$lKept")
        }
        probe.unpersist(blocking = true): Unit
      }
    } finally graft.sinks.Sinks.deleteRecursively(dir)
    }
    spark.stop()
  }
}
