// scratch diagnostic: where does dedup_probe time go?
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stage split for the dedup_probe lane's warm ceiling (round 12 —
  * the AlertProfile treatment): parquet_sink's ceiling on the same
  * machine is ~12k rows/s while dedup_probe floors at ~2.1k, and no
  * round has said WHERE the 6× goes. Variants, each the shipped lane
  * minus one stage, all fed the same 8192 probe docs in 2048-row
  * micro-batches against the sf0.1 history index:
  *
  *  - `noop`   — probe rows through MemoryStream straight to the noop
  *               sink: micro-batch machinery floor, no dedup work.
  *  - `sig`    — bandIndexOf(probe) to noop: + shingle/minhash/band
  *               signature CPU on the stream side.
  *  - `full`   — the shipped [[graft.streaming.Pipeline
  *               .dedupProbeStream]]: + the stream-static band-bucket
  *               join and agreement filter against the cached index.
  *  - `prepart`— full, but the cached index is repartitioned AND
  *               sorted on the join keys BEFORE caching. Measured a
  *               WASH once full/prepart passes were INTERLEAVED (the
  *               sequential first cut read ~9% — warmup ordering on a
  *               lane whose curve is ±43% first-to-best): the executed
  *               plan broadcasts the batch-sized PROBE and streams the
  *               index through the join, so the static side's layout
  *               never binds.
  *  - `pruned` — the disk-backed skipping index
  *               ([[graft.analytics.TextOps.probePrunedBatch]] in
  *               foreachBatch): per-batch work O(batch + matching
  *               files) instead of the cached lanes' O(index) scan —
  *               slower at this toy index size, the only shape that
  *               holds when the index is corpus-sized.
  *
  * Reading: sig−noop = signature CPU, full−sig = join machinery,
  * prepart vs full = layout effect (null), pruned = the at-scale lane's
  * toy-scale constant.
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.analytics.TextOps
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.ingest.Sources.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val probeRows = docs.orderBy(col("doc_id")).limit(8192)
      .as[(Long, String, String, String)].collect()

    def onePass(tag: String, pass: Int)(mk: DataFrame => DataFrame): Unit = {
      val input = MemoryStream[(Long, String, String, String)](spark)
      val stream = input.toDF().toDF("doc_id", "text", "lang", "source")
      val q = mk(stream).writeStream
        .outputMode("append").format("noop").start()
      val t0 = System.nanoTime()
      try probeRows.grouped(2048).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      } finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[dprof] $tag%-8s pass$pass: ${probeRows.length / secs}%7.1f rows/s  ($secs%5.2f s)")
    }

    def run(tag: String)(mk: DataFrame => DataFrame): Unit =
      (1 to runs).foreach(onePass(tag, _)(mk))

    run("noop")(identity)
    run("sig")(TextOps.bandIndexOf)
    // full vs prepart INTERLEAVED (round-12 second cut): the first cut
    // ran every full pass, then every prepart pass, in one JVM — and
    // this lane's warmup curve is wide enough (±43% first-to-best,
    // README) that ordering alone can manufacture a variant gap.
    // Alternating passes hit both variants with the same warmup state.
    val plain = TextOps.bandIndexOf(docs).cache()
    val laid = graft.streaming.Pipeline.dedupIndexLayout(
      TextOps.bandIndexOf(docs)).cache()
    plain.count(); laid.count()
    (1 to runs).foreach { pass =>
      onePass("full", pass)(s =>
        graft.streaming.Pipeline.dedupProbeStream(s, plain))
      onePass("prepart", pass)(s =>
        graft.streaming.Pipeline.dedupProbeStream(s, laid))
    }
    plain.unpersist(blocking = true); laid.unpersist(blocking = true)

    // disk-backed skipping probe (round 12): the asymptotically right
    // lane — per-batch work O(batch + matching files), never O(index).
    // At THIS corpus (sf0.1, a 32-file toy index) each micro-batch
    // pays driver metadata pruning + a fresh pruned parquet read that
    // the in-memory cache lanes never pay, so expect it BELOW them
    // here; the lane exists because the cached lanes' per-batch cost
    // grows with the CORPUS while this one's grows with the batch.
    val idxDir = java.nio.file.Files.createTempDirectory("graft_dprof_idx_").toFile
    // per-pass checkpoint dirs are tracked and reaped with the index
    // dir (r12 ADVICE: they used to leak under /tmp across runs)
    val chkDirs = Vector.newBuilder[java.io.File]
    try {
      val idx = new java.io.File(idxDir, "idx").toString
      TextOps.dedupIndexWrite(TextOps.bandIndexOf(docs), idx)
      (1 to runs).foreach { pass =>
        val input = MemoryStream[(Long, String, String, String)](spark)
        val stream = input.toDF().toDF("doc_id", "text", "lang", "source")
        val chkFile = java.nio.file.Files
          .createTempDirectory("graft_dprof_chk_").toFile
        chkDirs += chkFile
        val chk = chkFile.toString
        val q = stream.writeStream.outputMode("append")
          .foreachBatch { (b: DataFrame, _: Long) =>
            TextOps.probePrunedBatch(b, idx)
              .write.mode("overwrite").format("noop").save()
          }
          .option("checkpointLocation", chk)
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
          .start()
        val t0 = System.nanoTime()
        try probeRows.grouped(2048).foreach { chunk =>
          input.addData(chunk.toSeq)
          q.processAllAvailable()
        } finally q.stop()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[dprof] pruned   pass$pass: ${probeRows.length / secs}%7.1f rows/s  ($secs%5.2f s)")
      }
    } finally {
      graft.sinks.Sinks.deleteRecursively(idxDir)
      chkDirs.result().foreach(graft.sinks.Sinks.deleteRecursively)
    }
    spark.stop()
  }
}
