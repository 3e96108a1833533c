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
  *               sorted on the join keys BEFORE caching: if the
  *               static side's per-batch exchange+sort is the cost,
  *               this recovers it (streaming micro-batches re-plan
  *               the static side every batch; a cache materialized
  *               in join layout satisfies the join's distribution and
  *               ordering requirements, so only the 2048-row probe
  *               side shuffles per batch).
  *
  * Reading: sig−noop = signature CPU, full−sig = join machinery,
  * prepart vs full = the recoverable fraction of the join cost.
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
    spark.stop()
  }
}
