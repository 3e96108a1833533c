package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-throughput microbench (VERDICT r4 #4): BENCH only measured
  * batch queries, but the reference's entire workload IS a stream — a
  * 1 msg/s Kafka replay of the 29,159-row river corpus
  * (reference: kafka/producer.py:43,47). This measures the engine's
  * rows/sec on that same corpus through the two production stream
  * paths, driven by MemoryStream exactly like the streaming specs:
  *
  *  - `parquet_sink`: wire-JSON rows → [[graft.streaming.Pipeline.parseWire]]
  *    → checkpointed parquet sink (the reference topology minus the
  *    broker). Fed in producer-sized chunks so the run spans several
  *    micro-batches, not one giant one.
  *  - `dedup_probe`: a document batch probing the static MinHash
  *    band-bucket history index ([[graft.streaming.Pipeline.dedupProbeStream]])
  *    — the streaming half of the incremental-dedup pair.
  *
  * Rates are end-to-end wall-clock (start → drained), so they include
  * micro-batch scheduling overhead — the honest number for a
  * micro-batch engine. The reference's envelope is 1 row/sec by
  * construction; anything in the thousands is >10^3× that.
  */
object StreamBench {

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sbench-$tag").toString

  /** Replay the river corpus as wire JSON through parse→parquet sink;
    * returns rows/sec.
    */
  private[graft] def parquetSinkRate(spark: SparkSession): Double = {
    import spark.implicits._
    import graft.streaming.Pipeline
    // Producer role (driver-side by design, like kafka/producer.py:
    // read the CSV, frame each row as a JSON message). 29k small
    // strings — not a data path.
    val corpus = graft.etl.Prep.referenceCsv
    val wire = Pipeline.toKafkaJson(graft.ingest.Sources.csv(spark, corpus))
      .as[String].collect()
    val input = MemoryStream[String](spark)
    val parsed = Pipeline.parseWire(
      input.toDF().select(col("value").cast("binary").as("value")))
    val out = tempDir("sink")
    val ckpt = tempDir("ckpt")
    // start the query FIRST, then feed chunk-by-chunk with a drain
    // between adds: MemoryStream has no admission control, so
    // pre-adding everything would plan ONE giant batch under
    // AvailableNow and the rate would overstate steady-state
    // multi-batch throughput. Interleaved drains force one micro-batch
    // per chunk — per-batch planning and commit cost included.
    val q = Pipeline.toParquetSink(parsed, out, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val t0 = System.nanoTime()
    try {
      wire.grouped(4096).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(out).count()
    require(rows == wire.length,
      s"sink lost rows: $rows of ${wire.length}")
    rows / secs
  }

  /** Probe a document batch against the full corpus' band-bucket
    * index; returns probe rows/sec.
    */
  private[graft] def dedupProbeRate(spark: SparkSession, sfDir: String): Double = {
    import spark.implicits._
    import graft.analytics.TextOps
    val docs = graft.ingest.Sources.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // static history index: built once, cached in the JOIN's layout —
    // the serving shape (a daily pipeline reads the materialized index,
    // not rebuilds it; round-12 DedupProfile measured the join-layout
    // cache worth ~9% because the static side then satisfies the join's
    // distribution+ordering from the cache every micro-batch)
    val index = graft.streaming.Pipeline.dedupIndexLayout(
      TextOps.bandIndexOf(docs)).cache()
    index.count()
    // probe batch: a bounded slice replayed as the "today" stream
    val probeRows = docs.orderBy(col("doc_id")).limit(8192)
      .as[(Long, String, String, String)].collect()
    val input = MemoryStream[(Long, String, String, String)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "lang", "source")
    val out = graft.streaming.Pipeline.dedupProbeStream(stream, index)
    val q = out.writeStream.outputMode("append").format("noop").start()
    val t0 = System.nanoTime()
    try {
      // drain per chunk (as parquetSinkRate does) so the rate reflects
      // steady-state multi-batch throughput, not one giant micro-batch
      probeRows.grouped(2048).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    index.unpersist(blocking = true)
    probeRows.length / secs
  }

  /** Readings/sec through the full stateful-alert → manifest-upsert
    * topology ([[graft.streaming.Pipeline.alertsToWarehouse]]): wire
    * parse, flatMapGroupsWithState, foreachBatch snapshot merge and
    * atomic commit all on the clock — the end-to-end cost of the
    * exactly-once alert table, not just the parse.
    */
  private[graft] def alertUpsertRate(spark: SparkSession,
      nSensors: Int = 64, tws: Boolean = false): Double = {
    import spark.implicits._
    import graft.streaming.Pipeline
    import graft.model.Schemas.SensorReading
    val input = MemoryStream[SensorReading](spark)
    // nSensors IS the state size (one AlertState per key): 64 = the
    // toy floor every round has tracked; pass 2048 for the many-key
    // shape where per-key store overhead dominates (the round-12
    // HDFS-vs-RocksDB decision needs both points). Total rows stay
    // 8192 so rates compare across state sizes — which caps nSensors
    // at 2048: below 4 readings per key the 3-consecutive streak
    // never completes and the produced-no-alerts require below fires
    // (correctly — a bench that emits nothing measured nothing).
    val rows = (0 until 8192).map { i =>
      val bad = (i / nSensors) % 8 < 4 // alternating bad/healthy runs
      SensorReading(f"S${i % nSensors}%04d",
        java.sql.Timestamp.valueOf(f"2024-01-01 ${i / nSensors / 60}%02d:${i / nSensors % 60}%02d:00"),
        Some(if (bad) 5.0f else 7.5f), Some(50f), Some(100f))
    }
    val dir = tempDir("alertwh")
    val mk = if (tws) Pipeline.alertsToWarehouseTws _
             else Pipeline.alertsToWarehouse _
    val q = mk(input.toDS(), s"$dir/gold",
      s"$dir/chk", org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val t0 = System.nanoTime()
    try {
      rows.grouped(2048).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    require(graft.sinks.ManifestTable.read(spark, s"$dir/gold").count() > 0,
      "alert warehouse bench produced no alerts")
    rows.length / secs
  }

  /** Readings/sec through the streaming exact-moment AR(1)
    * ([[graft.streaming.Pipeline.streamingAr1]]): per-batch state
    * fold + snapshot emission in Update mode — the cost of keeping a
    * live regression per sensor.
    */
  private[graft] def ar1Rate(spark: SparkSession): Double = {
    import spark.implicits._
    import graft.streaming.Pipeline
    import graft.model.Schemas.SensorReading
    val input = MemoryStream[SensorReading](spark)
    val nSensors = 64
    val rows = (0 until 8192).map { i =>
      SensorReading(f"S${i % nSensors}%03d",
        java.sql.Timestamp.valueOf(f"2024-01-01 ${i / nSensors / 60}%02d:${i / nSensors % 60}%02d:00"),
        Some(7.0f + (i % 13) * 0.1f), Some(50f), Some(100f))
    }
    val q = Pipeline.streamingAr1(input.toDS())
      .writeStream.outputMode("update").format("noop").start()
    val t0 = System.nanoTime()
    try {
      rows.grouped(2048).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    rows.length / secs
  }

  /** Runs the microbenches; returns the JSON object for the
    * `streaming_rows_per_sec` field. A failed microbench reports -1
    * rather than killing the batch bench artifact.
    */
  def run(spark: SparkSession,
          sfDir: String = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
            "/root/testdata/sf0.1")): String = {
    def guard(tag: String)(f: => Double): Double =
      try f catch { case e: Throwable =>
        System.err.println(s"[bench] streaming $tag failed: ${e.getMessage}")
        -1.0
      }
    val sink = guard("parquet_sink")(parquetSinkRate(spark))
    val probe = guard("dedup_probe")(dedupProbeRate(spark, sfDir))
    val alert = guard("alert_upsert")(alertUpsertRate(spark))
    val ar1 = guard("ar1_fit")(ar1Rate(spark))
    f"""{"parquet_sink":$sink%.1f,"dedup_probe":$probe%.1f,"alert_upsert":$alert%.1f,"ar1_fit":$ar1%.1f}"""
  }
}
