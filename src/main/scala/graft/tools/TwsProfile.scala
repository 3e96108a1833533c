// scratch diagnostic: WHY does the tws alert lane degrade with key count?
package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.model.Schemas.SensorReading
import graft.streaming.Pipeline
import graft.streaming.Pipeline.{Alert, AlertState, AlertThreshold}

/** Round-13 instrument for the one open watch item from round 12: the
  * `transformWithState` alert lane's throughput DEGRADES with key
  * count (1,068 → 788 rows/s at 64 → 2048 keys) while the
  * flatMapGroupsWithState twin is flat, and the chained-timer A/B
  * already refuted timer TRAFFIC as the cause. The two suspects left
  * are (a) per-key typed-state encode/decode + RocksDB point ops —
  * cost per TOUCHED key — and (b) some per-batch scan that grows with
  * TOTAL state (e.g. the timer column family). This tool separates
  * them with two experiments:
  *
  * **Experiment 1 — variant split at fixed row count** (8192 rows,
  * 64 vs 2048 keys, so keys-per-batch goes 64 → 2048 at constant
  * work):
  *  - `noop`  — a StatefulProcessor that drains rows and touches NO
  *              state and NO timers: the tws machinery floor
  *              (micro-batch + shuffle + RocksDB store open/commit).
  *  - `state` — the shipped alert fold with ValueState get/update but
  *              NO timer registration: + per-touched-key typed-state
  *              encode/decode and store point ops.
  *  - `full`  — the shipped [[Pipeline.AlertProcessor]] (state +
  *              chained eviction timers).
  *  - `fmgws` — the shipped [[Pipeline.alerts]]
  *              flatMapGroupsWithState twin on the default in-memory
  *              HDFS store: the flat reference.
  * Reading: state−noop at 64 vs 2048 keys = the per-touched-key term;
  * full−state = the timer term.
  *
  * **Experiment 2 — state-size trend at constant keys-per-batch**
  * (65,536 DISTINCT keys, one row each, fed in 2048-row batches: every
  * batch touches exactly 2048 fresh keys while TOTAL stored state
  * grows 2k → 64k across the run). Per-batch drain times are printed
  * every 4th batch. If per-batch time GROWS along the run, some cost
  * scales with total state (suspect b) and the lane cannot be called
  * bounded for many-million-key deployments; if it is FLAT, the
  * degradation is purely per-touched-key (suspect a) — linear in
  * batch's key count, flat in store size, safe at scale.
  *
  * args: [passes] [exp] (default 2, all; exp = 1 | 2 | all)
  */
object TwsProfile {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** tws machinery floor: drains rows, no state handle, no timers. */
  class NoopProcessor extends StatefulProcessor[String, SensorReading, Alert] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
    override def handleInputRows(key: String, rows: Iterator[SensorReading],
        timerValues: TimerValues): Iterator[Alert] = {
      rows.foreach(_ => ())
      Iterator.empty
    }
  }

  /** The shipped alert fold with ValueState but NO timers — isolates
    * typed-state encode/decode + RocksDB point ops from the timer
    * machinery. Emission logic identical to [[Pipeline.AlertProcessor]]
    * so the compared work differs ONLY in the timer calls.
    */
  class StateOnlyProcessor extends StatefulProcessor[String, SensorReading, Alert] {
    @transient private var state: ValueState[AlertState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[AlertState]("alert",
        Encoders.product[AlertState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SensorReading],
        timerValues: TimerValues): Iterator[Alert] = {
      val sorted = rows.toSeq.sortBy(r =>
        (Option(r.timestamp).map(_.getTime).getOrElse(0L), r.sensor_id))
      var st = if (state.exists()) state.get() else AlertState(0, 0L)
      val out = Seq.newBuilder[Alert]
      sorted.foreach { r =>
        val ms = Option(r.timestamp).map(_.getTime).getOrElse(st.lastEventMs)
        st =
          if (Pipeline.isOutOfBand(r)) {
            val n = st.consecutive + 1
            if (n == AlertThreshold)
              out += Alert(key, r.timestamp, n, r.ph_value, r.do_value)
            AlertState(n, ms)
          } else AlertState(0, ms)
      }
      state.update(st)
      out.result().iterator
    }
  }

  private def tws(readings: Dataset[SensorReading],
                  p: StatefulProcessor[String, SensorReading, Alert])
      : Dataset[Alert] = {
    implicit val alertEnc: org.apache.spark.sql.Encoder[Alert] =
      Encoders.product[Alert]
    readings
      .withWatermark("timestamp", "1 day")
      .groupByKey(_.sensor_id)(Encoders.STRING)
      .transformWithState(p, TimeMode.EventTime(), OutputMode.Append())
  }

  /** Same generator shape as StreamBench.alertUpsertRate: sensor i%n,
    * minute-resolution event times, alternating bad/healthy runs.
    */
  private def mkRows(nRows: Int, nKeys: Int): IndexedSeq[SensorReading] =
    (0 until nRows).map { i =>
      val bad = (i / nKeys) % 8 < 4
      SensorReading(f"S${i % nKeys}%06d",
        java.sql.Timestamp.valueOf(
          f"2024-01-01 ${i / nKeys / 60}%02d:${i / nKeys % 60}%02d:00"),
        Some(if (bad) 5.0f else 7.5f), Some(50f), Some(100f))
    }

  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(2)
    val exp = args.drop(1).headOption.getOrElse("all")
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def drive(tag: String, pass: Int, provider: String,
              rows: IndexedSeq[SensorReading],
              mk: Dataset[SensorReading] => DataFrame,
              perBatch: Boolean = false): Unit = {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      val input = MemoryStream[SensorReading](spark)
      val q = mk(input.toDS()).writeStream
        .outputMode("append").format("noop").start()
      val t0 = System.nanoTime()
      val batchSecs = Vector.newBuilder[Double]
      try rows.grouped(2048).foreach { chunk =>
        val b0 = System.nanoTime()
        input.addData(chunk.toSeq)
        q.processAllAvailable()
        batchSecs += (System.nanoTime() - b0) / 1e9
      } finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[twsprof] $tag%-24s pass$pass: ${rows.length / secs}%7.1f rows/s  ($secs%6.2f s)")
      if (perBatch) {
        val bs = batchSecs.result()
        val line = bs.zipWithIndex.collect {
          case (s, i) if i % 4 == 0 => f"b$i=$s%.2f"
        }.mkString(" ")
        println(s"[twsprof]   per-batch (state grows 2k->${bs.size * 2}k keys): $line")
      }
    }

    // Experiment 1: variant split, 8192 rows, 64 vs 2048 keys
    for (nKeys <- Seq(64, 2048); pass <- 1 to passes;
         if exp == "1" || exp == "all") {
      val rows = mkRows(8192, nKeys)
      drive(s"fmgws/k$nKeys", pass, HdfsProvider, rows,
        ds => Pipeline.alerts(ds).toDF())
      drive(s"tws_noop/k$nKeys", pass, RocksProvider, rows,
        ds => tws(ds, new NoopProcessor).toDF())
      drive(s"tws_state/k$nKeys", pass, RocksProvider, rows,
        ds => tws(ds, new StateOnlyProcessor).toDF())
      drive(s"tws_full/k$nKeys", pass, RocksProvider, rows,
        ds => Pipeline.alertsTws(ds).toDF())
    }

    // Experiment 2: 65,536 distinct keys, one row each — every batch
    // touches exactly 2048 FRESH keys while total stored state grows
    // 2k -> 64k; a per-batch time trend = cost scaling with TOTAL
    // state, flat = cost per touched key only
    val trendRows = mkRows(65536, 65536)
    for (pass <- 1 to passes; if exp == "2" || exp == "all") {
      drive("tws_state/trend64k", pass, RocksProvider, trendRows,
        ds => tws(ds, new StateOnlyProcessor).toDF(), perBatch = true)
      drive("tws_full/trend64k", pass, RocksProvider, trendRows,
        ds => Pipeline.alertsTws(ds).toDF(), perBatch = true)
      drive("fmgws/trend64k", pass, HdfsProvider, trendRows,
        ds => Pipeline.alerts(ds).toDF(), perBatch = true)
    }
    spark.stop()
  }
}
