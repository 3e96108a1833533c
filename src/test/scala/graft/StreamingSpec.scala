package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Schemas.SensorReading
import graft.streaming.Pipeline

class StreamingSpec extends SparkSpec {


  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def reading(id: String, t: String, ph: Float = 7.5f,
                      doSat: Float = 80f, tds: Float = 400f): SensorReading =
    SensorReading(id, ts(t), Some(ph), Some(doSat), Some(tds))

  test("wire parse: stringly JSON coerces to typed sensor readings") {
    import spark.implicits._
    val wire =
      """{"FullDate":"2023-01-01","WaterbodyName":"DARGLE_030",
        |"pH":"7.9","Dissolved Oxygen":"97.0","Conductivity @25°C":"244.0"}"""
        .stripMargin.replace("\n", "")
    val df = Pipeline.parseWire(Seq(wire).toDF("value"))
    val row = df.collect().head
    assert(row.getAs[String]("sensor_id") == "DARGLE_030")
    assert(row.getAs[Timestamp]("timestamp") == ts("2023-01-01 00:00:00"))
    assert(math.abs(row.getAs[Float]("ph_value") - 7.9f) < 1e-6)
    assert(df.columns.toSeq == Seq("sensor_id", "timestamp",
      "ph_value", "do_value", "tds_value"))
  }

  test("strict parse pins the reference's PERMISSIVE null-on-mismatch (SURVEY §1.3)") {
    import spark.implicits._
    // the actual wire fields don't match the sensor schema the
    // reference declares → every field parses to null
    val wire = """{"FullDate":"2023-01-01","WaterbodyName":"X","pH":"7.9"}"""
    val row = Pipeline.parseSensorStrict(Seq(wire).toDF("value")).collect().head
    assert((0 until row.length).forall(row.isNullAt))
  }

  test("watermarked tumbling windows: append emits finalized windows, drops late rows") {
    import spark.implicits._
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.windowedStats(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("win_out").start()
    try {
      input.addData(
        reading("A", "2024-01-01 00:10:00", ph = 7.0f),
        reading("A", "2024-01-01 00:20:00", ph = 8.0f),
        reading("A", "2024-01-01 01:10:00"))
      q.processAllAvailable()
      // nothing finalized yet — watermark still at batch-1 max - 1 day
      assert(spark.table("win_out").count() == 0)
      // jump event time 3 days ahead: watermark passes the old windows
      input.addData(reading("A", "2024-01-04 00:00:00"))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(col("window_start").cast("string"), col("n"), col("avg_ph"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("2024-01-01 00:00:00", 2L), ("2024-01-01 01:00:00", 1L)))
      // a row older than watermark is dropped, not re-emitted
      input.addData(reading("A", "2024-01-01 00:30:00"))
      input.addData(reading("A", "2024-01-06 00:00:00"))
      q.processAllAvailable()
      val n0010 = spark.table("win_out")
        .filter(col("window_start") === ts("2024-01-01 00:00:00")).count()
      assert(n0010 == 1, "late row re-opened a finalized window")
    } finally q.stop()
  }

  test("session windows merge readings within the 30-minute gap") {
    import spark.implicits._
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.sessionStats(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      input.addData(
        reading("A", "2024-01-01 00:00:00"),
        reading("A", "2024-01-01 00:10:00"),   // same session
        reading("A", "2024-01-01 01:00:00"),   // > 30 min gap → new session
        reading("B", "2024-01-01 00:05:00"))
      input.addData(reading("A", "2024-01-04 00:00:00")) // advance watermark
      q.processAllAvailable()
      val sess = spark.table("sess_out")
        .filter(col("session_start") < ts("2024-01-02 00:00:00"))
        .select(col("sensor_id"), col("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(sess == Set(("A", 2L), ("A", 1L), ("B", 1L)))
    } finally q.stop()
  }

  test("alert state machine: 3 consecutive out-of-band readings fire once; healthy resets") {
    import spark.implicits._
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.alerts(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("alert_out").start()
    try {
      input.addData(
        reading("A", "2024-01-01 00:00:00", ph = 5.0f),  // bad 1
        reading("A", "2024-01-01 00:10:00", ph = 5.1f),  // bad 2
        reading("A", "2024-01-01 00:20:00", ph = 5.2f),  // bad 3 → alert
        reading("A", "2024-01-01 00:30:00", ph = 5.3f),  // bad 4, no new alert
        reading("B", "2024-01-01 00:00:00", ph = 5.0f),
        reading("B", "2024-01-01 00:10:00", ph = 7.5f),  // healthy reset
        reading("B", "2024-01-01 00:20:00", ph = 5.1f),
        reading("B", "2024-01-01 00:30:00", ph = 5.2f))  // only 2 consecutive
      q.processAllAvailable()
      val alerts = spark.table("alert_out").collect()
      assert(alerts.length == 1, s"expected exactly 1 alert: ${alerts.toSeq}")
      val a = alerts.head
      assert(a.getAs[String]("sensor_id") == "A")
      assert(a.getAs[Timestamp]("alert_time") == ts("2024-01-01 00:20:00"))
      assert(a.getAs[Int]("n_consecutive") == 3)
      // the streak persists across micro-batches: a 5th consecutive bad
      // reading continues the same streak and must not re-fire
      input.addData(reading("A", "2024-01-01 00:40:00", ph = 5.0f))
      q.processAllAvailable()
      assert(spark.table("alert_out").count() == 1)
    } finally q.stop()
  }

  test("transformWithState alert machine matches the flatMapGroupsWithState semantics") {
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.alertsTws(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("alert_tws_out").start()
    try {
      input.addData(
        reading("A", "2024-01-01 00:00:00", ph = 5.0f),  // bad 1
        reading("A", "2024-01-01 00:10:00", ph = 5.1f),  // bad 2
        reading("A", "2024-01-01 00:20:00", ph = 5.2f),  // bad 3 → alert
        reading("A", "2024-01-01 00:30:00", ph = 5.3f),  // bad 4, no new alert
        reading("B", "2024-01-01 00:00:00", ph = 5.0f),
        reading("B", "2024-01-01 00:10:00", ph = 7.5f),  // healthy reset
        reading("B", "2024-01-01 00:20:00", ph = 5.1f),
        reading("B", "2024-01-01 00:30:00", ph = 5.2f))  // only 2 consecutive
      q.processAllAvailable()
      val alerts = spark.table("alert_tws_out").collect()
      assert(alerts.length == 1, s"expected exactly 1 alert: ${alerts.toSeq}")
      val a = alerts.head
      assert(a.getAs[String]("sensor_id") == "A")
      assert(a.getAs[Timestamp]("alert_time") == ts("2024-01-01 00:20:00"))
      assert(a.getAs[Int]("n_consecutive") == 3)
      // streak continues across micro-batches without re-firing
      input.addData(reading("A", "2024-01-01 00:40:00", ph = 5.0f))
      q.processAllAvailable()
      assert(spark.table("alert_tws_out").count() == 1)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("checkpointed parquet sink is exactly-once across AvailableNow restarts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[SensorReading](spark)
    input.addData(reading("A", "2024-01-01 00:00:00"),
      reading("B", "2024-01-01 00:05:00"))
    val q1 = Pipeline.toParquetSink(input.toDF(), s"$dir/data", s"$dir/chk")
    q1.awaitTermination()
    assert(spark.read.parquet(s"$dir/data").count() == 2)
    // restart with the same checkpoint: already-committed batch not rewritten
    input.addData(reading("C", "2024-01-01 00:10:00"))
    val q2 = Pipeline.toParquetSink(input.toDF(), s"$dir/data", s"$dir/chk")
    q2.awaitTermination()
    val out = spark.read.parquet(s"$dir/data")
    assert(out.count() == 3, "restart duplicated or dropped rows")
    assert(out.select("sensor_id").distinct().count() == 3)
  }

  test("ProcessingTime soak: continuous trigger, mid-stream kill, exactly-once recovery") {
    // the reference's ACTUAL run mode (spark_processor.py:43-50):
    // a forever-running ProcessingTime job. Feed it while it runs,
    // kill it mid-stream (not at a drain boundary), restart from the
    // checkpoint, drain, and demand exactly-once end to end.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val input = MemoryStream[SensorReading](spark)
    val ids = (1 to 40).map(i => f"S$i%02d")
    input.addData(ids.take(10).map(id => reading(id, "2024-01-01 00:00:00")): _*)
    val q1 = Pipeline.toParquetSink(input.toDF(), s"$dir/data", s"$dir/chk",
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      // keep feeding WHILE the continuous trigger runs
      val deadline = System.currentTimeMillis() + 30000
      var fed = 10
      while (fed < 40 && System.currentTimeMillis() < deadline) {
        input.addData(ids.slice(fed, fed + 10)
          .map(id => reading(id, "2024-01-01 00:00:00")): _*)
        fed += 10
        Thread.sleep(120)
      }
      assert(fed == 40, "feeder starved")
      // wait until the job has committed SOMETHING but not necessarily
      // everything, then kill it mid-stream. Probe with an actual read:
      // the data DIR existing is not enough — under load the first
      // batch may not have committed yet, and a schema-less read after
      // the kill would fail the fixture, not the contract
      def committed(): Long =
        try spark.read.parquet(s"$dir/data").count()
        catch { case _: org.apache.spark.sql.AnalysisException => -1L }
      while (committed() < 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally q1.stop()
    q1.awaitTermination()
    val afterKill = spark.read.parquet(s"$dir/data").count()
    assert(afterKill >= 1, "soak fixture: nothing committed before the kill")
    // restart from the same checkpoint and drain the remainder
    val q2 = Pipeline.toParquetSink(input.toDF(), s"$dir/data", s"$dir/chk")
    q2.awaitTermination()
    val out = spark.read.parquet(s"$dir/data")
    assert(out.count() == 40,
      s"exactly-once violated: ${out.count()} rows for 40 fed (pre-kill $afterKill)")
    assert(out.select("sensor_id").distinct().count() == 40,
      "duplicate sensor rows after recovery")
  }

  test("streaming WQI windows equal the batch WQI on the same readings") {
    import spark.implicits._
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.wqiWindowed(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("wqi_out").start()
    try {
      val rows = Seq(
        reading("A", "2024-01-01 00:10:00", ph = 7.5f),
        reading("A", "2024-01-01 00:40:00", ph = 6.9f),
        reading("A", "2024-01-01 01:15:00", ph = 5.0f),
        reading("B", "2024-01-01 00:05:00", ph = 8.2f))
      input.addData(rows: _*)
      // advance the watermark past the windows so append finalizes them
      input.addData(reading("W", "2024-01-03 00:00:00", ph = 7.0f))
      q.processAllAvailable()
      val got = spark.table("wqi_out").collect()
        .map(r => (r.getAs[String]("sensor_id"),
          r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[Long]("n"), r.getAs[Double]("avg_wqi"))).toSet
      // batch twin over the identical rows and window arithmetic
      val batch = rows.toDF()
        .withColumn("wqi", graft.analytics.Quality.wqiRaw(
          col("ph_value"), col("do_value"), col("tds_value")))
        .groupBy(window(col("timestamp"), "1 hour"), col("sensor_id"))
        .agg(count(col("wqi")).as("n"), round(avg(col("wqi")), 4).as("avg_wqi"))
        .select(col("window.start").as("ws"), col("sensor_id"),
          col("n"), col("avg_wqi"))
        .collect()
        .map(r => (r.getAs[String]("sensor_id"),
          r.getAs[java.sql.Timestamp]("ws"),
          r.getAs[Long]("n"), r.getAs[Double]("avg_wqi"))).toSet
      assert(batch.subsetOf(got), s"stream $got missing batch windows $batch")
    } finally q.stop()
  }

  test("streaming heavy hitters: bounded sketch state converges on the exact top-k") {
    import spark.implicits._
    val input = MemoryStream[(String, String)](spark)
    val out = Pipeline.streamingTopTokens(
      input.toDF().toDF("lang", "text"), k = 5)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("hh_out").start()
    try {
      // skewed stream: token w<i> appears ~ proportionally to i, fed
      // over several micro-batches and interleaved
      val rng = new scala.util.Random(7)
      val words = (1 to 40).flatMap(i => Seq.fill(i * 3)(s"w$i"))
      val shuffled = rng.shuffle(words)
      shuffled.grouped(600).foreach { chunk =>
        input.addData(chunk.grouped(20).map(g => ("en", g.mkString(" "))).toSeq: _*)
        q.processAllAvailable()
      }
      // LAST emission for the lang (max batch in memory sink = latest
      // update rows; memory sink in update mode appends every update,
      // so take the final k rows by recency: re-derive from the table
      // by taking rows with the highest est per rank)
      val rows = spark.table("hh_out").collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rnk"),
          r.getAs[String]("tok"), r.getAs[Long]("est")))
      // final state = the last emission: for each rank, the emission
      // with the largest est is the latest (counts only grow)
      val finalTop = rows.groupBy(_._2).map { case (rnk, rs) =>
        rnk -> rs.maxBy(_._4)
      }.toSeq.sortBy(_._1).map(_._2)
      val exact = words.groupBy(identity).map { case (w, xs) => w -> xs.size }
      val exactTop = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(5)
      // one-sided estimates and exact heavy-hitter recovery on the
      // skewed fixture (top-5 separated by ≥ 3 occurrences)
      finalTop.foreach { case (_, _, tok, est) =>
        assert(est >= exact(tok), s"$tok underestimated")
      }
      assert(finalTop.map(_._3).toSet == exactTop.map(_._1).toSet,
        s"streamed top-5 ${finalTop.map(_._3)} != exact ${exactTop.map(_._1)}")
    } finally q.stop()
  }

  test("manifest-dim enrichment: a dimension commit becomes visible at the next batch boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dimjoin").toString
    val dimPath = s"$dir/dim"
    // dimension snapshot v0
    graft.sinks.ManifestTable.replace(
      Seq(("A", "river1", "basinX"), ("B", "river2", "basinY"))
        .toDF("sensor_id", "river", "basin"), dimPath)
    val input = MemoryStream[SensorReading](spark)
    input.addData(reading("A", "2024-01-01 00:00:00"),
      reading("C", "2024-01-01 00:00:00")) // C unknown in v0
    val q1 = Pipeline.enrichAgainstManifest(input.toDF(), dimPath,
      s"$dir/out", s"$dir/chk")
    q1.awaitTermination()
    val round1 = spark.read.parquet(s"$dir/out").collect()
      .map(r => r.getAs[String]("sensor_id") ->
        Option(r.getAs[String]("river"))).toMap
    assert(round1 == Map("A" -> Some("river1"), "C" -> None))
    // SCD update: one atomic manifest commit rewrites the dimension
    graft.sinks.ManifestTable.replace(
      Seq(("A", "river1-renamed", "basinX"), ("C", "river3", "basinZ"))
        .toDF("sensor_id", "river", "basin"), dimPath)
    input.addData(reading("A", "2024-01-01 01:00:00"),
      reading("C", "2024-01-01 01:00:00"))
    val q2 = Pipeline.enrichAgainstManifest(input.toDF(), dimPath,
      s"$dir/out", s"$dir/chk")
    q2.awaitTermination()
    val all = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[String]("sensor_id"),
        r.getAs[java.sql.Timestamp]("timestamp"),
        Option(r.getAs[String]("river"))))
    // batch-1 rows keep their v0 enrichment; batch-2 rows see v1 —
    // the commit landed exactly at the batch boundary
    assert(all.toSet == Set(
      ("A", ts("2024-01-01 00:00:00"), Some("river1")),
      ("C", ts("2024-01-01 00:00:00"), None),
      ("A", ts("2024-01-01 01:00:00"), Some("river1-renamed")),
      ("C", ts("2024-01-01 01:00:00"), Some("river3"))), all.toSeq)
  }

  test("alert warehouse egress: mid-stream kill, restart, alert table exactly-once by identity") {
    // the reference's alert intent landing in the warehouse seam:
    // stateful alert stream -> foreachBatch upsert into a
    // ManifestTable keyed on (sensor_id, alert_time). foreachBatch is
    // at-least-once; the key-replace merge must make the table
    // exactly-once across a mid-stream kill + checkpoint restart.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_alert_wh").toString
    val input = MemoryStream[SensorReading](spark)
    val ids = (1 to 12).map(i => f"S$i%02d")
    def badRun(id: String) = Seq(
      reading(id, "2024-01-01 00:00:00", ph = 5.0f),
      reading(id, "2024-01-01 00:10:00", ph = 5.1f),
      reading(id, "2024-01-01 00:20:00", ph = 5.2f)) // 3rd fires
    input.addData(ids.take(3).flatMap(badRun): _*)
    val q1 = Pipeline.alertsToWarehouse(input.toDS(), s"$dir/gold",
      s"$dir/chk", Trigger.ProcessingTime("50 milliseconds"))
    try {
      val deadline = System.currentTimeMillis() + 30000
      var fed = 3
      while (fed < 12 && System.currentTimeMillis() < deadline) {
        input.addData(ids.slice(fed, fed + 3).flatMap(badRun): _*)
        fed += 3
        Thread.sleep(120)
      }
      assert(fed == 12, "feeder starved")
      // kill once at least one snapshot is live (mid-stream, not a
      // drain boundary)
      while (graft.sinks.ManifestTable.latestVersion(spark, s"$dir/gold").isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally q1.stop()
    q1.awaitTermination()
    // restart from the same checkpoint, drain the remainder
    val q2 = Pipeline.alertsToWarehouse(input.toDS(), s"$dir/gold", s"$dir/chk")
    q2.awaitTermination()
    val gold = graft.sinks.ManifestTable.read(spark, s"$dir/gold")
    val rows = gold.collect()
    assert(rows.length == 12,
      s"exactly-once violated: ${rows.length} alert rows for 12 sensors")
    assert(rows.map(r => (r.getAs[String]("sensor_id"),
      r.getAs[Timestamp]("alert_time"))).toSet ==
      ids.map(id => (id, ts("2024-01-01 00:20:00"))).toSet,
      "alert identities drifted across the kill/restart")
    assert(rows.forall(_.getAs[Int]("n_consecutive") == 3))
  }

  test("tws alert warehouse: mid-stream kill, restart, exactly-once on RocksDB") {
    // the transformWithState twin of the soak above (round 12): same
    // foreachBatch -> ManifestTable egress, the Spark-4-native state
    // API as the stateful stage, RocksDB as the (required) store —
    // the exactly-once contract must hold identically across a
    // mid-stream kill + checkpoint restart before the twin can be a
    // candidate default.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_alert_tws_wh").toString
      val input = MemoryStream[SensorReading](spark)
      val ids = (1 to 12).map(i => f"T$i%02d")
      def badRun(id: String) = Seq(
        reading(id, "2024-01-01 00:00:00", ph = 5.0f),
        reading(id, "2024-01-01 00:10:00", ph = 5.1f),
        reading(id, "2024-01-01 00:20:00", ph = 5.2f)) // 3rd fires
      input.addData(ids.take(3).flatMap(badRun): _*)
      val q1 = Pipeline.alertsToWarehouseTws(input.toDS(), s"$dir/gold",
        s"$dir/chk", Trigger.ProcessingTime("50 milliseconds"))
      try {
        val deadline = System.currentTimeMillis() + 30000
        var fed = 3
        while (fed < 12 && System.currentTimeMillis() < deadline) {
          input.addData(ids.slice(fed, fed + 3).flatMap(badRun): _*)
          fed += 3
          Thread.sleep(120)
        }
        assert(fed == 12, "feeder starved")
        while (graft.sinks.ManifestTable.latestVersion(spark, s"$dir/gold").isEmpty &&
               System.currentTimeMillis() < deadline) Thread.sleep(50)
      } finally q1.stop()
      q1.awaitTermination()
      val q2 = Pipeline.alertsToWarehouseTws(input.toDS(), s"$dir/gold",
        s"$dir/chk")
      q2.awaitTermination()
      val gold = graft.sinks.ManifestTable.read(spark, s"$dir/gold")
      val rows = gold.collect()
      assert(rows.length == 12,
        s"exactly-once violated: ${rows.length} alert rows for 12 sensors")
      assert(rows.map(r => (r.getAs[String]("sensor_id"),
        r.getAs[Timestamp]("alert_time"))).toSet ==
        ids.map(id => (id, ts("2024-01-01 00:20:00"))).toSet,
        "alert identities drifted across the kill/restart")
      assert(rows.forall(_.getAs[Int]("n_consecutive") == 3))
    } finally prevProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("kafka-sink framing round-trips through the wire parser") {
    import spark.implicits._
    val canonical = Seq(reading("DARGLE_030", "2023-01-01 00:00:00",
      7.9f, 97.0f, 244.0f)).toDS()
    // canonical → reference wire names → JSON value → parse back
    val wire = canonical.select(
      date_format(col("timestamp"), "yyyy-MM-dd").as("FullDate"),
      col("sensor_id").as("WaterbodyName"),
      col("ph_value").cast("string").as("pH"),
      col("do_value").cast("string").as("Dissolved Oxygen"),
      col("tds_value").cast("string").as("Conductivity @25°C"))
    val parsed = Pipeline.parseWire(Pipeline.toKafkaJson(wire))
    val r = parsed.collect().head
    assert(r.getAs[String]("sensor_id") == "DARGLE_030")
    assert(math.abs(r.getAs[Float]("do_value") - 97.0f) < 1e-6)
  }

  test("streaming dedup drops exact duplicates within the watermark horizon") {
    import spark.implicits._
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.dedupStream(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      val r = reading("A", "2024-01-01 00:00:00")
      input.addData(r, r, reading("A", "2024-01-01 00:10:00"))
      q.processAllAvailable()
      input.addData(r) // duplicate arriving in a later micro-batch
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("retransmit dedup: jittered duplicates collapse, evicted state re-admits") {
    import spark.implicits._
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.dedupRetransmits(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("retrans_out").start()
    try {
      // same payload re-sent 10 min later with a jittered timestamp:
      // (key, timestamp) dedup would keep both; payload dedup keeps one
      input.addData(
        reading("A", "2024-01-01 00:00:00"),
        reading("A", "2024-01-01 00:10:00"),
        reading("B", "2024-01-01 00:00:00", ph = 6.9f))
      q.processAllAvailable()
      assert(spark.table("retrans_out").count() == 2,
        "jittered retransmit not collapsed")
      // advance the watermark far past the delay, then repeat A's
      // payload: its dedup state must have been EVICTED — a genuine
      // recurrence of the same measurement a day later passes
      input.addData(reading("C", "2024-01-02 12:00:00", ph = 8.1f))
      q.processAllAvailable()
      input.addData(reading("A", "2024-01-02 11:30:00"))
      q.processAllAvailable()
      assert(spark.table("retrans_out").count() == 4,
        "evicted payload should be re-admitted after the horizon")
    } finally q.stop()
  }

  test("stream-static enrichment joins each reading to its dimension row, statelessly") {
    import spark.implicits._
    val dim = Seq(
      ("A", "Dargle", "Eastern"),
      ("B", "Liffey", "Eastern")).toDF("sensor_id", "river", "basin")
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.enrichReadings(input.toDF(), dim)
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    try {
      input.addData(
        reading("A", "2024-01-01 00:00:00"),
        reading("C", "2024-01-01 00:05:00")) // no dim row -> kept with nulls
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => (r.getAs[String]("sensor_id"), Option(r.getAs[String]("river"))))
        .toSet
      assert(rows == Set(("A", Some("Dargle")), ("C", None)))
      // stateless: a stream-static join keeps no state-store rows
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not allocate streaming state")
    } finally q.stop()
  }

  test("stream-stream interval join matches readings to in-window calibrations") {
    import spark.implicits._
    val readings = MemoryStream[SensorReading](spark)
    val cals = MemoryStream[Pipeline.Calibration](spark)
    val q = Pipeline.joinCalibration(readings.toDF(), cals.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("cal_out").start()
    try {
      cals.addData(Pipeline.Calibration("A", ts("2024-01-01 00:00:00"), 0.5f))
      readings.addData(
        reading("A", "2024-01-01 00:10:00", ph = 7.0f), // in window -> joins
        reading("A", "2024-01-01 02:30:00", ph = 7.2f), // past window -> dropped
        reading("B", "2024-01-01 00:10:00"))            // no calibration
      q.processAllAvailable()
      val rows = spark.table("cal_out").collect()
      assert(rows.length == 1, s"expected exactly 1 joined row: ${rows.toSeq}")
      val r = rows.head
      assert(r.getAs[String]("sensor_id") == "A")
      assert(math.abs(r.getAs[Float]("ph_calibrated") - 7.5f) < 1e-6)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched readings only after watermark") {
    import spark.implicits._
    val readings = MemoryStream[SensorReading](spark)
    val cals = MemoryStream[Pipeline.Calibration](spark)
    val q = Pipeline.joinCalibrationOuter(readings.toDF(), cals.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("cal_outer_out").start()
    try {
      cals.addData(Pipeline.Calibration("A", ts("2024-01-01 00:00:00"), 0.5f))
      readings.addData(
        reading("A", "2024-01-01 00:10:00", ph = 7.0f), // matches
        reading("B", "2024-01-01 00:10:00", ph = 6.0f)) // no calibration
      q.processAllAvailable()
      // B must be HELD, not dropped and not emitted: the watermark has
      // not yet proven its calibration can no longer arrive
      val early = spark.table("cal_outer_out").collect()
        .map(_.getAs[String]("sensor_id")).toSet
      assert(early == Set("A"), s"premature/missing emission: $early")
      // push both watermarks far past the join window...
      cals.addData(Pipeline.Calibration("Z", ts("2024-01-02 12:00:00"), 0f))
      readings.addData(reading("Z", "2024-01-02 12:00:00"))
      q.processAllAvailable()
      // ...outer null-side results can surface one trigger later (state
      // eviction happens when a batch RUNS with the advanced watermark)
      readings.addData(reading("Z", "2024-01-02 13:00:00"))
      q.processAllAvailable()
      val rows = spark.table("cal_outer_out").collect()
      val b = rows.filter(_.getAs[String]("sensor_id") == "B")
      assert(b.length == 1, s"expected exactly one outer row for B: ${rows.toSeq}")
      assert(b.head.isNullAt(b.head.fieldIndex("offset")),
        "unmatched reading must carry a null offset")
      assert(math.abs(b.head.getAs[Float]("ph_calibrated") - 6.0f) < 1e-6,
        "unmatched reading must keep its raw value")
      // matched rows never double-emit through the outer path
      assert(rows.count(_.getAs[String]("sensor_id") == "A") == 1)
    } finally q.stop()
  }

  test("windowed stream agg equals batch brute-force on a random stream (property)") {
    import spark.implicits._
    // deterministic pseudo-random stream of readings over 2 days
    val rng = new scala.util.Random(2024)
    val readings = (0 until 500).map { i =>
      val minute = rng.nextInt(48 * 60)
      reading(s"S${rng.nextInt(5)}",
        f"2024-01-0${1 + minute / 1440}%d ${(minute / 60) % 24}%02d:${minute % 60}%02d:00",
        ph = 6.0f + rng.nextFloat() * 3.0f)
    }
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.windowedStats(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("prop_out").start()
    try {
      readings.grouped(100).foreach { batch => input.addData(batch: _*) }
      input.addData(reading("S0", "2024-01-10 00:00:00")) // flush watermark
      q.processAllAvailable()
      val streamed = spark.table("prop_out")
        .filter(col("window_start") < ts("2024-01-05 00:00:00"))
        .select(col("window_start"), col("sensor_id"), col("n"), col("avg_ph"))
      val batch = readings.toDS()
        .groupBy(date_trunc("hour", col("timestamp")).as("window_start"),
          col("sensor_id"))
        .agg(count(lit(1)).as("n"), avg(col("ph_value")).as("avg_ph"))
      assert(streamed.count() == batch.count())
      assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
    } finally q.stop()
  }

  test("hopping stream agg equals the batch hopping aggregation (property)") {
    import spark.implicits._
    val rng = new scala.util.Random(4096)
    val readings = (0 until 400).map { i =>
      val minute = rng.nextInt(24 * 60)
      reading(s"S${rng.nextInt(4)}",
        f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00",
        ph = 6.0f + rng.nextFloat() * 3.0f)
    }
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.hoppingStats(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("hop_out").start()
    try {
      readings.grouped(80).foreach { batch => input.addData(batch: _*) }
      input.addData(reading("S0", "2024-01-10 00:00:00")) // flush watermark
      q.processAllAvailable()
      val streamed = spark.table("hop_out")
        .filter(col("window_start") < ts("2024-01-05 00:00:00"))
      val batch = readings.toDS()
        .groupBy(window(col("timestamp"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), avg(col("ph_value")).as("avg_ph"))
        .select(col("window.start").as("window_start"), col("n"), col("avg_ph"))
      assert(streamed.count() == batch.count())
      assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
      // every reading is counted exactly 4 times across overlapping windows
      assert(streamed.agg(sum(col("n"))).head().getLong(0) == 4L * readings.size)
    } finally q.stop()
  }

  test("rate replay source (T8) is a streaming source with the documented schema") {
    val df = graft.ingest.Sources.rateStream(spark, rowsPerSecond = 5)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("timestamp", "value"))
  }

  test("mapGroupsWithState running stats update across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.runningStats(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("stats_out").start()
    try {
      input.addData(
        reading("A", "2024-01-01 00:00:00", ph = 7.0f),
        reading("A", "2024-01-01 00:10:00", ph = 8.0f))
      q.processAllAvailable()
      input.addData(reading("A", "2024-01-01 00:20:00", ph = 9.0f))
      q.processAllAvailable()
      // memory sink in update mode appends each emitted snapshot;
      // the LAST snapshot for A must aggregate all three readings
      val snaps = spark.table("stats_out")
        .filter(col("sensor_id") === "A").collect()
      val last = snaps.maxBy(_.getAs[Long]("n"))
      assert(last.getAs[Long]("n") == 3)
      assert(math.abs(last.getAs[Double]("mean_ph") - 8.0) < 1e-6)
    } finally q.stop()
  }

  test("streaming AR(1): snapshot after N batches equals the batch exact-moment fit") {
    import spark.implicits._
    val input = MemoryStream[SensorReading](spark)
    val q = Pipeline.streamingAr1(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("ar1_out").start()
    // pH series per sensor, streamed in three batches (one row
    // arriving out of order / replayed must be ignored)
    val seriesA = Seq(7.0f, 7.4f, 7.2f, 7.9f, 7.5f, 7.7f)
    val seriesB = Seq(6.5f, 6.6f, 6.9f, 6.4f)
    def t(i: Int) = f"2024-01-01 ${i}%02d:00:00"
    try {
      input.addData(
        seriesA.take(2).zipWithIndex.map { case (p, i) => reading("A", t(i), ph = p) } ++
          seriesB.take(1).zipWithIndex.map { case (p, i) => reading("B", t(i), ph = p) }: _*)
      q.processAllAvailable()
      input.addData(
        seriesA.slice(2, 4).zipWithIndex.map { case (p, i) => reading("A", t(i + 2), ph = p) } ++
          seriesB.slice(1, 3).zipWithIndex.map { case (p, i) => reading("B", t(i + 1), ph = p) } :+
          reading("A", t(0), ph = 9.9f): _*) // replay: at/before last ts, must be skipped
      q.processAllAvailable()
      input.addData(
        seriesA.slice(4, 6).zipWithIndex.map { case (p, i) => reading("A", t(i + 4), ph = p) } ++
          seriesB.slice(3, 4).zipWithIndex.map { case (p, i) => reading("B", t(i + 3), ph = p) }: _*)
      q.processAllAvailable()
      def fit(series: Seq[Float]): (Long, Double, Double) = {
        val cents = series.map(p => math.round(p * 100.0))
        val pairs = cents.zip(cents.tail)
        val n = pairs.length.toDouble
        val sx = pairs.map(_._1).sum.toDouble; val sy = pairs.map(_._2).sum.toDouble
        val sxy = pairs.map(t2 => t2._1 * t2._2).sum.toDouble
        val sxx = pairs.map(t2 => t2._1 * t2._1).sum.toDouble
        val den = n * sxx - sx * sx
        val phi = (n * sxy - sx * sy) / den
        (pairs.length.toLong, phi, (sy - phi * sx) / n)
      }
      val out = spark.table("ar1_out").collect()
      for ((sid, series) <- Seq("A" -> seriesA, "B" -> seriesB)) {
        val last = out.filter(_.getAs[String]("sensor_id") == sid)
          .maxBy(_.getAs[Long]("n_pairs"))
        val (nP, phi, mu) = fit(series)
        assert(last.getAs[Long]("n_pairs") == nP, s"$sid pairs")
        assert(last.getAs[Double]("phi") == phi, s"$sid phi not bit-equal")
        assert(last.getAs[Double]("mu_cents") == mu, s"$sid mu not bit-equal")
      }
    } finally q.stop()
  }

  test("foreachBatch upsert sink: later batches replace matching keys in the gold table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    // a pre-existing gold table from the OLD plain-directory sink must
    // be migrated into snapshot 0, not silently shadowed
    Seq(("LEGACY", java.sql.Timestamp.valueOf("2023-12-31 00:00:00"), 5.5f))
      .toDF("sensor_id", "timestamp", "ph_value")
      .write.parquet(s"$dir/gold")
    val input = MemoryStream[SensorReading](spark)
    input.addData(reading("A", "2024-01-01 00:00:00", ph = 7.0f),
      reading("B", "2024-01-01 00:00:00", ph = 7.2f))
    val latest = input.toDF().select(col("sensor_id"), col("timestamp"), col("ph_value"))
    val q1 = Pipeline.toUpsertSink(latest, s"$dir/gold", s"$dir/chk", Seq("sensor_id"))
    q1.awaitTermination()
    // second run: A gets a new reading (same key) and C appears
    input.addData(reading("A", "2024-01-01 01:00:00", ph = 9.0f),
      reading("C", "2024-01-01 01:00:00", ph = 6.5f))
    val q2 = Pipeline.toUpsertSink(latest, s"$dir/gold", s"$dir/chk", Seq("sensor_id"))
    q2.awaitTermination()
    val gold = graft.sinks.ManifestTable.read(spark, s"$dir/gold")
    assert(gold.count() == 4, "legacy row + one row per streamed key expected")
    val aPh = gold.filter(col("sensor_id") === "A")
      .collect().head.getAs[Float]("ph_value")
    assert(math.abs(aPh - 9.0f) < 1e-6, "update must win over the original row")
    assert(gold.filter(col("sensor_id") === "LEGACY").count() == 1,
      "pre-manifest gold rows must survive the migration")
    // retention: the per-batch vacuum keeps at most 2 manifests and
    // exactly their files on disk — the sink cannot accrete history
    val vs = graft.sinks.ManifestTable.versions(spark, s"$dir/gold")
    assert(vs.size <= 2, s"vacuum must bound manifest history, got $vs")
  }

  test("stream-static dedup probe: copies flag against history, novel docs pass, exactly-once per pair") {
    import spark.implicits._
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "src0"),
      (2L, "completely different historical content about rivers and sensors", "en", "src0"),
      (3L, "ein ganz anderes deutsches dokument ohne duplikate", "de", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    // the serving-layout cache (round 12) must be semantically invisible:
    // every assertion below holds on the laid-out index too
    val index = Pipeline.dedupIndexLayout(
      graft.analytics.TextOps.bandIndexOf(history)).cache()
    val input = MemoryStream[(Long, String, String, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source")
    val out = Pipeline.dedupProbeStream(docs, index)
    assert(out.isStreaming, "probe must stay a streaming frame")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dedup_probe").start()
    try {
      input.addData(
        // exact copy of history doc 1 -> must flag with est 1.0
        (100L, "the quick brown fox jumps over the lazy dog again and again", "en", "src0"),
        // novel doc -> must pass clean
        (101L, "entirely novel text that matches nothing in the history", "en", "src0"),
        // copy of doc 1 but in ANOTHER block -> blocked probes miss it
        (102L, "the quick brown fox jumps over the lazy dog again and again", "en", "src9"))
      q.processAllAvailable()
      val rows = spark.table("dedup_probe").collect()
      assert(rows.map(_.getLong(0)).toSet == Set(100L),
        s"expected only the in-block copy to flag, got ${rows.toSeq}")
      // exactly ONE row despite the pair agreeing in all 8 bands
      assert(rows.length == 1, s"pair emitted ${rows.length}x (band dupes)")
      assert(rows.head.getAs[Long]("dup_of") == 1L)
      assert(rows.head.getAs[Double]("est_jaccard") == 1.0)
      // second batch: same novel doc id space continues statelessly
      input.addData(
        (103L, "completely different historical content about rivers and sensors", "en", "src0"))
      q.processAllAvailable()
      val rows2 = spark.table("dedup_probe").collect()
      assert(rows2.map(r => (r.getLong(0), r.getAs[Long]("dup_of"))).toSet ==
        Set((100L, 1L), (103L, 2L)))
    } finally q.stop()
  }

  test("pruned skipping-probe stream: verdicts equal the batch twin, one row per doc across batches") {
    import spark.implicits._
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "src0"),
      (2L, "completely different historical content about rivers and sensors", "en", "src0"),
      (3L, "ein ganz anderes deutsches dokument ohne duplikate", "de", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    val probeDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again", "en", "src0"),
      (101L, "entirely novel text that matches nothing in the history", "en", "src0"),
      (103L, "completely different historical content about rivers and sensors", "en", "src0"),
      (104L, "another novel document from the second micro batch", "en", "src0"))
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp_").toFile
    try {
      val idx = new java.io.File(dir, "idx").toString
      val gold = new java.io.File(dir, "gold").toString
      val chk = new java.io.File(dir, "chk").toString
      graft.analytics.TextOps.dedupIndexWrite(
        graft.analytics.TextOps.bandIndexOf(history), idx)
      val input = MemoryStream[(Long, String, String, String)](spark)
      val docs = input.toDF().toDF("doc_id", "text", "lang", "source")
      val q = Pipeline.dedupProbePrunedToWarehouse(docs, idx, gold, chk,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      try {
        input.addData(probeDocs.take(2))
        q.processAllAvailable()
        input.addData(probeDocs.drop(2))
        q.processAllAvailable()
      } finally q.stop()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("doc_id"), r.getAs[Long]("is_dup"),
          Option(r.get(r.fieldIndex("dup_of"))),
          Option(r.get(r.fieldIndex("est_jaccard"))))
      val got = graft.sinks.ManifestTable.read(spark, gold).collect()
      // exactly one verdict row per probe doc, across both micro-batches
      assert(got.length == probeDocs.length,
        s"expected ${probeDocs.length} verdicts, got ${got.length}")
      // the streaming lane must say exactly what the batch twin says
      val want = graft.analytics.TextOps.probePrunedBatch(
        probeDocs.toDF("doc_id", "text", "lang", "source"), idx).collect()
      assert(got.map(key).toSet == want.map(key).toSet,
        s"stream verdicts diverged:\n${got.map(key).toSet}\nvs\n${want.map(key).toSet}")
      // semantic spot checks: the planted copies flag, the novels pass
      val byId = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("is_dup")).toMap
      assert(byId(100L) == 1L && byId(103L) == 1L)
      assert(byId(101L) == 0L && byId(104L) == 0L)
    } finally graft.sinks.Sinks.deleteRecursively(dir)
  }

  test("probe-append stream: cross-batch duplicate flags against the APPENDED tranche") {
    // the closed daily-accretion loop (r14): batch N's novel docs are
    // appended to the DISK index inside foreachBatch, so batch N+1's
    // duplicates flag against them — not only against initial history
    import spark.implicits._
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again",
        "en", "src0")).toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_dpa_").toFile
    try {
      val idx = new java.io.File(dir, "idx").toString
      val gold = new java.io.File(dir, "gold").toString
      val chk = new java.io.File(dir, "chk").toString
      graft.analytics.TextOps.dedupIndexWrite(
        graft.analytics.TextOps.bandIndexOf(history), idx)
      val input = MemoryStream[(Long, String, String, String)](spark)
      val docs = input.toDF().toDF("doc_id", "text", "lang", "source")
      val q = Pipeline.dedupProbeAppendToWarehouse(docs, idx, gold, chk,
        Trigger.ProcessingTime(0))
      try {
        input.addData(
          // novel: must be APPENDED
          (100L, "a brand new never seen document about mountain weather",
            "en", "src0"),
          // dup of initial history
          (101L, "the quick brown fox jumps over the lazy dog again and again",
            "en", "src0"))
        q.processAllAvailable()
        input.addData(
          // copy of batch-1's APPENDED doc 100 — the accretion claim
          (200L, "a brand new never seen document about mountain weather",
            "en", "src0"),
          (201L, "yet another unrelated novel document entirely",
            "en", "src0"))
        q.processAllAvailable()
      } finally q.stop()
      val got = graft.sinks.ManifestTable.read(spark, gold).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("is_dup"),
            Option(r.get(r.fieldIndex("dup_of"))))).toMap
      assert(got.size == 4, s"expected 4 verdicts, got $got")
      assert(got(101L) == ((1L, Some(1L))), s"history dup missed: $got")
      assert(got(100L) == ((0L, None)))
      assert(got(201L) == ((0L, None)))
      assert(got(200L) == ((1L, Some(100L))),
        s"cross-batch duplicate did not flag against the appended " +
          s"tranche: ${got(200L)}")
      // only novel docs accreted
      val idxIds = graft.sinks.ManifestTable.read(spark, idx)
        .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(idxIds == Set(1L, 100L, 201L), s"index accretion wrong: $idxIds")
    } finally graft.sinks.Sinks.deleteRecursively(dir)
  }

  test("probe-append stream: mid-stream kill, restart — verdicts exactly-once, index appended exactly once") {
    import spark.implicits._
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again",
        "en", "src0")).toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_dpak_").toFile
    try {
      val idx = new java.io.File(dir, "idx").toString
      val gold = new java.io.File(dir, "gold").toString
      val chk = new java.io.File(dir, "chk").toString
      graft.analytics.TextOps.dedupIndexWrite(
        graft.analytics.TextOps.bandIndexOf(history), idx)
      val input = MemoryStream[(Long, String, String, String)](spark)
      val docs = input.toDF().toDF("doc_id", "text", "lang", "source")
      // mutually DISSIMILAR soak docs (mostly per-doc tokens): sharing
      // only 2 of ~9 tokens keeps true Jaccard ~0.2, far under the
      // 0.75 threshold, so accreted soak docs never flag each other
      def doc(i: Long) =
        (i, s"soak document alpha$i beta$i gamma$i delta$i epsilon$i " +
          s"zeta$i eta$i", "en", "src0")
      // continuous trigger, feed while running, kill mid-stream;
      // relay DISABLED so the exactly-once-append assertion below
      // cannot be masked by a compaction's duplicate squeeze
      val q1 = Pipeline.dedupProbeAppendToWarehouse(docs, idx, gold, chk,
        Trigger.ProcessingTime("50 milliseconds"), relayDepth = 0)
      try {
        val deadline = System.currentTimeMillis() + 30000
        var fed = 0L
        while (fed < 12 && System.currentTimeMillis() < deadline) {
          input.addData(doc(100 + fed), doc(100 + fed + 1))
          fed += 2
          Thread.sleep(120)
        }
        assert(fed == 12, "feeder starved")
        while (graft.sinks.ManifestTable.latestVersion(spark, gold).isEmpty &&
               System.currentTimeMillis() < deadline) Thread.sleep(50)
      } finally q1.stop()
      q1.awaitTermination()
      // dup of a doc appended BEFORE the kill + one more novel, then
      // restart from the same checkpoint and drain
      val d100 = doc(100)
      input.addData((300L, d100._2, d100._3, d100._4), doc(301))
      val q2 = Pipeline.dedupProbeAppendToWarehouse(docs, idx, gold, chk,
        relayDepth = 0)
      q2.awaitTermination()
      val gotRows = graft.sinks.ManifestTable.read(spark, gold).collect()
      // exactly one verdict per doc across the kill/restart
      assert(gotRows.length == 14,
        s"exactly-once violated: ${gotRows.length} verdicts for 14 docs")
      val got = gotRows.map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("is_dup"),
          Option(r.get(r.fieldIndex("dup_of"))))).toMap
      assert(got(300L) == ((1L, Some(100L))),
        s"post-restart dup must flag against the pre-kill appended " +
          s"tranche: ${got(300L)}")
      assert((100L to 111L).forall(i => got(i) == ((0L, None))), s"$got")
      assert(got(301L) == ((0L, None)))
      // the index holds each appended doc EXACTLY once (no replayed
      // double-append): every doc_id has exactly one row per band
      val bandCounts = graft.sinks.ManifestTable.read(spark, idx)
        .groupBy(col("doc_id"), col("band")).count()
        .filter(col("count") > 1).count()
      assert(bandCounts == 0,
        "a replayed micro-batch double-appended into the index")
      val idxIds = graft.sinks.ManifestTable.read(spark, idx)
        .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(idxIds == ((100L to 111L).toSet + 1L + 301L),
        s"index accretion wrong after kill/restart: $idxIds")
    } finally graft.sinks.Sinks.deleteRecursively(dir)
  }

  test("maintained-gold stream: mid-stream kill, restart — gold equals the recompute, ticks exactly-once") {
    import spark.implicits._
    import graft.sinks.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("graft_mgs_").toFile
    try {
      val src = new java.io.File(dir, "src").toString
      val gold = new java.io.File(dir, "gold").toString
      val chk = new java.io.File(dir, "chk").toString
      val input = MemoryStream[(Long, String, Long)](spark)
      val facts = input.toDF().toDF("k", "g", "s")
      def start(trigger: Trigger) = Pipeline.factsToMaintainedGold(
        facts, src, gold, chk, Seq("k"), "k", Seq("g"), Seq("s"), "n",
        trigger)
      // continuous trigger; feed three batches — inserts, more
      // inserts, then an UPDATE of key 1 — and kill mid-stream
      val q1 = start(Trigger.ProcessingTime("50 milliseconds"))
      try {
        val deadline = System.currentTimeMillis() + 60000
        input.addData((1L, "x", 10L), (2L, "y", 5L))
        // wait for the first tick BEFORE feeding the k=1 update: the
        // lane requires key-unique rows per micro-batch, and a slow
        // query start could otherwise fold both k=1 rows into batch 0
        while (ManifestTable.latestVersion(spark, gold).isEmpty &&
               System.currentTimeMillis() < deadline) Thread.sleep(50)
        assert(ManifestTable.latestVersion(spark, gold).isDefined,
          "gold never ticked before the kill")
        input.addData((11L, "x", 1L), (12L, "y", 2L))
        input.addData((1L, "x", 99L)) // key-replace, not a new row
      } finally q1.stop()
      q1.awaitTermination()
      // post-kill: a new group and an update of key 2; restart from
      // the same checkpoint and drain (replays any in-flight batch)
      input.addData((3L, "z", 7L), (2L, "y", 50L))
      val q2 = start(Trigger.AvailableNow())
      q2.awaitTermination()
      // source content: every key exactly once, updates won
      val srcRows = ManifestTable.read(spark, src).collect()
        .map(r => r.getAs[Long]("k") ->
          (r.getAs[String]("g"), r.getAs[Long]("s"))).toMap
      assert(srcRows == Map(1L -> ("x", 99L), 2L -> ("y", 50L),
        11L -> ("x", 1L), 12L -> ("y", 2L), 3L -> ("z", 7L)),
        s"source diverged across the kill/restart: $srcRows")
      // gold equals the full recompute of the final source state
      val goldRows = ManifestTable.read(spark, gold).collect()
        .map(r => (r.getAs[String]("g"), r.getAs[Long]("s"),
          r.getAs[Long]("n"))).toSet
      assert(goldRows == Set(("x", 100L, 2L), ("y", 52L, 2L),
        ("z", 7L, 1L)),
        s"maintained gold diverged from the recompute: $goldRows")
      // the watermark caught up to the source's latest version
      assert(graft.sinks.Sinks.appliedVersion(spark, gold) ==
        ManifestTable.latestVersion(spark, src))
    } finally graft.sinks.Sinks.deleteRecursively(dir)
  }

  test("rate-paced replay emits the bounded frame's rows progressively in order") {
    import spark.implicits._
    val bounded = Seq(("r0", 1.0), ("r1", 2.0), ("r2", 3.0)).toDF("tag", "v")
    val stream = Pipeline.replayStream(spark, bounded, rowsPerSecond = 50)
    assert(stream.isStreaming)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("replay_out").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("replay_out").count() < 3 &&
             System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val got = spark.table("replay_out").select(col("tag"))
        .collect().map(_.getString(0)).toSet
      assert(got == Set("r0", "r1", "r2"), s"replay incomplete: $got")
    } finally q.stop()
  }

  test("CountMin sketch over incremental micro-batches equals the batch sketch (mergeable state)") {
    // the CMS buffer's merge is elementwise addition, so the SAME
    // aggregator must produce the identical counter array whether the
    // tokens arrive in one batch scan or dribble in across streaming
    // micro-batches — the property that lets one sketch span
    // partitions, days and snapshots at 100 TB
    import spark.implicits._
    val rng = new scala.util.Random(777)
    val words = (0 until 3000).map(_ => s"w${rng.nextInt(200)}")
    val input = MemoryStream[String](spark)
    val q = input.toDF().toDF("tok")
      .agg(graft.functions.Aggregators.countMin(col("tok")).as("sk"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream").start()
    try {
      words.grouped(500).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable() // several real micro-batches, not one
      }
      val streamed = spark.table("cms_stream").head()
        .getAs[scala.collection.Seq[Long]]("sk").toSeq
      val batch = words.toDF("tok")
        .agg(graft.functions.Aggregators.countMin(col("tok")).as("sk"))
        .head().getAs[scala.collection.Seq[Long]]("sk").toSeq
      assert(streamed == batch,
        "incremental CMS diverged from the one-shot batch sketch")
      // every row of the depth-4 sketch conserves the token mass
      val d = graft.functions.Aggregators.CmsDepth
      val w = graft.functions.Aggregators.CmsWidth
      (0 until d).foreach { i =>
        assert(streamed.slice(i * w, (i + 1) * w).sum == words.length.toLong,
          s"row $i does not conserve mass")
      }
    } finally q.stop()
  }

  test("streaming NB scoring is bit-equal to the batch scorer over the same docs") {
    import spark.implicits._
    val dir = sf
    val (classes, ltab) = graft.analytics.TextOps.nbModel(spark, dir)
    // pin the model frames: both consumers (stream + batch reference)
    // must score against the identical trained tables
    val cls = classes.localCheckpoint(true)
    val lt = ltab.localCheckpoint(true)
    val testDocs = graft.ingest.Sources.documents(spark, dir)
      .filter(graft.operators.Scale.hashBucket(col("doc_id")) >= 80)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val scored = Pipeline.nbScoreStream(
      input.toDF().toDF("doc_id", "text"), cls, lt)
    val q = scored.writeStream
      .format("memory").queryName("nb_stream")
      .outputMode("update")
      .start()
    // two batches: scores must converge to the full-corpus result even
    // when a doc's tokens arrive entirely within one batch
    input.addData(testDocs.take(testDocs.length / 2).toSeq)
    q.processAllAvailable()
    input.addData(testDocs.drop(testDocs.length / 2).toSeq)
    q.processAllAvailable()
    q.stop()
    // each doc arrives whole in one batch, so every (doc, class) key
    // emits exactly one update row
    val finalRows = spark.table("nb_stream").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.analytics.TextOps.nbScoreDocs(
        graft.ingest.Sources.documents(spark, dir)
          .filter(graft.operators.Scale.hashBucket(col("doc_id")) >= 80)
          .select(col("doc_id"), split(col("text"), " ").as("toks")),
        cls, lt, Seq.empty)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(finalRows.keySet == batch.keySet)
    val diffs = batch.collect { case (k, v) if finalRows(k) != v => k }
    assert(diffs.isEmpty, s"${diffs.size} (doc, class) scores diverge: ${diffs.take(3)}")
  }

  test("graft-table source: initial load, then the exact change feed, exactly once") {
    import spark.implicits._
    import graft.sinks.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val path = s"$dir/t"
    val v0 = ManifestTable.replace(
      (1L to 100L).map(i => (i, s"n$i",
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00")))
        .toDF("id", "name", "ts")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"), path)
    // foreachBatch → parquet per run: the memory sink cannot recover
    // from a checkpoint, and per-run output isolation is what lets
    // each drain assert exactly ITS window's rows
    def drain(chk: String, out: String): org.apache.spark.sql.DataFrame = {
      val outDir = s"$dir/$out"
      val q = spark.readStream.format("graft-table").option("path", path)
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir): Unit
        }
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      try spark.read.parquet(outDir)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.range(0).select(lit(0L).as("id"), lit("").as("name"),
          lit(null).cast("timestamp").as("ts"), lit("").as("_change_type"))
          .filter(lit(false))
      }
    }
    // batch 1: the initial load — the whole snapshot as inserts,
    // timestamps decoded through the row-at-a-time parquet path
    val load = drain(s"$dir/chk", "src_run1")
    assert(load.count() == 100)
    assert(load.filter(col("_change_type") =!= "insert").count() == 0)
    assert(load.schema.fieldNames.toSeq ==
      Seq("id", "name", "ts", "_change_type"))
    val tsOf = load.filter(col("id") === 61L)
      .select("ts").as[java.sql.Timestamp].head()
    assert(tsOf == java.sql.Timestamp.valueOf("2024-01-01 00:01:00"),
      s"timestamp decode broke: $tsOf")
    // mutate: evolving append, vector delete, copy-on-write upsert
    ManifestTable.append(
      (101L to 110L).map(i => (i, s"n$i", null.asInstanceOf[java.sql.Timestamp],
        s"tag$i")).toDF("id", "name", "ts", "tag").coalesce(1), path)
    ManifestTable.deleteWhereMor(spark, path,
      col("id").between(5L, 8L), "id", 5.0, 8.0)
    val v3 = ManifestTable.upsertPruned(
      Seq((50L, "FIFTY", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        null.asInstanceOf[String])).toDF("id", "name", "ts", "tag"),
      path, Seq("id"), "id").get
    // batch 2 (same checkpoint): exactly the (v0, v3] feed — compared
    // row-for-row against the BATCH change feed, the defining contract
    val feed = drain(s"$dir/chk", "src_run2")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, String)] =
      df.select(col("id"), col("name"),
          coalesce(col("tag"), lit("-")), col("_change_type"))
        .as[(Long, String, String, String)].collect().sorted.toSeq
    val expected = canon(ManifestTable.changes(spark, path, v0, v3))
    assert(canon(feed) == expected,
      s"source feed diverges from changes(): got ${canon(feed).size} " +
        s"rows vs ${expected.size}")
    // the evolved column arrived (schema refreshed by the new stream
    // instance), with pre-evolution rows null-filled
    assert(feed.filter(col("tag").isNotNull).count() == 10)
    // batch 3: nothing new — zero rows, no version consumed
    assert(drain(s"$dir/chk", "src_run3").count() == 0)
    // REPLAY the whole history on a fresh checkpoint: the feed from
    // scratch must REDUCE to the current table (inserts minus deletes
    // = state), the invariant any downstream materializer depends on
    val replay = drain(s"$dir/chk2", "src_replay")
    val applied = replay.filter(col("_change_type") === "insert")
      .select("id", "name")
      .exceptAll(replay.filter(col("_change_type") === "delete")
        .select("id", "name"))
    val table = ManifestTable.read(spark, path).select("id", "name")
    assert(applied.exceptAll(table).count() == 0 &&
      table.exceptAll(applied).count() == 0,
      "replayed feed does not reduce to the table state")
  }

  test("table replication: the change-feed subscriber mirrors every mutation kind, replay no-ops") {
    import spark.implicits._
    import graft.sinks.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("graft_repl").toString
    val (src, dst) = (s"$dir/src", s"$dir/dst")
    ManifestTable.replace(
      (1L to 100L).map(i => (i, s"n$i", i * 10L)).toDF("id", "name", "v")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"), src)
    def sync(): Unit = {
      val q = Pipeline.replicateTable(src, dst, "id", s"$dir/chk")
      q.awaitTermination()
    }
    def assertMirror(): Unit = {
      val a = ManifestTable.read(spark, src).orderBy("id")
      val b = ManifestTable.read(spark, dst).orderBy("id")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"replica diverged: src ${a.count()} rows vs dst ${b.count()}")
    }
    sync(); assertMirror() // initial load
    // one window with every mutation kind: append, update, vector
    // delete, copy-on-write delete
    ManifestTable.append(
      (101L to 110L).map(i => (i, s"n$i", i * 10L))
        .toDF("id", "name", "v").coalesce(1), src)
    ManifestTable.upsertPruned(
      Seq((50L, "FIFTY", 999L)).toDF("id", "name", "v"),
      src, Seq("id"), "id")
    ManifestTable.deleteWhereMor(spark, src,
      col("id").between(5L, 8L), "id", 5.0, 8.0)
    ManifestTable.deleteWhere(spark, src,
      col("id") === 105L, "id", 105.0, 105.0)
    sync(); assertMirror()
    assert(ManifestTable.read(spark, dst)
      .filter(col("id") === 50L).select("name").as[String].head() == "FIFTY")
    assert(ManifestTable.read(spark, dst)
      .filter(col("id").between(5L, 8L) || col("id") === 105L)
      .count() == 0)
    // replay from scratch into the SAME replica (fresh checkpoint):
    // the full feed re-applies -- upserts idempotent by key, deletes
    // cannot re-match -- and the replica is unchanged
    val vBefore = ManifestTable.latestVersion(spark, dst).get
    val q = Pipeline.replicateTable(src, dst, "id", s"$dir/chk2")
    q.awaitTermination()
    assertMirror()
    // the replay's delete legs burned no versions (nothing re-matched);
    // its upsert legs may commit (key-replace no-ops content-wise)
    val dvBurn = ManifestTable.dvEntries(spark, dst).size
    assert(dvBurn <= 2,
      s"replayed deletes accumulated vectors: $dvBurn")
    assert(ManifestTable.read(spark, dst).count() ==
      ManifestTable.read(spark, src).count())
    assert(vBefore <= ManifestTable.latestVersion(spark, dst).get)
  }

  test("streaming forget lane: vector deletes, zero rewrite, replay and cross-batch dupes no-op") {
    import spark.implicits._
    import graft.sinks.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("graft_forget").toString
    val path = s"$dir/t"
    val v0 = ManifestTable.replace(
      (1L to 200L).map(i => (i, i * 10L)).toDF("id", "v")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"), path)
    val files0 = ManifestTable.snapshotFiles(spark, path, Some(v0))
    val input = MemoryStream[Long](spark)
    input.addData(10L, 20L, 30L)
    val q1 = Pipeline.forgetKeysToTable(input.toDF().toDF("id"), path,
      "id", s"$dir/chk")
    q1.awaitTermination()
    assert(ManifestTable.read(spark, path).count() == 197)
    assert(ManifestTable.countRows(spark, path) == 197L)
    // zero rewrite: the forget lane only ever adds vector sidecars
    assert(ManifestTable.snapshotFiles(spark, path) == files0,
      "forget lane rewrote data files")
    val vAfter1 = ManifestTable.latestVersion(spark, path).get
    assert(vAfter1 == v0 + 1, "one nonempty batch must burn one version")
    // second run, same checkpoint: new keys PLUS a cross-batch dupe
    // (20 again) — the dupe is already vector-deleted, cannot
    // re-match, and must not inflate the vector's counts
    input.addData(40L, 20L, 50L)
    val q2 = Pipeline.forgetKeysToTable(input.toDF().toDF("id"), path,
      "id", s"$dir/chk")
    q2.awaitTermination()
    assert(ManifestTable.read(spark, path).count() == 195)
    assert(ManifestTable.countRows(spark, path) == 195L)
    assert(ManifestTable.read(spark, path)
      .filter(col("id").isin(10L, 20L, 30L, 40L, 50L)).count() == 0)
    // REPLAY: a fresh checkpoint re-feeds the same keys from scratch —
    // every one already deleted, so the lane no-ops without burning a
    // version (the by-construction exactly-once of the DV-filtered
    // delete scan)
    val vBefore = ManifestTable.latestVersion(spark, path).get
    val replay = MemoryStream[Long](spark)
    replay.addData(10L, 20L, 30L, 40L, 50L)
    val q3 = Pipeline.forgetKeysToTable(replay.toDF().toDF("id"), path,
      "id", s"$dir/chk2")
    q3.awaitTermination()
    assert(ManifestTable.latestVersion(spark, path).get == vBefore,
      "replayed forget keys burned a version")
    assert(ManifestTable.read(spark, path).count() == 195)
    // restart on the ORIGINAL checkpoint with nothing new: no-op
    val q4 = Pipeline.forgetKeysToTable(input.toDF().toDF("id"), path,
      "id", s"$dir/chk")
    q4.awaitTermination()
    assert(ManifestTable.latestVersion(spark, path).get == vBefore)
    // downstream CDC sees the forgotten rows exactly once
    val net = ManifestTable.netChanges(spark, path, v0, vBefore)
    assert(net.filter(col("_change_type") === "insert").count() == 0)
    assert(net.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 20L, 30L, 40L, 50L))
  }
}
