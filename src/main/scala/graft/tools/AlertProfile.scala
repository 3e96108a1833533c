// scratch diagnostic: where does alert_upsert time go?
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

object AlertProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.model.Schemas.SensorReading
    import graft.streaming.Pipeline
    def rows = {
      val nSensors = 64
      (0 until 8192).map { i =>
        val bad = (i / nSensors) % 8 < 4
        SensorReading(f"S${i % nSensors}%03d",
          java.sql.Timestamp.valueOf(f"2024-01-01 ${i / nSensors / 60}%02d:${i / nSensors % 60}%02d:00"),
          Some(if (bad) 5.0f else 7.5f), Some(50f), Some(100f))
      }
    }
    def run(tag: String)(mk: (MemoryStream[SensorReading], String) => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      (1 to 2).foreach { pass =>
        val input = MemoryStream[SensorReading](spark)
        val dir = java.nio.file.Files.createTempDirectory(s"alertprof-$tag").toString
        val q = mk(input, dir)
        val data = rows
        val t0 = System.nanoTime()
        var batches = 0
        try data.grouped(2048).foreach { chunk =>
          input.addData(chunk.toSeq)
          q.processAllAvailable()
          batches += 1
        } finally q.stop()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[aprof] $tag pass$pass: ${data.length / secs}%7.1f rows/s  ($secs%5.2f s)")
      }
    }
    // count-only floor: one action per batch, no write (a truly empty
    // foreachBatch fails Spark 4's state-store commit validation)
    run("countonly") { (input, dir) =>
      Pipeline.alerts(input.toDS()).toDF().writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (b: DataFrame, _: Long) => b.count(): Unit }
        .option("checkpointLocation", s"$dir/chk")
        .trigger(Trigger.ProcessingTime(0))
        .start()
    }
    // full: the production sink
    run("full") { (input, dir) =>
      Pipeline.alertsToWarehouse(input.toDS(), s"$dir/gold", s"$dir/chk",
        Trigger.ProcessingTime(0))
    }
    spark.stop()
  }
}
