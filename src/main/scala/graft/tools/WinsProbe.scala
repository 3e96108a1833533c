// scratch diagnostic: stage-level timing of the grouped-rank winsorize
package graft.tools

import org.apache.spark.sql.functions._

object WinsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[wprof] $tag run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s (n=$n)")
    }
    val ev = graft.ingest.Sources.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    time("events_count") { ev.count() }
    time("checkpoint") {
      val c = ev.localCheckpoint(); val n = c.count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(c); n
    }
    time("grouped_rank") {
      val r = graft.operators.Scale.distributedGroupedRowNumber(
        ev, col("event_type"), col("cents"), col("event_id"), "rnk",
        totalOut = Some("n"))
      val n = r.count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(r); n
    }
    val tiny = spark.range(1000).select(
      concat(lit("g"), (col("id") % 5).cast("string")).as("event_type"),
      col("id").as("event_id"), (col("id") % 97).as("cents"))
    time("grouped_rank_tiny") {
      val r = graft.operators.Scale.distributedGroupedRowNumber(
        tiny, col("event_type"), col("cents"), col("event_id"), "rnk")
      val n = r.count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(r); n
    }
    time("boundaries_only") {
      val base = ev.withColumn("_g", col("event_type"))
        .withColumn("_b", col("cents")).withColumn("_k", col("event_id"))
        .localCheckpoint()
      val probs = (1 until 32).map(i => i / 32.0).mkString(", ")
      val n = base.groupBy(col("_g"))
        .agg(expr(s"approx_percentile(_b, array($probs), 1000)"))
        .collect().length.toLong
      org.apache.spark.sql.GraftBridge.freeCheckpoint(base); n
    }
    time("old_window_rank") {
      val part = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val w = part.orderBy(col("cents").asc, col("event_id").asc)
      ev.withColumn("rnk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(part)).count()
    }
    time("full_winsorize") {
      val d = graft.analytics.Quality.winsorize(spark, dir)
      val n = d.count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(d); n
    }
    spark.stop()
  }
}
