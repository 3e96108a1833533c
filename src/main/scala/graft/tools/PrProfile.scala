// diagnostic: per-round timing breakdown of pagerankConverged at sf0.1
package graft.tools

import org.apache.spark.sql.functions._

object PrProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    val edges = t("prEdges+ckpt") {
      val e = graft.analytics.Affinity.prEdges(spark, sf)
        .select(col("src"), col("dst")).localCheckpoint()
      e.count(); e
    }
    val deg = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val n = t("deg.count")(deg.count())
    val scale = graft.analytics.Affinity.PrScale
    val tolerance = scale / graft.analytics.Affinity.PrTolDiv
    var ranks = deg.select(col("v"), lit(scale / n).as("r"), col("d"))
      .localCheckpoint(eager = false)
    var converged = false
    var rounds = 0
    val tAll = System.nanoTime()
    while (!converged && rounds < 60) {
      val contrib = edges
        .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), expr("r DIV d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("contrib"))
      val next = ranks.join(contrib, Seq("v"), "left")
        .select(col("v"),
          expr(s"(${scale}L * 15) DIV (100 * ${n}L) + " +
            "(85 * coalesce(contrib, CAST(0 AS BIGINT))) DIV 100").as("r"),
          col("d"), col("r").as("r_prev"))
        .localCheckpoint(eager = false)
      val moved = t(s"round $rounds") {
        next.agg(coalesce(sum(abs(col("r") - col("r_prev"))), lit(0L)))
          .head().getLong(0)
      }
      converged = moved <= tolerance
      org.apache.spark.sql.GraftBridge.freeCheckpoint(ranks)
      ranks = next.drop("r_prev")
      rounds += 1
    }
    println(f"[prof] loop total     ${(System.nanoTime() - tAll) / 1e9}%7.3f s  rounds=$rounds")
    spark.stop()
  }
}
