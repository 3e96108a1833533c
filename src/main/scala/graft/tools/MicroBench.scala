// quick timing of targeted queries at sf0.1
package graft.tools
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    val sf = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    val qs = Seq(
      "q_dedup_clusters" -> graft.analytics.TextOps.queries("q_dedup_clusters"),
      "q_knn_ivf" -> graft.analytics.Similarity.queries("q_knn_ivf"),
      "q_knn_lsh" -> graft.analytics.Similarity.queries("q_knn_lsh"),
      "q_part_fuzzy_match" -> graft.analytics.Stats.queries("q_part_fuzzy_match"),
      "q_gap_fill_locf" -> graft.analytics.TimeSeries.queries("q_gap_fill_locf"))
    qs.foreach { case (n, fn) =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sf).count(); (System.nanoTime()-t0)/1e9 }
      println(f"[micro] $n%-22s ${ts.min}%6.2f s")
    }
    spark.stop()
  }
}
