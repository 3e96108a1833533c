// quick timing of targeted queries at sf0.1: runMain graft.tools.MicroBench [q_name ...]
package graft.tools
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq
    else Seq("q_dedup_clusters", "q_knn_ivf", "q_knn_lsh",
      "q_part_fuzzy_match", "q_gap_fill_locf")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (1 to 2).map { _ =>
        // same storage isolation as Bench: measure the plan, not
        // blocks a previous run left behind
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); fn(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $n%-24s min=${ts.min}%6.2f s  max=${ts.max}%6.2f s")
    }
    spark.stop()
  }
}
