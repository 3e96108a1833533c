// diagnostic: end-to-end timing of the pagerank queries at sf0.1
package graft.tools

object PrProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    for (i <- 1 to 2) {
      drop()
      t(s"q_pagerank_converged#$i") {
        graft.analytics.Affinity.partPagerankConverged(spark, sf).count()
      }
      drop()
      t(s"q_part_pagerank#$i") {
        graft.analytics.Affinity.partPagerank(spark, sf).count()
      }
    }
    spark.stop()
  }
}
