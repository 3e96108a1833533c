package graft.tools
import org.apache.spark.sql.functions._
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm
    spark.range(100).selectExpr("sum(id)").collect()
    val pairs = time("pairs_build+checkpoint") {
      graft.analytics.TextOps.nearDupJaccard(spark, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")).localCheckpoint()
    }
    println("n_pairs=" + pairs.count())
    val comp = time("cc_total") { graft.operators.Graph.connectedComponents(pairs) }
    println("n_vertices=" + comp.count())
    spark.stop()
  }
}
