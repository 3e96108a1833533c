package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for ((name, fn) <- Seq(
      "minhash" -> graft.analytics.TextOps.queries("q_minhash_lsh"),
      "simhash" -> graft.analytics.TextOps.queries("q_simhash_dedup"),
      "jaccard" -> graft.analytics.TextOps.queries("q_near_dup_jaccard"),
      "knnlsh" -> graft.analytics.Similarity.queries("q_knn_lsh"))) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      val scans = "FileScan parquet".r.findAllIn(p).length
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      val reused = "ReusedExchange".r.findAllIn(p).length
      println(s"== $name: scans=$scans exchanges=$ex reused=$reused")
    }
    spark.stop()
  }
}
