package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        val scans = "FileScan".r.findAllIn(p).length
        val ex = "Exchange".r.findAllIn(p).length
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
        val cart = "CartesianProduct".r.findAllIn(p).length
        println(f"$name%-32s scans=$scans ex=$ex bnlj=$bnlj cart=$cart")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
