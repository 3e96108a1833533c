package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("8", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        // count only SHUFFLE exchanges — a bare "Exchange" regex would
        // also match BroadcastExchange/ReusedExchange and inflate the
        // one number this audit exists to surface
        val scans = "FileScan".r.findAllIn(p).length
        val shuffles =
          "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
            .findAllIn(p).length
        val bcast = "BroadcastExchange".r.findAllIn(p).length
        val reused = "ReusedExchange".r.findAllIn(p).length
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
        val cart = "CartesianProduct".r.findAllIn(p).length
        println(f"$name%-32s scans=$scans shuffles=$shuffles bcast=$bcast reused=$reused bnlj=$bnlj cart=$cart")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
