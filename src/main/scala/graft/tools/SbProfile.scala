// diagnostic: standalone streaming-bench rates
package graft.tools

object SbProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    spark.range(1000).selectExpr("sum(id)").collect()
    println("[sbprof] " + graft.StreamBench.run(spark))
    println("[sbprof] " + graft.StreamBench.run(spark))
    spark.stop()
  }
}
