// scratch diagnostic: does installing GraftExtensions change cheap-query latency?
// args: ext|noext q_name [runs]
package graft.tools

import org.apache.spark.sql.SparkSession

object ExtProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val q = args(1)
    val runs = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val base = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
    val spark =
      (if (mode == "ext") base.withExtensions(new graft.functions.GraftExtensions)
       else base).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet("/root/testdata/sf0.1/region.parquet").count()
    val fn = graft.SparkEntry.queries(q)
    val ts = (1 to runs).map { _ =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[extprobe] $mode $q min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
