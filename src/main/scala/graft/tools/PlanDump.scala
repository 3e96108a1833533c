package graft.tools

/** Dump `.explain("formatted")` (the static plan) plus the executed
  * FINAL post-AQE plan for named queries into text files — the
  * before/after plan evidence the optimization rounds commit under
  * `plans/<round>/`. Unlike [[PlanAudit]] (pass/fail plan-shape gate)
  * this is a verbatim capture tool: one file per query,
  * `<outDir>/<query>_<suffix>.txt`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> q_a q_b ...
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE is what is
  * captured; sf only changes AQE's runtime sizes).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <query> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    val unknown = names.filterNot(graft.SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    java.nio.file.Files.createDirectories(outDir)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.spark.Sessions.local(cpus, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"plandump: $n")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // execute so AQE finalizes the plan: the join strategies /
      // AQEShuffleRead choices below are the ones that actually ran
      df.count()
      val finalPlan = df.queryExecution.executedPlan.toString
      val body =
        s"""== query: $n  sf: $sf ==
           |
           |$formatted
           |
           |== FINAL post-AQE executedPlan (after one execution) ==
           |
           |$finalPlan
           |""".stripMargin
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        body.getBytes("UTF-8"))
      println(s"[plandump] wrote ${n}_$suffix.txt")
    }
    spark.stop()
  }
}
