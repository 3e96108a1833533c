// scratch diagnostic: does the maintained-gold tick stay O(delta) as the table grows?
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 instrument for the incremental-view-maintenance claim:
  * [[graft.sinks.Sinks.maintainAggTable]] promises a maintenance job
  * that reads the day's CHANGED FILES, not the table — so its cost
  * must stay flat as the table grows while a naive rebuild (full
  * aggregate + replace, what a non-incremental daily job runs) grows
  * linearly. This measures both lanes on the same mutating table at
  * corpus multipliers M ∈ {1, 2, 4, 8} (orders sf0.1 replicated with
  * shifted keys, range-laid into 16·M files so the DELTA's file
  * footprint is constant while the table isn't):
  *
  *  - `tick`  — upsertPruned a ~1k-row reprice into one key slice
  *              (touches 1–2 files), then time maintainAggTable: net
  *              change feed over the touched files + gold merge +
  *              tagged replace.
  *  - `naive` — time the full-recompute twin: aggregate the whole
  *              snapshot and replace a (separate) gold table — the
  *              same commit machinery, so the lanes differ ONLY in
  *              what they read.
  *
  * Both lanes' gold CONTENT is require()d identical every call (the
  * maintained view must be indistinguishable from the recompute).
  * Reading: tick ~flat in M (delta files + #groups gold), naive
  * growing with M — the curve that justifies running maintenance off
  * the change feed at 100 TB, where M is ~10⁵ and a daily delta
  * touches a few hundred files.
  *
  * args: [calls-per-cell] (default 5) [multipliers csv] (default
  * 1,2,4,8,32)
  */
object IvmBound {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e6, a)
  }

  def main(args: Array[String]): Unit = {
    val calls = args.headOption.map(_.toInt).getOrElse(5)
    val multipliers = args.lift(1).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(1, 2, 4, 8, 32))
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sinks.{ManifestTable, Sinks}
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .localCheckpoint(eager = true)
    val mn = base.agg(min(col("o_orderkey"))).head().getAs[Number](0).longValue
    val grp = Seq("o_orderpriority")
    def goldOf(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n_rows"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivmbound_").toFile
    try {
      for (m <- multipliers) {
        val src = new java.io.File(dir, s"src_m$m").toString
        val gold = new java.io.File(dir, s"gold_m$m").toString
        val goldNaive = new java.io.File(dir, s"goldn_m$m").toString
        val big = (0 until m).map(i => base.withColumn("o_orderkey",
            col("o_orderkey") + lit(i * 1000000000L)))
          .reduce(_ unionByName _)
          .repartitionByRange(16 * m, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey")
        ManifestTable.replace(big, src)
        val rows = ManifestTable.read(spark, src).count()
        Sinks.maintainAggTable(spark, src, gold, grp, Seq("cents"), "n_rows")
        var lastChanged = 0
        val cells = (1 to calls).map { c =>
          // the day's delta: reprice one contiguous ~1k-key slice
          // (different cents each call so every tick has real work)
          val before = ManifestTable.latestVersion(spark, src).get
          val delta = base.filter(col("o_orderkey") <= mn + 4000L)
            .withColumn("cents", col("cents") + lit(c.toLong))
          ManifestTable.upsertPruned(delta, src,
            Seq("o_orderkey"), "o_orderkey")
          val after = ManifestTable.latestVersion(spark, src).get
          val fb = ManifestTable.snapshotFiles(spark, src, Some(before)).toSet
          val fa = ManifestTable.snapshotFiles(spark, src, Some(after)).toSet
          lastChanged = ((fa union fb) -- (fa intersect fb)).size
          val (tickMs, _) = time {
            Sinks.maintainAggTable(spark, src, gold, grp,
              Seq("cents"), "n_rows").getOrElse(
              sys.error("tick had nothing to apply — harness bug"))
          }
          val (naiveMs, _) = time {
            ManifestTable.replace(goldOf(ManifestTable.read(spark, src)),
              goldNaive)
          }
          val a = ManifestTable.read(spark, gold)
            .collect().map(_.toString).sorted.toSeq
          val b = ManifestTable.read(spark, goldNaive)
            .collect().map(_.toString).sorted.toSeq
          require(a == b, s"maintained gold diverged from recompute at " +
            s"m=$m call=$c:\n  tick : $a\n  naive: $b")
          (tickMs, naiveMs)
        }
        val files = ManifestTable.snapshotFiles(spark, src).size
        val (ticks, naives) = (cells.map(_._1), cells.map(_._2))
        println(f"[ivmbound] m=$m%d rows=$rows%8d files=$files%4d " +
          f"changed=$lastChanged%3d  tick: min=${ticks.min}%7.1f ms " +
          f"mean=${ticks.sum / ticks.size}%7.1f  " +
          f"naive: min=${naives.min}%7.1f ms " +
          f"mean=${naives.sum / naives.size}%7.1f")
      }
    } finally Sinks.deleteRecursively(dir)
    spark.stop()
  }
}
