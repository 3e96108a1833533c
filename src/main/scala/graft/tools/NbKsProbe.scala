package graft.tools

import org.apache.spark.sql.functions._

/** A/B for the round-11 fused-prefix-sum rebuild of q_nb_ks: times
  * (a) the shared margin computation alone ([[graft.analytics.TextOps
  * .nbMargins]] — NB scoring, rank window, checkpoint), (b) the
  * round-10 CHAINED pair of [[graft.operators.Scale
  * .distributedPrefixSum]] applications over it, and (c) the round-11
  * FUSED [[graft.operators.Scale.distributedPrefixSums]] call, each
  * min-of-N interleaved in one warm JVM — the only honest way to see
  * whether sharing phase 0 actually moved the query or the margin
  * computation dominates.
  *
  * args: [sfDir] [runs]
  */
object NbKsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Scale

    def margins() = graft.analytics.TextOps.nbMargins(spark, dir)
      .withColumn("bad", lit(1L) - col("ok"))

    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val t = Array.fill(3)(Double.MaxValue)
    for (_ <- 1 to runs) {
      t(0) = math.min(t(0), time(() => margins().write.format("noop")
        .mode("overwrite").save()))
      t(1) = math.min(t(1), time { () =>
        val df = margins()
        Scale.distributedPrefixSum(
            Scale.distributedPrefixSum(
              df, col("margin"), col("doc_id"), col("ok"), "c_ok"),
            col("margin"), col("doc_id"), col("bad"), "c_bad")
          .write.format("noop").mode("overwrite").save()
      })
      t(2) = math.min(t(2), time { () =>
        val df = margins()
        Scale.distributedPrefixSums(df, col("margin"), col("doc_id"),
            Seq(col("ok") -> "c_ok", col("bad") -> "c_bad"))
          .write.format("noop").mode("overwrite").save()
      })
    }
    println(f"margins alone   ${t(0)}%7.3f s")
    println(f"chained pair    ${t(1)}%7.3f s  (prefix part ${t(1) - t(0)}%6.3f)")
    println(f"fused payloads  ${t(2)}%7.3f s  (prefix part ${t(2) - t(0)}%6.3f)")

    // operator-isolated leg: a pre-materialized synthetic frame takes
    // nbMargins' (dominant, noisy) cost out of the comparison entirely
    val syn = spark.range(2000000L)
      .select(col("id").as("doc_id"),
        (col("id") % 997).as("margin"),
        (col("id") % 2).as("ok"),
        (lit(1L) - col("id") % 2).as("bad"))
      .localCheckpoint()
    val s = Array.fill(2)(Double.MaxValue)
    for (_ <- 1 to runs) {
      s(0) = math.min(s(0), time { () =>
        Scale.distributedPrefixSum(
            Scale.distributedPrefixSum(
              syn, col("margin"), col("doc_id"), col("ok"), "c_ok"),
            col("margin"), col("doc_id"), col("bad"), "c_bad")
          .write.format("noop").mode("overwrite").save()
      })
      s(1) = math.min(s(1), time { () =>
        Scale.distributedPrefixSums(syn, col("margin"), col("doc_id"),
            Seq(col("ok") -> "c_ok", col("bad") -> "c_bad"))
          .write.format("noop").mode("overwrite").save()
      })
    }
    println(f"synthetic 2M chained ${s(0)}%7.3f s   fused ${s(1)}%7.3f s")
    spark.stop()
  }
}
