// diagnostic: sourceLeakage pipeline variants at sf0.1
package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object SlProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[slprof] $name%-28s min=${ts.map(_._1).min}%6.2f s rows=${ts.head._2}")
    }

    import graft.analytics.TextOps
    val K = 32; val B = 8; val r = K / B

    // shared: signature frame (private[graft], visible from subpackage)
    def sigArr(): DataFrame =
      TextOps.sigArraysOf(spark.read.parquet(s"$sf/documents.parquet"))

    def bucketsOf(s: DataFrame): DataFrame = {
      val bandCols: Seq[Column] = (0 until B).map { band =>
        md5(concat_ws(",", (band * r until (band + 1) * r)
          .map(i => element_at(col("sig"), i + 1)): _*))
      }
      s.select(col("doc_id"), col("lang"), col("source"), col("sig"),
        array(bandCols: _*).as("buckets"))
    }

    // V1: slim join + distinct + rejoins (round-6-early shape)
    time("v1_distinct_rejoin") {
      val sg = sigArr().localCheckpoint()
      val bd = bucketsOf(sg).select(col("doc_id"), col("lang"), col("source"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      val a = bd.select(col("doc_id").as("doc_a"), col("source").as("source_a"),
        col("lang"), col("band"), col("bucket"))
      val b = bd.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
        col("band"), col("bucket"), col("lang"))
      val pairs = a.join(b, Seq("lang", "band", "bucket"))
        .filter(col("doc_a") < col("doc_b") && col("source_a") =!= col("source_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val out = pairs
        .join(sg.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
          col("lang"), col("source").as("source_a")), Seq("doc_a"))
        .join(sg.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
          col("source").as("source_b")), Seq("doc_b"))
        .count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(sg)
      out
    }

    // V2: join carries sigs, lane-level first-band filter (current)
    time("v2_sig_lanefilter") {
      val n = TextOps.sourceLeakage(spark, sf).count()
      n
    }

    // V3: join carries buckets array only, bucket-level first-band filter,
    //     then rejoins for sigs
    time("v3_buckets_rejoin") {
      val sg = sigArr().localCheckpoint()
      val bk = bucketsOf(sg)
      val bd = bk.select(col("doc_id"), col("lang"), col("source"), col("buckets"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      val a = bd.select(col("doc_id").as("doc_a"), col("source").as("source_a"),
        col("lang"), col("band"), col("bucket"), col("buckets").as("bk_a"))
      val b = bd.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
        col("band"), col("bucket"), col("lang"), col("buckets").as("bk_b"))
      val firstBand = least((0 until B).map { j =>
        when(element_at(col("bk_a"), j + 1) === element_at(col("bk_b"), j + 1),
          lit(j)).otherwise(lit(Int.MaxValue))
      }: _*)
      val pairs = a.join(b, Seq("lang", "band", "bucket"))
        .filter(col("doc_a") < col("doc_b") && col("source_a") =!= col("source_b"))
        .filter(col("band") === firstBand)
        .select(col("doc_a"), col("doc_b"))
      val out = pairs
        .join(sg.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
          col("lang"), col("source").as("source_a")), Seq("doc_a"))
        .join(sg.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
          col("source").as("source_b")), Seq("doc_b"))
        .count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(sg)
      out
    }

    // V4: join output count only (no dedup at all) — the raw collision volume
    time("v4_raw_collisions") {
      val sg = sigArr().localCheckpoint()
      val bd = bucketsOf(sg).select(col("doc_id"), col("lang"), col("source"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      val a = bd.select(col("doc_id").as("doc_a"), col("source").as("source_a"),
        col("lang"), col("band"), col("bucket"))
      val b = bd.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
        col("band"), col("bucket"), col("lang"))
      val out = a.join(b, Seq("lang", "band", "bucket"))
        .filter(col("doc_a") < col("doc_b") && col("source_a") =!= col("source_b"))
        .count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(sg)
      out
    }

    spark.stop()
  }
}
