// scratch diagnostic: deletion-vector and bloom-index scale claims, measured
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 instrument for the two new manifest capabilities' scale
  * claims — each a measured curve, not an argument:
  *
  * 1. `delete` — a SCATTERED key-list delete (every Pth key, the
  *    GDPR/right-to-be-forgotten shape: matches land in EVERY file, so
  *    the stats envelope cannot contain the rewrite) on tables of
  *    multiplier M. [[graft.sinks.ManifestTable.deleteWhereMor]] must
  *    stay ~flat in M — it writes O(matches) sidecar bytes — while the
  *    copy-on-write [[graft.sinks.ManifestTable.deleteWhere]] rewrites
  *    the whole table, growing linearly. Both lanes' surviving content
  *    is require()d identical (count + cents sum) per cell.
  *
  * 2. `readtax` — full-scan aggregate latency vs live deleted
  *    fraction f: the broadcast anti-join's read-side overhead as
  *    vectors accumulate, then ONE [[graft.sinks.ManifestTable
  *    .materializeDeletes]] and the restored clean-floor time — the
  *    crossover data the materialization threshold knob needs.
  *
  * 3. `bloom` — point lookup vs file count F at constant total rows:
  *    [[graft.sinks.ManifestTable.bloomIndex]] build time (one
  *    distributed job), [[graft.sinks.ManifestTable.pruneFilesBloom]]
  *    probe time and kept-file count, and [[graft.sinks.ManifestTable
  *    .readPoint]] end-to-end vs the full-scan `filter(isin)` twin.
  *    The probe's job is O(F) tiny sidecar reads; the payoff is the
  *    scan opening ~3+fpp·F files instead of F — the gap that widens
  *    linearly with F.
  *
  * args: [experiment csv: delete,readtax,bloom] (default all)
  *       [multipliers csv for delete] (default 1,2,4,8)
  *       [file counts csv for bloom] (default 16,64,256,1024)
  */
object DvBound {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e6, a)
  }

  private def tmpPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dvb_$tag").toString + "/t"

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(go)
      f.delete(): Unit
    }
    go(new java.io.File(path).getParentFile)
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.map(_.split(",").toSet)
      .getOrElse(Set("delete", "readtax", "bloom"))
    val multipliers = args.lift(1).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(1, 2, 4, 8))
    val fileCounts = args.lift(2).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(16, 64, 256, 1024))
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sinks.ManifestTable
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .localCheckpoint(eager = true)
    val n0 = base.count()
    val span = base.agg(max(col("o_orderkey"))).head().getAs[Number](0)
      .longValue + 1L

    /** M shifted replicas, range-laid by key into 16·M files. */
    def replicated(m: Int): DataFrame = {
      val parts = (0 until m).map(i => base
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * span)))
      parts.reduce(_.unionByName(_))
        .repartitionByRange(16 * m, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
    }

    if (which("delete")) {
      println("== delete: scattered key-list, MOR vs copy-on-write ==")
      println("M\trows\tfiles\tmatch\tmor_ms\tcow_ms\tmor_kb_written\tcow_kb_written")
      multipliers.foreach { m =>
        val rows = n0 * m
        // every Pth key: ~1000 matches regardless of M, in EVERY file
        val p = math.max(1L, rows / 1000L)
        val pred = col("o_orderkey") % lit(p) === 0L
        val lo = 0.0
        val hi = (span * m + 1).toDouble
        val pMor = tmpPath("mor"); val pCow = tmpPath("cow")
        val laid = replicated(m).localCheckpoint(eager = true)
        ManifestTable.replace(laid, pMor)
        ManifestTable.replace(laid, pCow)
        val f0 = ManifestTable.snapshotFiles(spark, pMor, None).toSet
        val (tMor, vMor) = time(ManifestTable.deleteWhereMor(
          spark, pMor, pred, "o_orderkey", lo, hi).get)
        val (tCow, vCow) = time(ManifestTable.deleteWhere(
          spark, pCow, pred, "o_orderkey", lo, hi).get)
        def bytesOf(path: String, names: Iterable[String]): Long =
          names.map(n => new java.io.File(s"$path/data/$n").length()).sum
        // bytes WRITTEN by the delete: new data files plus (for MOR)
        // the vector sidecar — the write-amplification axis itself,
        // honest where toy-scale wall time is machinery-dominated
        val morNew = ManifestTable.snapshotFiles(spark, pMor, Some(vMor)).toSet
          .diff(f0)
        val morBytes = bytesOf(pMor, morNew) + bytesOf(pMor,
          ManifestTable.dvEntries(spark, pMor, Some(vMor)).map(_._1).distinct)
        val cowNew = ManifestTable.snapshotFiles(spark, pCow, Some(vCow)).toSet
          .diff(f0)
        val cowBytes = bytesOf(pCow, cowNew)
        val a = ManifestTable.read(spark, pMor)
          .agg(count(lit(1)), sum(col("cents"))).head()
        val b = ManifestTable.read(spark, pCow)
          .agg(count(lit(1)), sum(col("cents"))).head()
        require(a == b, s"MOR and CoW disagree at M=$m: $a vs $b")
        val matched = rows - a.getLong(0)
        println(f"$m\t$rows\t${f0.size}\t$matched\t$tMor%.0f\t$tCow%.0f" +
          f"\t${morBytes / 1024}%d\t${cowBytes / 1024}%d")
        laid.unpersist(blocking = true)
        rm(pMor); rm(pCow)
      }
    }

    if (which("readtax")) {
      println("== readtax: full-scan aggregate vs live deleted fraction ==")
      println("phase\tfraction\tdv_rows\tscan_ms (min of 3)")
      val path = tmpPath("tax")
      val laid = replicated(2).localCheckpoint(eager = true)
      ManifestTable.replace(laid, path)
      val rows = n0 * 2
      def scanMs(): Double = (1 to 3).map { _ =>
        time(ManifestTable.read(spark, path)
          .agg(sum(col("cents")), count(lit(1))).head())._1
      }.min
      println(f"clean\t0.000\t0\t${scanMs()}%.0f")
      var deleted = 0L
      // successive scattered vectors stepping the fraction up
      Seq(0.01, 0.04, 0.05, 0.10).zipWithIndex.foreach { case (step, i) =>
        val p = math.max(1L, math.round(1.0 / step))
        val pred = col("o_orderkey") % lit(p) === lit((i + 1).toLong)
        ManifestTable.deleteWhereMor(spark, path, pred,
          "o_orderkey", 0.0, (span * 2 + 1).toDouble)
        deleted = rows - ManifestTable.countRows(spark, path)
        println(f"vectors\t${deleted.toDouble / rows}%.3f\t$deleted" +
          f"\t${scanMs()}%.0f")
      }
      val (tMat, _) = time(ManifestTable.materializeDeletes(spark, path).get)
      println(f"materialize (one call): $tMat%.0f ms")
      println(f"after\t0.000\t0\t${scanMs()}%.0f")
      laid.unpersist(blocking = true)
      rm(path)
    }

    if (which("hint")) {
      println("== hint: latest-version discovery vs manifest-log length ==")
      println("commits\thinted_ms (min of 5)\tlisting_ms (min of 5)")
      Seq(100, 1000, 10000, 100000).foreach { nv =>
        val path = tmpPath("hint")
        ManifestTable.replace(base.limit(10), path)
        // fabricate a long commit history: copies of the real manifest
        // (latestVersion never reads content, only names + the hint)
        val mdir = new java.io.File(s"$path/_manifests")
        val src = new java.io.File(mdir, f"manifest-${0}%09d").toPath
        (1 until nv).foreach { i =>
          java.nio.file.Files.copy(src,
            new java.io.File(mdir, f"manifest-$i%09d").toPath): Unit
        }
        ManifestTable.writeLatestHint(spark, path, (nv - 1).toLong)
        def minOf(f: => Option[Long]): Double =
          (1 to 5).map(_ => time(f)._1).min
        val tHint = minOf(ManifestTable.latestVersion(spark, path))
        require(ManifestTable.latestVersion(spark, path)
          .contains((nv - 1).toLong))
        val tList = minOf(ManifestTable.versions(spark, path).lastOption)
        println(f"$nv\t$tHint%.1f\t$tList%.1f")
        rm(path)
      }
    }

    if (which("source")) {
      println("== source: graft-table row-at-a-time decode vs vectorized read ==")
      println("rows\tfiles\tstream_ms\tvectorized_ms\tstream_rows_per_s")
      Seq(1, 4).foreach { m =>
        val path = tmpPath("src")
        val laid = replicated(m).localCheckpoint(eager = true)
        ManifestTable.replace(laid, path)
        val rows = n0 * m
        val outDir = path + "_out"
        val (tStream, _) = time {
          val q = spark.readStream.format("graft-table")
            .option("path", path).load()
            .writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              b.write.mode("append").parquet(outDir): Unit
            }
            .option("checkpointLocation", path + "_chk")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        require(spark.read.parquet(outDir).count() == rows,
          "source initial load dropped rows")
        val (tVec, _) = time(ManifestTable.read(spark, path)
          .agg(count(lit(1))).head())
        println(f"$rows\t${16 * m}\t$tStream%.0f\t$tVec%.0f" +
          f"\t${rows / (tStream / 1000)}%.0f")
        laid.unpersist(blocking = true)
        rm(path)
      }
      println("(the feed is delta-sized by construction — the decode " +
        "tax applies to CHANGED files only, never the table)")
    }

    if (which("bloom")) {
      println("== bloom: point lookup vs file count, constant rows ==")
      println("F\tbuild_ms\tprobe_ms\tkept\treadpoint_ms\tfullscan_ms")
      fileCounts.foreach { fCount =>
        val path = tmpPath("bl")
        // laid by a hash so the key envelope is useless in every file
        ManifestTable.replace(
          base.withColumn("h", hash(col("o_orderkey")))
            .repartitionByRange(fCount, col("h")).sortWithinPartitions("h")
            .drop("h"), path)
        val (tBuild, _) = time(
          ManifestTable.bloomIndex(spark, path, "o_orderkey").get)
        val keys = Seq(1L, span / 2, span - 1).map(k =>
          base.filter(col("o_orderkey") >= k).agg(min(col("o_orderkey")))
            .head().getAs[Number](0).longValue)
        val (tProbe, kept) = time(ManifestTable.pruneFilesBloom(
          spark, path, "o_orderkey", keys.map(_.toString))._1)
        val (tPoint, nP) = time(ManifestTable.readPoint(
          spark, path, "o_orderkey", keys).count())
        val (tFull, nF) = time(ManifestTable.read(spark, path)
          .filter(col("o_orderkey").isin(keys: _*)).count())
        require(nP == nF, s"bloom lookup wrong at F=$fCount: $nP vs $nF")
        println(f"$fCount\t$tBuild%.0f\t$tProbe%.0f\t${kept.size}" +
          f"\t$tPoint%.0f\t$tFull%.0f")
        rm(path)
      }
    }
    spark.stop()
  }
}
