package graft

import org.apache.spark.sql.functions._
import graft.analytics.Privacy

class PrivacySpec extends SparkSpec {

  test("piiMask: no raw identifier survives, group_k is the true anonymity-set size") {
    val masked = Privacy.piiMask(spark, sf)
    val rows = masked.collect()
    // pseudonymized columns never carry the raw values
    assert(rows.forall(_.getAs[String]("pseudo_id").length == 16))
    assert(rows.forall(r => r.getAs[String]("name_token").length == 32 &&
      !r.getAs[String]("name_token").contains("Customer")))
    // balance_band is a 100-multiple (generalization, not the raw balance)
    assert(rows.forall(_.getAs[Long]("balance_band") % 100 == 0))
    // group_k on each row equals the recomputed size of its QI group
    val recomputed = masked
      .groupBy(col("nation"), col("segment"), col("balance_band"))
      .agg(count(lit(1)).as("k"), first(col("group_k")).as("claimed"),
        countDistinct(col("group_k")).as("n_claims"))
      .collect()
    assert(recomputed.forall(r => r.getAs[Long]("n_claims") == 1 &&
      r.getAs[Long]("k") == r.getAs[Long]("claimed")),
      "group_k disagrees with the recomputed QI group size")
    // row count preserved: masking is 1:1, never filters
    assert(masked.count() ==
      graft.ingest.Sources.customer(spark, sf).count())
  }

  test("piiMask pseudo_id is deterministic and key-stable across runs") {
    val a = Privacy.piiMask(spark, sf).select("pseudo_id").collect().map(_.getString(0))
    val b = Privacy.piiMask(spark, sf).select("pseudo_id").collect().map(_.getString(0))
    assert(a.sameElements(b))
    assert(a.distinct.length == a.length, "pseudo_id collision on the test keyspace")
  }

  test("lDiversity: k and l reproduce a driver-side recount; flag honors the threshold") {
    val raw = graft.ingest.Sources.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => ((r.getLong(0), r.getString(1),
        (r.getDouble(2) / 100).floor.toLong * 100),
        r.getDouble(2)))
    val byGroup = raw.groupBy(_._1)
    val rows = Privacy.lDiversity(spark, sf).collect()
    assert(rows.length == byGroup.size, "one row per QI group")
    rows.foreach { r =>
      val key = (r.getLong(0), r.getString(1), r.getLong(2))
      val members = byGroup(key)
      assert(r.getAs[Long]("k") == members.length.toLong, s"$key k")
      assert(r.getAs[Long]("l_distinct") ==
        members.map(_._2).distinct.length.toLong, s"$key l")
      assert(r.getAs[Long]("diverse") ==
        (if (r.getAs[Long]("l_distinct") >= Privacy.LDiv) 1L else 0L))
    }
    // the audit must be able to fail: both flag values occur at sf0.001
    assert(rows.exists(_.getAs[Long]("diverse") == 0L) ||
      rows.forall(_.getAs[Long]("k") < Privacy.LDiv),
      "fixture has no non-diverse group — threshold test vacuous")
    // k mass conserves the table
    assert(rows.map(_.getAs[Long]("k")).sum == raw.length.toLong)
  }

  test("DP counts: noise ladder is symmetric, bounded, deterministic and correctly applied") {
    val a = Privacy.dpCounts(spark, sf).collect()
    val b = Privacy.dpCounts(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "mechanism must be a pure function of the cell key")
    a.foreach { r =>
      val (t, n, out) = (r.getAs[Long]("n_true"), r.getAs[Long]("noise"),
        r.getAs[Long]("n_noisy"))
      assert(math.abs(n) <= 8, s"noise $n outside the truncation bound")
      assert(out == math.max(t + n, 0L), "clamp-at-zero post-processing broken")
    }
    // distribution audit over a wide synthetic key space: P(noise=0)
    // must be ~1/3 and the truncated ladder symmetric (mean ~0)
    import spark.implicits._
    val u = graft.operators.Scale.md5Uniform(concat(lit("audit:"),
      col("value").cast("string")))
    val noise = Privacy.GeoCdf.reverse
      .foldLeft(lit(8L): org.apache.spark.sql.Column) {
        case (tail, (t, k)) => when(u < lit(t.toDouble), k.toLong).otherwise(tail)
      }
    val stats = (1 to 20000).toDF("value").select(noise.as("n"))
      .agg(avg(when(col("n") === 0L, 1.0).otherwise(0.0)).as("p0"),
        avg(col("n").cast("double")).as("mean"),
        max(abs(col("n"))).as("mx"))
      .head()
    assert(math.abs(stats.getDouble(0) - 1.0 / 3) < 0.02,
      s"P(0) = ${stats.getDouble(0)} far from 1/3")
    assert(math.abs(stats.getDouble(1)) < 0.05,
      s"truncated ladder biased: mean ${stats.getDouble(1)}")
    assert(stats.getLong(2) <= 8L)
  }

  test("DP user counts: per-user influence is bounded by L0*Linf; bounding only ever shrinks") {
    import graft.analytics.Privacy
    val out = Privacy.dpUserCounts(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val raw = r.getAs[Long]("n_raw"); val b = r.getAs[Long]("n_bounded")
      assert(b <= raw, "clipping increased a count")
      assert(math.abs(r.getAs[Long]("noise")) <= 8)
      assert(r.getAs[Long]("n_noisy") == math.max(b + r.getAs[Long]("noise"), 0L))
    }
    // driver replay: per-customer total contribution across ALL cells
    // is <= DpMaxCellsPerUser * DpMaxPerCell, and the kept-cell
    // selection replays from the md5 rule
    val perCell = graft.ingest.Sources.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderpriority"),
        year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val uniOf = perCell.map { case (c, p, y, _) =>
      ((c, p, y), graft.operators.Scale.md5UniformJvm(s"dpsel:$c:$p:$y"))
    }.toMap
    val boundedByCell = scala.collection.mutable.Map.empty[(String, Int), Long]
    perCell.groupBy(_._1).foreach { case (_, cells) =>
      val kept = cells.sortBy { case (c, p, y, _) => (uniOf((c, p, y)), p, y) }
        .take(Privacy.DpMaxCellsPerUser)
      val total = kept.map(t => math.min(t._4, Privacy.DpMaxPerCell)).sum
      assert(total <= Privacy.DpMaxCellsPerUser * Privacy.DpMaxPerCell)
      kept.foreach { case (_, p, y, n) =>
        val k = (p, y)
        boundedByCell(k) = boundedByCell.getOrElse(k, 0L) +
          math.min(n, Privacy.DpMaxPerCell)
      }
    }
    out.foreach { r =>
      val k = (r.getAs[String]("o_orderpriority"), r.getAs[Int]("o_year"))
      assert(boundedByCell.getOrElse(k, 0L) == r.getAs[Long]("n_bounded"),
        s"cell $k bounded count does not replay")
    }
    // the clip is non-vacuous on this corpus
    assert(out.exists(r => r.getAs[Long]("n_bounded") < r.getAs[Long]("n_raw")),
      "bounding changed nothing - vacuous fixture")
  }

  test("t-closeness: EMD replays driver-side in exact ppm integers") {
    import org.apache.spark.sql.functions._
    val rows = graft.ingest.Sources.customer(spark, sf)
      .select(col("c_nationkey").cast("long"),
        col("c_mktsegment"),
        (floor(col("c_acctbal") / 100) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bands = rows.map(_._3).distinct.sorted
    val m = bands.length
    val nAll = rows.length.toLong
    val cumAll = bands.map(b => b -> rows.count(_._3 <= b).toLong).toMap
    val out = graft.analytics.Privacy.tCloseness(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nat, seg) = (r.getAs[Long]("nation"), r.getAs[String]("segment"))
      val g = rows.filter(t => t._1 == nat && t._2 == seg)
      val nG = g.length.toLong
      assert(r.getAs[Long]("n_g") == nG)
      val emd = bands.map { b =>
        val cumG = g.count(_._3 <= b).toLong
        math.abs(1000000L * cumG / nG - 1000000L * cumAll(b) / nAll)
      }.sum / (m - 1)
      assert(r.getAs[Long]("emd_ppm") == emd, s"($nat,$seg) EMD")
      assert(emd >= 0 && emd <= 1000000L, s"($nat,$seg) EMD out of [0, 1e6]")
      assert(r.getAs[Long]("t_close") ==
        (if (emd <= graft.analytics.Privacy.TClosePpm) 1L else 0L))
    }
  }
}
