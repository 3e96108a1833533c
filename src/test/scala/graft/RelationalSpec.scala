package graft

import org.apache.spark.sql.functions._
import graft.analytics.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query key has an oracle") {
    assert(Relational.queries.keySet == Relational.oracles.keySet)
  }

  test("pricing summary aggregates are internally consistent") {
    val row = Relational.pricingSummary(spark, sf)
      .filter(col("l_returnflag") === "A").collect().head
    val sumQty = row.getAs[Double]("sum_qty")
    val avgQty = row.getAs[Double]("avg_qty")
    val n = row.getAs[Long]("count_order")
    assert(math.abs(sumQty / n - avgQty) < 0.01)
  }

  test("filter on lineitem is pushed to the parquet scan") {
    val df = Relational.pricingSummary(spark, sf)
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected pushed filter in plan:\n$p")
  }

  test("dimension joins in revenueByNation are broadcast") {
    val p = plan(Relational.revenueByNation(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no SMJ expected for dim joins:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.topOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
  }

  test("anti join complements the semi join exactly") {
    val inactive = Relational.customersWithoutOrders(spark, sf)
      .agg(coalesce(sum(col("n_inactive")), lit(0L))).collect().head.getLong(0)
    val c = graft.ingest.Sources.customer(spark, sf).count()
    val active = graft.ingest.Sources.orders(spark, sf)
      .filter(col("o_totalprice") > lit(250000.0))
      .select(col("o_custkey")).distinct().count()
    assert(inactive == c - active)
  }

  test("set ops: result excludes negative-balance customers") {
    val res = Relational.segmentSetOps(spark, sf)
    val negative = graft.ingest.Sources.customer(spark, sf)
      .filter(col("c_acctbal") < 0).select(col("c_custkey"))
    assert(res.join(negative, Seq("c_custkey"), "left_semi").count() == 0)
  }

  test("rank window: at most 3 customers per nation") {
    val mx = Relational.topCustomersPerNation(spark, sf)
      .groupBy(col("n_name")).count()
      .agg(max("count")).collect().head.getLong(0)
    assert(mx <= 3)
  }

  test("top-k-per-group plan uses WindowGroupLimit (map-side rank pruning)") {
    // Catalyst's InsertWindowGroupLimit turns rank<=k into a per-partition
    // group limit BEFORE the shuffle — at 100 TB only k rows per group per
    // mapper survive, so no custom top-k operator is needed
    val p = plan(Relational.topCustomersPerNation(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"plan:\n$p")
  }

  test("full outer join: both unmatched quadrants genuinely occur") {
    val out = Relational.customerOrderFullOuter(spark, sf).collect()
    // dim-only rows (in segment, no 1995 orders)
    assert(out.exists(r =>
      r.getAs[Boolean]("in_segment") && !r.getAs[Boolean]("ordered_95")))
    // order-only rows (1995 orders from outside the segment)
    assert(out.exists(r =>
      !r.getAs[Boolean]("in_segment") && r.getAs[Boolean]("ordered_95")))
    // coalesced key is never null and each row comes from somewhere
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("custkey")) &&
      (r.getAs[Boolean]("in_segment") || r.getAs[Boolean]("ordered_95"))))
  }

  test("table diff classifies every reconciliation class with exact counts") {
    val out = Relational.tableDiff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"), r.getAs[Double]("abs_drift"))).toMap
    val orders = graft.ingest.Sources.orders(spark, sf)
    val nRemoved = orders.filter(col("o_orderstatus") === "F" && col("o_orderkey") % 100 < 10).count()
    val nChanged = orders.filter(col("o_orderstatus") === "O" && col("o_orderkey") % 100 < 5).count()
    val nAdded = orders.filter(col("o_orderstatus") === "P").count()
    val total = orders.count()
    assert(out("removed")._1 == nRemoved)
    assert(out("added")._1 == nAdded)
    assert(out("changed")._1 == nChanged, "every repriced row must differ (price > 0)")
    assert(out("same")._1 == total - nRemoved - nChanged)
    assert(out("same")._2 == 0.0, "unchanged rows must show zero drift")
    assert(out("changed")._2 > 0.0 && out("removed")._2 > 0.0 && out("added")._2 > 0.0)
  }

  test("supplier share: top-3 ranks, descending revenue, share against nation total") {
    val rows = Relational.supplierShare(spark, sf).collect()
    assert(rows.nonEmpty)
    val nationTotals = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("c"))
      .groupBy(col("l_suppkey")).agg(sum(col("c")).as("cents"))
      .join(graft.ingest.Sources.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.ingest.Sources.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(sum(col("cents")).as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (nation, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to byRank.length),
        s"$nation ranks not 1..k")
      assert(byRank.length <= 3)
      val revs = byRank.map(_.getAs[Double]("revenue"))
      assert(revs.sorted.reverse.toSeq == revs.toSeq, s"$nation not rank-ordered")
      byRank.foreach { r =>
        val expect = BigDecimal(r.getAs[Double]("revenue") * 100 /
          nationTotals(nation)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("share") - expect) < 1e-6,
          s"$nation share off for ${r.getString(1)}")
      }
    }
  }

  test("order skyline equals brute-force dominance over the full table") {
    val pts = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate, r.getLong(2)))
    // brute force: p survives iff no q is >= on both axes and > on one
    val expect = pts.filter { case (_, d, c) =>
      !pts.exists { case (_, qd, qc) =>
        !qd.isBefore(d) && qc <= c && (qd.isAfter(d) || qc < c)
      }
    }.map(p => (p._1, p._2, p._3)).toSet
    val got = graft.analytics.Relational.orderSkyline(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate,
        math.round(r.getDouble(2) * 100))).toSet
    assert(got == expect,
      s"skyline mismatch: missing ${expect -- got}, extra ${got -- expect}")
    assert(got.nonEmpty, "degenerate empty frontier")
    // frontier property: walking newest -> oldest, an older survivor
    // must be strictly cheaper (else the newer one dominates it);
    // same-date neighbors are equal-price duplicates, both kept
    val walk = got.toSeq.sortBy(p => (p._2.toEpochDay, p._3)).reverse
    walk.sliding(2).foreach {
      case Seq(newer, older) =>
        assert(older._3 < newer._3 || newer._2 == older._2,
          s"non-frontier pair $newer / $older")
      case _ => ()
    }
  }

  test("RFM: scores are 1..5 quintiles partitioning all customers; cells reconcile") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Relational.rfmSegmentation(spark, sf).collect()
    val nCust = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5, s"$c=$v")
      }
    }
    // each quintile holds n/5 +- 1 customers (ntile remainder rule)
    val perR = rows.groupBy(_.getAs[Int]("r_score")).view
      .mapValues(_.map(_.getAs[Long]("n_customers")).sum)
    assert(perR.values.max - perR.values.min <= 1,
      s"r quintiles not equi-depth: $perR")
  }

  test("Pareto ABC: classes partition catalog revenue with the 80/95 boundaries") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Relational.paretoAbc(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    val totParts = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == totParts)
    val cents = rows.map(r => r.getString(0) -> r.getAs[Long]("cents")).toMap
    val tot = cents.values.sum
    // class sums ARE the boundary cumulatives: last-A cumulative <= 80%,
    // last-B cumulative <= 95% (exact integer comparisons by construction)
    assert(cents("A") * 100 <= tot * 80, "A block exceeds the 80% boundary")
    assert((cents("A") + cents("B")) * 100 <= tot * 95,
      "A+B block exceeds the 95% boundary")
    assert(cents("A") > cents("C"), "head class must out-earn the tail class")
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    rows.zip(shares).foreach { case (r, sp) =>
      assert(sp == r.getAs[Long]("cents") * 1000000L / tot)
    }
  }

  test("integrity audit: suite is complete, clean checks are clean, the temporal check fires") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Relational.integrityAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(rows.keySet == Set("orders_pk_dup", "lineitem_pk_dup",
      "orders_custkey_fk", "lineitem_orderkey_fk", "price_nonpositive",
      "discount_out_of_range", "ship_before_order"))
    // orders keys/FKs/domains are clean by construction
    Seq("orders_pk_dup", "orders_custkey_fk", "lineitem_orderkey_fk",
      "price_nonpositive", "discount_out_of_range").foreach { c =>
      assert(rows(c) == 0L, s"$c unexpectedly fires: ${rows(c)}")
    }
    // an all-zero suite is a vacuous oracle: the two checks the
    // synthetic corpus actually violates must fire, at exact recounts
    val dupLn = graft.ingest.Sources.lineitem(spark, sf)
      .groupBy(col("l_orderkey"), col("l_linenumber")).count()
      .filter(col("count") > 1).count()
    assert(dupLn > 0 && rows("lineitem_pk_dup") == dupLn)
    val direct = graft.ingest.Sources.lineitem(spark, sf)
      .join(graft.ingest.Sources.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate")).count()
    assert(direct > 0, "fixture has no ship-before-order lines — vacuous")
    assert(rows("ship_before_order") == direct)
  }
}
