package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.analytics.Affinity
import graft.operators.Graph

class AffinitySpec extends SparkSpec {

  private def edgeDf(pairs: (Long, Long)*) = {
    val rows = pairs.flatMap { case (a, b) => Seq(Row(a, b), Row(b, a)) }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))
  }

  test("co-purchase counts equal a brute-force basket recount") {
    val out = Affinity.partCopurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("support")).toMap
    val baskets = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val brute = baskets.values.flatMap { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= Affinity.MinSupport).toMap
    assert(out == brute, s"support mismatch: ${out.size} vs ${brute.size} pairs")
    assert(out.nonEmpty, "no co-purchased pairs at all")
  }

  test("co-purchase lift is the exact integer-count ratio") {
    val rows = Affinity.partCopurchase(spark, sf).collect()
    val nOrders = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_orderkey")).distinct().count()
    rows.foreach { r =>
      val expect = BigDecimal(
        r.getAs[Long]("support").toDouble * nOrders /
          (r.getAs[Long]("cnt_a") * r.getAs[Long]("cnt_b")))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("lift") - expect) < 1e-9,
        s"lift mismatch on ${r.getLong(0)},${r.getLong(1)}")
    }
  }

  test("pagerank on a crafted star: hub outranks leaves, leaves tie") {
    // star 1-(2,3,4): hub collects three full contributions, each leaf
    // one third of the hub's
    val pr = Graph.pagerank(edgeDf((1L, 2L), (1L, 3L), (1L, 4L)), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("r")).toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L))
    assert(pr(1L) > pr(2L), "hub must outrank a leaf")
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L),
      "symmetric leaves must tie exactly (integer determinism)")
  }

  test("personalized pagerank: seed bias, unreachable zero, all-seeds reduces to uniform") {
    // path 1-2-3-4 plus isolated pair 5-6: teleport pinned to {1}
    val edges = edgeDf((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
    val ppr = Graph.personalizedPagerank(edges, Set(1L), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("r")).toMap
    // mass decays with distance from the seed
    assert(ppr(1L) > ppr(3L), "seed must outrank a 2-hop vertex")
    assert(ppr(2L) > ppr(4L), "1-hop must outrank 3-hop")
    // the disconnected component gets NO mass (global pagerank gives
    // every vertex at least the teleport floor — the defining
    // difference of the personalized variant)
    assert(ppr(5L) == 0L && ppr(6L) == 0L,
      "unreachable vertices must hold zero personalized rank")
    // seeding EVERY vertex is exactly the uniform teleport: bit-equal
    // to the global operator on the same graph
    val allV = Set(1L, 2L, 3L, 4L, 5L, 6L)
    val uni = Graph.personalizedPagerank(edges, allV, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("r")).toMap
    val global = Graph.pagerank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("r")).toMap
    assert(uni == global, "all-seeds PPR must be bit-identical to pagerank")
  }

  test("pagerank conserves scaled mass up to truncation loss") {
    val scale = 1000000000000L
    val pr = Graph.pagerank(
      edgeDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)),
      iters = 4, scale = scale)
      .agg(sum(col("r"))).head().getLong(0)
    // each iteration loses < 1 unit per edge-end + 1 per damping DIV
    assert(pr <= scale, s"mass created: $pr > $scale")
    assert(pr >= scale - 1000L, s"mass lost beyond truncation bound: $pr")
  }

  test("convergence-driven pagerank reaches the fixed point of the fixed-iters operator") {
    val edges = edgeDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (2L, 4L))
    val (pr, rounds) = Graph.pagerankConverged(edges, maxIters = 50)
    assert(rounds > 1 && rounds < 50, s"suspicious convergence in $rounds rounds")
    val fixed = pr.collect().map(r => r.getLong(0) -> r.getAs[Long]("r")).toMap
    // running the FIXED-iteration operator at >= the convergence round
    // count lands on the same integer vector (the fixed point)
    val more = Graph.pagerank(edges, iters = rounds + 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("r")).toMap
    assert(fixed == more,
      s"converged vector is not the fixed point: $fixed vs $more")
    // mass is conserved up to truncation, as for the fixed-iters op
    val total = fixed.values.sum
    assert(total <= 1000000000000L && total >= 1000000000000L - 1000L)
  }

  test("pagerank on a regular graph is uniform and iteration-invariant") {
    // 4-cycle: every vertex identical by symmetry at every iteration
    val pr = Graph.pagerank(edgeDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)),
      iters = 5)
      .collect().map(_.getAs[Long]("r")).toSet
    assert(pr.size == 1, s"regular graph must rank uniformly, got $pr")
  }

  test("triangle counts equal a brute-force recount and coefficients stay in [0,1]") {
    val rows = Affinity.partTriangles(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute-force: rebuild the support-filtered half-edge set and count
    val baskets = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCounts = baskets.values.flatMap { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    // NOT `collect { case (e, c) if ... => e }.toSet`: collect on a Map
    // with a pair-valued function builds another MAP, so edge tuples
    // (a, b) collapse by key a and most edges vanish silently
    val edges = pairCounts.filter(_._2 >= Affinity.MinSupport).keySet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerVertex = adj.map { case (p, ns) =>
      p -> ns.toSeq.combinations(2).count {
        case Seq(x, y) => adj(x).contains(y)
        case _ => false
      }.toLong
    }
    rows.foreach { r =>
      val (p, deg, tri, cc) = (r.getLong(0), r.getAs[Long]("deg"),
        r.getAs[Long]("tri"), r.getAs[Double]("clustering"))
      assert(deg == adj(p).size.toLong, s"degree mismatch at $p")
      assert(tri == triPerVertex(p), s"triangle count mismatch at $p")
      assert(cc >= 0.0 && cc <= 1.0, s"clustering out of range at $p")
      assert(tri <= deg * (deg - 1) / 2, s"more triangles than wedges at $p")
    }
    assert(rows.map(_.getLong(0)).toSet == adj.keySet)
  }

  test("degree orientation bounds hub wedges: star graph generates O(1), not O(deg²)") {
    // hub 50 sits in the MIDDLE of the id range with 80 spokes: the
    // id-ordered wedge join e(x,50)⋈e(50,z) would generate 40×40
    // center wedges; degree orientation points every spoke AT the hub
    // (out-degree 0), so wedges come only from the planted triangle
    val spokes = ((1L to 40L) ++ (60L to 99L)).map(i =>
      (math.min(i, 50L), math.max(i, 50L)))
    val tri = Seq((1L, 2L)) // closes triangle {1, 2, 50}
    val rows = (spokes ++ tri).map { case (u, v) => Row(u, v) }
    val half = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("u", LongType), StructField("v", LongType))))
    val deg = Affinity.degrees(half)
    val dirE = Affinity.orientEdges(half, deg)
    // every oriented edge must point low-to-high degree (tie: id)
    val degMap = deg.collect().map(r => r.getLong(0) -> r.getAs[Long]("deg")).toMap
    dirE.collect().foreach { r =>
      val (s, d) = (r.getAs[Long]("src"), r.getAs[Long]("dst"))
      assert(Ordering[(Long, Long)].lt((degMap(s), s), (degMap(d), d)),
        s"mis-oriented edge $s->$d")
      assert(r.getAs[Long]("ddeg") == degMap(d), s"stale ddeg on $s->$d")
    }
    val wedges = Affinity.orientedWedges(dirE)
    assert(wedges.count() == 1,
      "hub spokes must generate no wedges under degree orientation")
    val triangles = wedges
      .join(dirE.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"))
    assert(triangles.count() == 1, "exactly the planted triangle")
    assert(triangles.select(col("x"), col("y"), col("z")).collect().map(r =>
      Set(r.getLong(0), r.getLong(1), r.getLong(2))).head == Set(1L, 2L, 50L))
  }

  test("apriori triples: support monotonicity and pair consistency on the fixture") {
    val rows = Affinity.aprioriTriples(spark, sf).collect()
    assert(rows.nonEmpty, "fixture yields no frequent triples — vacuous")
    rows.foreach { r =>
      val (a, b, c) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("part_c"))
      assert(a < b && b < c, s"triple not canonical: ($a,$b,$c)")
      val s = r.getAs[Long]("support")
      // Apriori property: a triple can never be more frequent than any
      // of its sub-pairs — if this fails, the pruning join keys are
      // misaligned and the counting is wrong
      assert(s <= r.getAs[Long]("support_ab") &&
        s <= r.getAs[Long]("support_ac") &&
        s <= r.getAs[Long]("support_bc"),
        s"triple support $s exceeds a sub-pair's for ($a,$b,$c)")
      assert(s >= Affinity.MinSupport)
    }
    // cross-check one triple's support against a direct recount
    val r0 = rows.head
    val recount = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .filter(array_contains(col("ps"), r0.getAs[Long]("part_a")) &&
        array_contains(col("ps"), r0.getAs[Long]("part_b")) &&
        array_contains(col("ps"), r0.getAs[Long]("part_c")))
      .count()
    assert(recount == r0.getAs[Long]("support"),
      s"direct basket recount $recount != reported ${r0.getAs[Long]("support")}")
  }

  test("assoc rules: three per triple, confidence exact and bounded, lift recomputes") {
    val triples = Affinity.aprioriTriples(spark, sf).count()
    val rules = Affinity.assocRules(spark, sf).collect()
    assert(rules.length == 3 * triples,
      s"${rules.length} rules from $triples triples — rule expansion wrong")
    val nOrders = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_orderkey")).distinct().count()
    val freq = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_partkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rules.foreach { r =>
      val s = r.getAs[Long]("support")
      val as_ = r.getAs[Long]("ant_support")
      val conf = r.getAs[Long]("conf_ppm")
      // triple support ⊆ antecedent-pair support ⇒ confidence ≤ 1
      assert(s <= as_ && conf == s * 1000000L / as_ && conf <= 1000000L)
      val cnt = freq(r.getAs[Long]("cons"))
      assert(r.getAs[Long]("lift_ppm") == s * nOrders * 1000000L / (as_ * cnt))
    }
    // ordering contract: confidence descending
    val confs = rules.map(_.getAs[Long]("conf_ppm")).toSeq
    assert(confs == confs.sorted(Ordering[Long].reverse))
  }

  test("modularity: q_num recomputes from labels and edges; ppm bounded") {
    val row = Affinity.partModularity(spark, sf).head()
    val edges = Affinity.prEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = Graph.labelPropagation(
        Affinity.prEdges(spark, sf), Affinity.LpaRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.length.toLong
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    val dc = deg.groupBy { case (v, _) => labels(v) }
      .map { case (c, vs) => c -> vs.values.sum }
    val ec = edges.filter { case (s, d) => labels(s) == labels(d) }
      .groupBy { case (s, _) => labels(s) }
      .map { case (c, es) => c -> es.length.toLong }
    val qNum = dc.map { case (c, d) => ec.getOrElse(c, 0L) * m - d * d }.sum
    assert(row.getAs[Long]("m_edges") == m)
    assert(row.getAs[Long]("n_comms") == dc.size.toLong)
    assert(row.getAs[Long]("q_num") == qNum,
      s"q_num ${row.getAs[Long]("q_num")} != recomputed $qNum")
    assert(row.getAs[Long]("q_den") == m * m)
    val ppm = row.getAs[Long]("q_ppm")
    assert(ppm > -1000000L && ppm < 1000000L)
    // the offset trick equals floor(q_num/q_den) scaling done in BigInt
    val expectPpm = ((BigInt(qNum) + BigInt(m) * m) * 1000000 /
      (BigInt(m) * m) - 1000000).toLong
    assert(ppm == expectPpm)
  }

  test("link prediction: no predicted pair is an edge; cn and jaccard recompute") {
    val rows = Affinity.linkPrediction(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Affinity.LinkPredTopK)
    val edges = graft.ingest.Sources.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .collect().flatMap { r =>
        val ps = r.getSeq[Long](1).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length)
          yield (ps(i), ps(j))
      }
      .groupBy(identity).filter(_._2.length >= 2).keySet
    val nbrs = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    rows.foreach { r =>
      val (a, c) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_c"))
      assert(!edges.contains((a, c)), s"predicted pair ($a,$c) IS an edge")
      val cn = (nbrs(a) & nbrs(c)).size.toLong
      assert(r.getAs[Long]("cn") == cn, s"cn mismatch for ($a,$c)")
      assert(r.getAs[Long]("da") == nbrs(a).size.toLong)
      assert(r.getAs[Long]("jaccard_ppm") ==
        cn * 1000000L / (nbrs(a).size + nbrs(c).size - cn))
    }
    // ranking is by the emitted score, descending
    val js = rows.map(_.getAs[Long]("jaccard_ppm")).toSeq
    assert(js == js.sorted(Ordering[Long].reverse))
  }

  test("degree assortativity: r in [-1,1] over the symmetrized edge count") {
    val row = graft.analytics.Affinity.degreeAssortativity(spark, sf)
      .collect().head
    val r = row.getAs[Double]("assortativity")
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, s"r=$r out of range")
    // n_edges counts DIRECTED (symmetrized) edges: even, positive
    val n = row.getAs[Long]("n_edges")
    assert(n > 0 && n % 2 == 0, s"n_edges=$n not a symmetrized count")
  }

  test("item recs: never recommends an owned part; scores replay from co-purchase supports") {
    import org.apache.spark.sql.functions._
    val out = graft.analytics.Affinity.itemRecs(spark, sf).collect()
    assert(out.nonEmpty)
    val owned = graft.ingest.Sources.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.ingest.Sources.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      assert(!owned.contains(
        (r.getAs[Long]("customer"), r.getAs[Long]("part"))),
        "recommended a part the customer already bought")
      assert(r.getAs[Long]("score") > 0)
    }
    // ranks are 1..<=3 per customer, scores non-increasing, part-asc ties
    out.groupBy(_.getAs[Long]("customer")).foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq ==
        (1 to sorted.length).toSeq, s"$c ranks")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Long]("score"), b.getAs[Long]("score"))
          assert(sa > sb || (sa == sb &&
            a.getAs[Long]("part") < b.getAs[Long]("part")), s"$c order")
        case _ =>
      }
    }
  }
}
