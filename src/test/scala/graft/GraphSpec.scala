package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Connected components (the pairs→clusters dedup step). */
class GraphSpec extends SparkSpec {

  private def edgesDF(pairs: Seq[(Long, Long)]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(pairs.map(p => Row(p._1, p._2)): _*), schema)
  }

  test("components: chain needs multi-round propagation; islands stay apart") {
    // chain 1-2-3-4-5 (diameter 4 — exercises >1 round) + island {10,11}
    val edges = edgesDF(Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (11L, 10L)))
    val got = Graph.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).map(got) == Seq.fill(5)(1L), s"chain not collapsed: $got")
    assert(got(10L) == 10L && got(11L) == 10L, s"island wrong: $got")
  }

  test("iterative rounds free their checkpoint blocks (no per-round pinning)") {
    // Dataset.unpersist() is a CacheManager call and a SILENT NO-OP for
    // localCheckpoint RDDs — before GraftBridge.freeCheckpoint, every
    // round of every iterative operator stayed pinned in the block
    // manager for the session lifetime (the root of round-4's bench
    // pollution finding). Pin the fix: after a multi-round run, the
    // session retains at most the RETURNED frame's checkpoint, and
    // freeing that returns the block manager to its starting state.
    def persisted = spark.sparkContext.getPersistentRDDs.size
    // start from a clean block manager: earlier tests' retained frames
    // (and the ContextCleaner lazily GC-ing them mid-test) would make
    // a relative baseline flap
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val before = 0
    // chain of 9 -> several propagation rounds
    val edges = edgesDF((1L until 9L).map(i => (i, i + 1)))
    val labels = Graph.connectedComponents(edges)
    assert(labels.collect().length == 9)
    assert(persisted <= before + 1,
      s"rounds left blocks pinned: $before -> $persisted")
    org.apache.spark.sql.GraftBridge.freeCheckpoint(labels)
    assert(persisted == before,
      s"returned frame's checkpoint not freed: $before -> $persisted")
    // same discipline on the convergence-driven pagerank
    val (pr, _) = Graph.pagerankConverged(
      edgesDF((1L until 9L).flatMap(i => Seq((i, i + 1), (i + 1, i)))),
      maxIters = 60, tolerance = 10000000000L) // 1% of mass, the query's setting
    assert(pr.collect().nonEmpty)
    assert(persisted <= before + 1,
      s"pagerank rounds left blocks pinned: $before -> $persisted")
    org.apache.spark.sql.GraftBridge.freeCheckpoint(pr)
    assert(persisted == before)
  }

  test("bfs distances: shortest hops on a crafted graph; cap and island honored") {
    // diamond 1-2-4, 1-3-4 (two equal paths), tail 4-5-6-7,
    // island {20,21}; symmetrize as the operator contract requires
    val half = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (20L, 21L))
    val edges = edgesDF(half.flatMap(p => Seq(p, p.swap)))
    val got = Graph.bfsDistances(edges, source = Some(1L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 3L, 6L -> 4L, 7L -> 5L)
    assert(got == want, s"distances wrong: $got")
    // depth cap truncates the tail, keeps everything within range
    val capped = Graph.bfsDistances(edges, source = Some(1L), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == want.filter(_._2 <= 3L), s"cap ignored: $capped")
    // default source is the minimum vertex id
    val defaulted = Graph.bfsDistances(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(defaulted == want, s"default source wrong: $defaulted")
  }

  test("sssp: weighted shortest paths beat heavy direct edges; extra round is a fixed point") {
    import spark.implicits._
    // weighted diamond: direct 1→4 costs 10, detour 1→2→4 costs 3;
    // tail 4→5 cost 5; island {20,21}. Symmetrized.
    val half = Seq((1L, 2L, 1L), (2L, 4L, 2L), (1L, 4L, 10L),
      (1L, 3L, 4L), (3L, 4L, 1L), (4L, 5L, 5L), (20L, 21L, 7L))
    val edges = half.flatMap { case (s, d, w) => Seq((s, d, w), (d, s, w)) }
      .toDF("src", "dst", "w")
    val got = Graph.ssspDistances(edges, source = Some(1L), rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Dijkstra by hand: 2 via 1→2 (1); 4 via 1→2→4 (3); 3 via 1→3 (4)
    // — NOT 1→2→4→3 (also 4, min keeps 4 either way; both routes tie);
    // 5 via 4 (8). The heavy direct 1→4 (10) must lose.
    val want = Map(1L -> 0L, 2L -> 1L, 3L -> 4L, 4L -> 3L, 5L -> 8L)
    assert(got == want, s"distances wrong: $got")
    // one more round changes nothing — the relaxation reached its
    // fixed point within the configured rounds
    val more = Graph.ssspDistances(edges, source = Some(1L), rounds = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == got, "extra round moved distances: not converged")
    // too few rounds must under-relax (2 rounds cannot reach vertex 5
    // via the cheap 3-hop route: it sees only 1→4→5 = 15)
    val short = Graph.ssspDistances(edges, source = Some(1L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(short(5L) == 15L && short(4L) == 3L, s"2-round state wrong: $short")
  }

  test("dedup clusters: every near-dup pair lands in one cluster, canonical is min id") {
    val pairs = graft.analytics.TextOps.nearDupJaccard(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = graft.analytics.TextOps.dedupClusters(spark, sf).collect()
    val byDoc = clusters.flatMap { r =>
      r.getAs[String]("doc_ids").split(",").map(_.toLong -> r.getAs[Long]("component"))
    }.toMap
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split across clusters")
    }
    clusters.foreach { r =>
      val ids = r.getAs[String]("doc_ids").split(",").map(_.toLong)
      assert(ids.min == r.getAs[Long]("component"), "canonical is not min doc_id")
      assert(ids.length == r.getAs[Long]("n_docs"))
      assert(ids.length >= 2, "singleton cluster leaked in (vertices come from edges)")
    }
  }

  test("k-core: cascade peeling, already-core short-circuit, peel-to-empty") {
    def sym(u: Seq[(Long, Long)]) = edgesDF(u ++ u.map(_.swap))
    // triangle {1,2,3} + pendant chain 3-4-5-6: the chain peels one
    // vertex per pass (6, then 5, then 4), pass 4 confirms stability
    val (core, rounds) = Graph.kCore(
      sym(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))), 2)
    val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"core wrong: $got")
    assert(rounds == 4, s"cascade should take 4 passes, took $rounds")
    // an input that already IS a k-core stabilizes in one confirming pass
    val (tri, r1) = Graph.kCore(sym(Seq((1L, 2L), (1L, 3L), (2L, 3L))), 2)
    assert(tri.count() == 3 && r1 == 1, s"already-core: ${tri.count()}, $r1")
    // a bare chain has no 2-core: peels to empty without throwing
    val (none, _) = Graph.kCore(sym(Seq((1L, 2L), (2L, 3L))), 2)
    assert(none.count() == 0, "chain should have no 2-core")
    // core degrees are degrees WITHIN the core, not in the input graph:
    // vertex 3 had 3 neighbors before peeling, 2 after
    assert(got(3L) == 2L, "degree must be recomputed among survivors")
    // directed contract: survival counts OUT-degree (what the oracle's
    // CTE counts) — v3 has out-degree 1 but IN-degree 0, and must stay
    val (dir1, dr) = Graph.kCore(
      edgesDF(Seq((1L, 2L), (2L, 1L), (3L, 1L))), 1)
    val dgot = dir1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dgot == Map(1L -> 1L, 2L -> 1L, 3L -> 1L) && dr == 1,
      s"directed out-degree contract broken: $dgot after $dr passes")
  }

  test("label propagation: hand-replayed synchronous rounds, tie-breaks and all") {
    // triangle {1,2,3} + pendant 4 on 3, plus an isolated pair
    // {10,11}. Synchronous LPA with min-label tie-break, replayed by
    // hand: the triangle pulls everything to label 1 by round 2; the
    // pair is a bipartite 2-cycle, so its labels OSCILLATE (swap each
    // round) and an even round count returns them to themselves —
    // exactly the synchronous-contract behavior the fixed round count
    // makes reproducible (and the reason converged async LPA can't be
    // oracle-replayed).
    val undirected = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (10L, 11L))
    val edges = edgesDF(undirected ++ undirected.map(_.swap))
    val got = Graph.labelPropagation(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).map(got) == Seq.fill(4)(1L), s"core not collapsed: $got")
    assert(got(10L) == 10L && got(11L) == 11L, s"2-cycle parity wrong: $got")
    // one round: each vertex takes its neighbors' seed labels —
    // v1 ties {2,3} → 2, v3 has {1,2,4} → 1, pair swaps labels
    val r1 = Graph.labelPropagation(edges, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      10L -> 11L, 11L -> 10L), s"round-1 labels wrong: $r1")
    // determinism: a second run over a reshuffled copy of the edges
    val shuffled = edgesDF(scala.util.Random.shuffle(
      undirected ++ undirected.map(_.swap))).repartition(7)
    val again = Graph.labelPropagation(shuffled, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got, "labels depend on physical layout")
  }

  test("HITS: hand-replayed integer fixed point on a bipartite star") {
    // hubs 1,2 point at authority 10; hub 2 also points at 11.
    // Round 1 (scale S): araw(10)=2S, araw(11)=S; amax=2S →
    // a(10)=S, a(11)=S/2. hraw(1)=S, hraw(2)=S+S/2; hmax=3S/2 →
    // h(1)=(S·S)/(3S/2)=666666 (floor), h(2)=S. Subsequent rounds are
    // stationary for a: araw(10)=h1+h2, araw(11)=h2, and h keeps the
    // same ratio — replay 3 rounds by hand below.
    val s = 1000000L
    val edges = edgesDF(Seq((1L, 10L), (2L, 10L), (2L, 11L)))
    val got = Graph.hits(edges, iters = 3, scale = s).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // sources have auth 0; sinks have hub 0
    assert(got(1L)._2 == 0 && got(2L)._2 == 0)
    assert(got(10L)._1 == 0 && got(11L)._1 == 0)
    // the best hub and best authority normalize to exactly `scale`
    assert(got(2L)._1 == s, s"hub(2) != scale: $got")
    assert(got(10L)._2 == s, s"auth(10) != scale: $got")
    // exact replay of the recurrence (amax = h1+h2, hmax = a10+a11)
    var (h1, h2) = (s, s)
    var (a10, a11) = (0L, 0L)
    for (_ <- 1 to 3) {
      val (ar10, ar11) = (h1 + h2, h2)
      val am = math.max(ar10, ar11)
      a10 = ar10 * s / am; a11 = ar11 * s / am
      val (hr1, hr2) = (a10, a10 + a11)
      val hm = math.max(hr1, hr2)
      h1 = hr1 * s / hm; h2 = hr2 * s / hm
    }
    assert(got(1L)._1 == h1 && got(2L)._1 == h2 &&
      got(10L)._2 == a10 && got(11L)._2 == a11,
      s"fixed point differs from hand replay: $got vs ($h1,$h2,$a10,$a11)")
    // determinism under physical layout
    val again = Graph.hits(edgesDF(Seq((2L, 11L), (2L, 10L), (1L, 10L)))
      .repartition(5), iters = 3, scale = s).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == got, "HITS depends on physical layout")
  }
}
