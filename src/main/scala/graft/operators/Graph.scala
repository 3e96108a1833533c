package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge set — the step that
  * turns near-duplicate PAIRS (LSH / Jaccard / SimHash output) into
  * dedup CLUSTERS from which a canonical document is kept. A training
  * pipeline that drops only pairwise matches under-deduplicates:
  * A≈B, B≈C must collapse {A,B,C} even when A≉C.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts as
  * its own component id; each round every vertex takes the min of its
  * own label and its neighbors' labels, until a round changes nothing.
  * Rounds needed = max component diameter — near-dup clusters are
  * shallow (diameter a handful), so the loop is short regardless of
  * corpus size. Each round is one self-contained shuffle join; lineage
  * is truncated per round (localCheckpoint) so the plan stays flat
  * instead of doubling per iteration.
  */
object Graph {

  /** Hash-partition and cache a pair RDD at graph-appropriate
    * parallelism (~50k rows/task, capped at shuffle.partitions — the
    * RDD twin of AQE partition coalescing: a fixed-iteration loop pays
    * task-launch overhead per partition per round, so a toy graph on
    * 32 partitions is ~100% scheduling; a 100 TB graph hits the cap
    * and scales with the cluster's configured parallelism).
    * Materializes the partitioned cache and releases `raw`. The ONE
    * ingestion/sizing/persist discipline every RDD graph loop shares —
    * a sizing fix here reaches all of them.
    */
  private def partitionCached[V: scala.reflect.ClassTag](
      spark: SparkSession,
      raw: org.apache.spark.rdd.RDD[(Long, V)])
      : (org.apache.spark.rdd.RDD[(Long, V)],
         org.apache.spark.HashPartitioner) = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    raw.persist(StorageLevel.MEMORY_AND_DISK)
    val part = new HashPartitioner(math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions,
      (raw.count() / 50000L).toInt + 1)))
    val er = raw.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    er.count()
    raw.unpersist(blocking = false)
    (er, part)
  }

  /** Components of the undirected graph given by (src, dst) edges.
    * Returns (v, comp) with comp = min vertex id reachable from v.
    * Only vertices that appear in an edge are labeled (isolated
    * vertices are trivially their own singleton component).
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // Same RDD inner-loop rationale as [[prCore]] (round 6): the
    // min-label-propagation fixed point re-executes one identical
    // step per round, and the DataFrame form paid a full Catalyst
    // pass plus three exchanges per round — the dominant cost of
    // q_dedup_clusters (3.4 s of which the pair join is ~1.5 s).
    // Here every structure shares ONE HashPartitioner sized to the
    // edge count: propagation is a partition-local join + one
    // reduceByKey shuffle; the pointer jump re-keys by label (its
    // lookup side is already partition-local) and restores vertex
    // keying — 3 small shuffles a round, zero driver planning.
    //
    // The upstream pair-generation plan (an LSH/Jaccard join, far too
    // expensive to recompute) is materialized ONCE into `raw`; the
    // symmetrized cached copy is what every round re-joins.
    val spark = edges.sparkSession
    val (sym, part) = partitionCached(spark,
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .rdd.map(r => (r.getLong(0), r.getLong(1)))
        .flatMap { case (s, d) => Iterator((s, d), (d, s)) })
    // every loop RDD lands here and is released in finally — a
    // non-convergence throw (or an executor failure mid-round) must
    // not leave the last round's checkpoint blocks pinned for the
    // session lifetime
    val live = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[_]]
    try {
      // each vertex starts as its own component; narrow off the
      // partitioned sym (reduceByKey with the same partitioner)
      var labels = sym.mapValues(_ => 0L)
        .reduceByKey(part, (a, _) => a)
        .mapPartitions(_.map { case (v, _) => (v, v) },
          preservesPartitioning = true)
      labels.localCheckpoint()
      // convergence test: labels only ever DECREASE under min
      // propagation, so the exact Σcomp is monotone until fixpoint —
      // equal sums ⇔ no label changed; one fold rides each round's
      // materializing action
      def labelSum(r: org.apache.spark.rdd.RDD[(Long, Long)]): Long =
        r.values.fold(0L)(_ + _)
      var prevSum = labelSum(labels)
      live += labels
      var converged = false
      var i = 0
      while (!converged && i < maxIters) {
        // neighbors' min label per vertex (partition-local join, one
        // shuffle), then min with the vertex's own
        val prop = sym.join(labels)
          .map { case (_, (dst, comp)) => (dst, comp) }
          .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        val hop = labels.leftOuterJoin(prop)
          .mapValues { case (c, p) => math.min(c, p.getOrElse(c)) }
        // pointer jump: comp := comp(comp). Label values are vertex
        // ids so the lookup (against hop, already keyed by vertex)
        // always resolves; min-propagation alone needs diameter
        // rounds, the jump compresses chains to ≈ log(diameter).
        // hop's double use re-reads prop's shuffle files plus a cheap
        // narrow mapValues — not a recompute of the round.
        val next = hop.map { case (v, c) => (c, v) }
          .leftOuterJoin(hop)
          .map { case (c, (v, cc)) => (v, cc.getOrElse(c)) }
          .partitionBy(part)
        next.localCheckpoint() // truncate lineage (see prCore)
        val nextSum = labelSum(next)
        converged = nextSum == prevSum
        prevSum = nextSum
        live.foreach(_.unpersist(blocking = false))
        live.clear(); live += next
        labels = next
        i += 1
      }
      require(converged,
        s"connectedComponents did not converge in $maxIters rounds")
      val spark2 = spark
      import spark2.implicits._
      labels.toDF("v", "comp").localCheckpoint()
    } finally {
      live.foreach(_.unpersist(blocking = false))
      sym.unpersist(blocking = false)
    }
  }

  /** Fixed-point PageRank over a DIRECTED edge list (symmetrize first
    * for undirected graphs), damping 0.85, a fixed iteration count.
    *
    * Ranks are `scale`-scaled BIGINTs and every step is integer
    * arithmetic (contribution = rank DIV out-degree, damping =
    * (85·Σ) DIV 100): integer sums are associative, so the result is
    * bit-identical across engines, partitionings, retries and AQE
    * re-plans — which is what makes the operator oracle-checkable and
    * its output stable in a 1000-executor pipeline. Truncation loses
    * under one unit per (edge, iteration) of `scale` total mass.
    *
    * Only vertices with at least one OUTGOING edge are ranked (on a
    * symmetrized graph that is every non-isolated vertex, and there
    * are no dangling sinks). Returns (v, r, d): rank and out-degree.
    *
    * i64 headroom (round-11 audit): total mass is conserved at
    * N·scale (minus truncation), so any vertex's incoming-contribution
    * sum is ≤ N·scale and the `85·Σ` damping step bounds the loop at
    * N ≤ ~10¹¹ vertices with scale = 10⁶ — an order of magnitude past
    * a 100 TB web-scale graph's vertex count. Left on BIGINT
    * deliberately: a decimal carrier would slow every iteration of
    * the hot loop for headroom the mass-conservation bound shows is
    * not needed (unlike the histogram-frame formulas, which got the
    * decimal treatment for free).
    */
  /** Convergence-driven PageRank: iterate until the total absolute
    * rank movement Σ|r − r'| drops to `tolerance` (in `scale` units)
    * or `maxIters`. EXACT integer ranks are what make this
    * well-defined — the fixed point is a literal equality test, not
    * an ulp-chase — though DIV truncation can in principle settle
    * into a tiny oscillation instead of a point, which is what the
    * tolerance absorbs. The movement scalar costs NO extra join: the
    * previous rank rides through the update join (the ranks frame IS
    * the degree table plus r, so updating FROM it instead of from a
    * separate deg frame gives r_prev for free) and one agg over the
    * new frame reads the delta. The fixed-iteration [[pagerank]]
    * stays the oracle-checked operator (its iteration count is part
    * of its contract), this variant is the operational
    * "run to convergence" entry point. Returns (ranks, roundsRun).
    */
  def pagerankConverged(edges: DataFrame, maxIters: Int = 50,
                        tolerance: Long = 0L,
                        scale: Long = 1000000000000L): (DataFrame, Int) =
    prCore(edges, maxIters, Some(tolerance), scale)

  def pagerank(edges: DataFrame, iters: Int = 3,
               scale: Long = 1000000000000L): DataFrame =
    prCore(edges, iters, None, scale)._1

  /** Personalized PageRank: the biased random surfer whose initial
    * mass AND 15% restart both land only on `seeds` — the
    * query-anchored centrality behind "related to these items"
    * recommendations and seed-expansion (local community) queries.
    * Same co-partitioned integer loop as [[pagerank]]; only the
    * teleport vector changes, so all the exactness and one-shuffle-
    * per-round properties carry over verbatim.
    */
  def personalizedPagerank(edges: DataFrame, seeds: Set[Long],
                           iters: Int = 3,
                           scale: Long = 1000000000000L): DataFrame =
    prCore(edges, iters, None, scale, Some(seeds))._1

  /** Shared PageRank inner loop, deliberately at the RDD layer — the
    * one place in the engine where the Dataset API is the WRONG tool
    * and the exception the build rules allow for. An iterative graph
    * fixed point re-executes one structurally identical step tens of
    * times over data that shrinks to (v, r, d) rows; expressing each
    * round as a fresh DataFrame costs (a) a full Catalyst
    * analyze/optimize/codegen pass PER ROUND on the driver — measured
    * ≈0.4 s/round at sf0.1, 4× the round's actual execution — and
    * (b) up to three exchanges per round, because no public Dataset
    * mechanism carries a co-partitioning guarantee across an
    * iteration boundary (localCheckpoint preserves outputPartitioning
    * but each new round's join still plans its own exchanges). The
    * RDD loop is the canonical Spark shape for this (GraphX's Pregel
    * is built exactly this way): edges are hash-partitioned ONCE and
    * cached; ranks inherit the same partitioner through every
    * round's reduceByKey; so `edges join ranks` and
    * `ranks leftOuterJoin contrib` are both partition-local and each
    * round pays exactly ONE shuffle (the contribution reduce) and
    * zero driver-side planning. At 1000 executors the plan is
    * unchanged: the partitioner count scales with the cluster, the
    * co-location argument is partitioner identity, not data size.
    *
    * The recurrence is bit-identical to the SQL form the oracle
    * replays: all values are nonneg `scale`-scaled longs, JVM `/` on
    * nonneg longs IS SQL DIV, and Long addition is associative, so
    * rank vectors (and the movement scalar) are exact regardless of
    * partitioning, task order, or retries.
    *
    * tolerance = Some(t): run until Σ|r − r'| ≤ t, throwing past
    * `iters` rounds (convergence, not the cap, must terminate).
    * tolerance = None: run exactly `iters` rounds (the
    * oracle-checked fixed-iteration contract). Returns the same
    * (v, r, d) frame as always — localCheckpoint-materialized, every
    * loop-internal RDD freed before return, so callers' existing
    * freeCheckpoint discipline keeps working.
    */
  private def prCore(edges: DataFrame, iters: Int, tolerance: Option[Long],
                     scale: Long,
                     seeds: Option[Set[Long]] = None): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val (er, part) = partitionCached(spark, edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1))))
    // out-degree per source; narrow over the cached er, evaluated
    // twice (count + rank init) — no persist needed
    val degR = er.mapValues(_ => 1L).reduceByKey(part, _ + _)
    val n = degR.count()
    // live caches to release on ANY exit (success or throw)
    val live = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[_]]
    try {
      require(n > 0, "pagerank needs a non-empty edge list")
      // uniform teleport by default; a seed set redirects BOTH the
      // initial mass and the 15% restart to the seeds (personalized
      // PageRank — Page et al.'s biased surfer). The set is tiny by
      // contract (a query anchor, not data), captured in the task
      // closure like any literal. Same integer recurrence otherwise,
      // so the seeds = None path is bit-identical to the original.
      val (baseOf, initOf): (Long => Long, Long => Long) = seeds match {
        case None =>
          val b = (scale * 15) / (100 * n)
          val i0 = scale / n
          ((_: Long) => b, (_: Long) => i0)
        case Some(s) =>
          require(s.nonEmpty, "personalized pagerank needs seeds")
          val b = (scale * 15) / (100 * s.size)
          val i0 = scale / s.size
          ((v: Long) => if (s(v)) b else 0L,
            (v: Long) => if (s(v)) i0 else 0L)
      }
      // Rounds run in BLOCKS of up to PrBlock with ONE action per
      // block: each vertex row carries the block's rank history
      // (newest first), so the per-round movement scalars all ride a
      // single aggregate at block end, and per-action overhead (job
      // scheduling, result fetch, checkpoint setup — the dominant
      // per-round cost once joins are partition-local) is paid once
      // per PrBlock rounds instead of once per round. Every frame
      // inside a block is persisted so its double use (contribution
      // source + update base) reads cache, not a re-derivation —
      // without this the within-block recompute doubles per round.
      // Convergence overshoot: the block may run up to PrBlock−1
      // rounds past the stopping round; the returned vector is
      // PROJECTED at the exact first round whose movement ≤ tol, so
      // the output (ranks and round count) is bit-identical to the
      // round-at-a-time loop the oracle replays.
      // frame value = (d, rs) with rs(0) the newest rank and
      // rs(last) the rank entering the block.
      // keyed map (init depends on v) — mapPartitions with
      // preservesPartitioning keeps the shared partitioner that makes
      // every loop join partition-local
      var frame = degR.mapPartitions(
        _.map { case (v, d) => (v, (d, Array(initOf(v)))) },
        preservesPartitioning = true)
      var pinned: org.apache.spark.rdd.RDD[_] = null
      var rounds = 0
      var stopAt = -1 // chronological round-in-block that converged
      while (stopAt < 0 && rounds < iters) {
        val b = math.min(PrBlock, iters - rounds)
        var cur = frame
        for (_ <- 1 to b) {
          val rk = cur.mapValues { case (d, rs) => (rs(0), d) }
          // partition-local join (er and rk share `part`); the
          // reduceByKey on dst is the round's single shuffle
          val contrib = er.join(rk)
            .map { case (_, (dst, (r, d))) => (dst, r / d) }
            .reduceByKey(part, _ + _)
          // partition-local again; prepend the new rank to the history
          cur = cur.leftOuterJoin(contrib)
            .mapPartitions(
              _.map { case (v, ((d, rs), c)) =>
                (v, (d, (baseOf(v) + (85 * c.getOrElse(0L)) / 100) +: rs)) },
              preservesPartitioning = true)
          cur.persist(StorageLevel.MEMORY_AND_DISK)
          live += cur
        }
        // truncate lineage at the block boundary: persist alone keeps
        // the narrow-dependency chain and the DAGScheduler re-walks
        // that ever-deeper graph on every job — measured to degrade
        // from 0.3 s to 7 s per round by round 18 without it
        cur.localCheckpoint()
        tolerance match {
          case Some(tol) =>
            // one action: materializes the whole block AND sums every
            // round's movement Σ|r_k − r_{k−1}| as exact Longs
            // (moved(i) pairs rs(i) with rs(i+1), newest first)
            val moved = cur.values
              .map { case (_, rs) =>
                val a = new Array[Long](rs.length - 1)
                var i = 0
                while (i < a.length) {
                  a(i) = math.abs(rs(i) - rs(i + 1)); i += 1
                }
                a
              }
              .aggregate(new Array[Long](b))(
                (x, y) => { var i = 0; while (i < b) { x(i) += y(i); i += 1 }; x },
                (x, y) => { var i = 0; while (i < b) { x(i) += y(i); i += 1 }; x })
            // first chronological round in this block at/under tol:
            // round rounds+j moved = moved(b − j)
            var j = 1
            while (stopAt < 0 && j <= b) {
              if (moved(b - j) <= tol) stopAt = j
              j += 1
            }
          case None =>
            cur.count()
        }
        // the block is materialized into checkpoint blocks — its
        // intermediate caches (and the previous block) are dead
        live.foreach(r => if (r ne cur) r.unpersist(blocking = false))
        live.clear(); live += cur
        if (pinned != null) pinned.unpersist(blocking = false)
        pinned = cur
        if (stopAt < 0) {
          rounds += b
          // trim the history at the block boundary — only the newest
          // rank seeds the next block, so rs stays ≤ PrBlock+1 long
          frame = cur.mapValues { case (d, rs) => (d, Array(rs(0))) }
        } else rounds += stopAt
      }
      if (tolerance.isDefined && stopAt < 0)
        throw new IllegalStateException(
          s"pagerankConverged: not within ${tolerance.get} after $iters rounds")
      // project the rank at the exact stopping round: rs is newest
      // first with rs.length − 1 rounds in this block, so round
      // `stopAt` of the block sits at rs(rs.length − 1 − stopAt);
      // a fixed-iteration run keeps rs(0)
      val ranks = {
        if (pinned == null) degR.mapPartitions( // zero rounds
          _.map { case (v, d) => (v, (initOf(v), d)) },
          preservesPartitioning = true)
        else {
          val f = pinned.asInstanceOf[org.apache.spark.rdd.RDD[
            (Long, (Long, Array[Long]))]]
          if (stopAt < 0) f.mapValues { case (d, rs) => (rs(0), d) }
          else {
            val s = stopAt
            f.mapValues { case (d, rs) => (rs(rs.length - 1 - s), d) }
          }
        }
      }
      // hand back the standard self-contained checkpointed frame and
      // release every loop RDD — the caller sees the same contract as
      // every other checkpoint-returning operator
      val spark2 = spark
      import spark2.implicits._
      val out = ranks
        .map { case (v, (r, d)) => (v, r, d) }
        .toDF("v", "r", "d")
        .localCheckpoint()
      (out, rounds)
    } finally {
      live.foreach(_.unpersist(blocking = false))
      er.unpersist(blocking = false)
    }
  }

  /** Rounds per action in [[prCore]] — large enough to amortize job
    * overhead, small enough to bound convergence overshoot (at most
    * PrBlock − 1 extra rounds of computed-then-discarded work).
    */
  private val PrBlock = 5

  /** Single-source BFS hop distances over a DIRECTED edge list
    * (symmetrize first for undirected graphs): (v, dist) for every
    * vertex reachable from `source` within `maxDepth` hops, the
    * source itself at distance 0. `source = None` starts from the
    * minimum vertex id in the edge set (deterministic and cheap — one
    * fold over the already-cached edges).
    *
    * Same RDD inner-loop shape as [[prCore]]: edges hash-partitioned
    * once, the frontier expansion `edges join frontier` is
    * partition-local, and the only shuffle per round is the
    * min-dedup reduce of the new frontier (plus the seen-set
    * subtract, also partition-local under the shared partitioner).
    * Rounds = min(eccentricity, maxDepth) — hop distances are exact
    * integers, so the output is engine-portable by construction.
    */
  def bfsDistances(edges: DataFrame, source: Option[Long] = None,
                   maxDepth: Int = 8): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val (er, part) = partitionCached(spark,
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .rdd.map(r => (r.getLong(0), r.getLong(1))))
    val live = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[_]]
    try {
      // the documented default is the minimum vertex id IN THE EDGE
      // SET — both endpoints, so a directed list whose smallest id
      // only ever appears as a destination still starts there
      val s = source.getOrElse(
        er.map { case (a, b) => math.min(a, b) }
          .fold(Long.MaxValue)(math.min))
      require(s != Long.MaxValue, "bfsDistances needs a non-empty edge list")
      var dist = spark.sparkContext
        .parallelize(Seq((s, 0L))).partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      live += dist
      var frontier = dist
      var d = 0L
      var done = false
      while (!done && d < maxDepth) {
        d += 1
        val dd = d
        // one hop out from the frontier (partition-local join), dedup
        // targets (the round's one shuffle), drop already-seen
        // vertices — BFS's first visit IS the hop distance
        val next = er.join(frontier)
          .map { case (_, (dst, _)) => (dst, dd) }
          .reduceByKey(part, (a, _) => a)
          .subtractByKey(dist, part)
          .persist(StorageLevel.MEMORY_AND_DISK)
        live += next
        if (next.count() == 0) done = true
        else {
          // co-partitioned parents → PartitionerAwareUnionRDD keeps
          // the partitioner; ≤ maxDepth rounds bounds the lineage, so
          // no per-round checkpoint is needed
          val nd = dist.union(next).persist(StorageLevel.MEMORY_AND_DISK)
          live += nd
          dist = nd
          frontier = next
        }
      }
      val spark2 = spark
      import spark2.implicits._
      val out = dist.toDF("v", "dist").localCheckpoint()
      out
    } finally {
      live.foreach(_.unpersist(blocking = false))
      er.unpersist(blocking = false)
    }
  }

  /** Single-source WEIGHTED shortest paths: `rounds` Bellman-Ford
    * relaxations over a DIRECTED edge list with positive integer
    * weights (symmetrize first for undirected). Output is the exact
    * relaxation state after exactly `rounds` rounds — with rounds ≥
    * the graph's weighted-path hop diameter that IS the SSSP fixed
    * point (the caller's spec should pin convergence on its graph);
    * the fixed round count is what lets a SQL oracle unroll the same
    * recurrence and hash-match.
    *
    * Same co-partitioned RDD loop as [[bfsDistances]]: edges
    * partitioned once by src, the relax `edges join dist` is
    * partition-local, one min-reduce shuffle per round, and the
    * co-partitioned union + reduce that merges old and candidate
    * distances is narrow. Integer distances ⇒ engine-portable.
    */
  def ssspDistances(edges: DataFrame, source: Option[Long] = None,
                    rounds: Int = 8): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val (er, part) = partitionCached(spark, edges
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .rdd.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))))
    val live = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[_]]
    try {
      // min over BOTH endpoints — same default-source contract as
      // [[bfsDistances]]
      val s = source.getOrElse(
        er.map { case (a, (b, _)) => math.min(a, b) }
          .fold(Long.MaxValue)(math.min))
      require(s != Long.MaxValue, "ssspDistances needs a non-empty edge list")
      var dist = spark.sparkContext
        .parallelize(Seq((s, 0L))).partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      live += dist
      (1 to rounds).foreach { _ =>
        val cand = er.join(dist)
          .map { case (_, ((dst, w), du)) => (dst, du + w) }
          .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        val nd = dist.union(cand).reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
          .persist(StorageLevel.MEMORY_AND_DISK)
        live += nd
        dist = nd
      }
      val spark2 = spark
      import spark2.implicits._
      dist.toDF("v", "dist").localCheckpoint()
    } finally {
      live.foreach(_.unpersist(blocking = false))
      er.unpersist(blocking = false)
    }
  }

  /** k-core decomposition by iterative peeling over a DIRECTED edge
    * list (symmetrize first for undirected): repeatedly delete every
    * vertex whose OUT-degree among the SURVIVORS is < k until a pass
    * deletes nothing — on a symmetrized graph that is the plain
    * degree, giving the maximal subgraph of minimum degree ≥ k, the
    * standard densest-region / pendant-pruning primitive. The
    * out-degree orientation is part of the contract (it is what the
    * recursive-CTE oracle counts), so operator and oracle agree even
    * on a genuinely directed input.
    * Convergence-driven like [[pagerankConverged]] (stability is an
    * exact set-cardinality test — engine-portable by construction);
    * `maxIters` is a safety valve only, the fixed point must
    * terminate. Returns ((v, d) rows — core members with their
    * IN-core degree — and the pass count including the confirming
    * pass). A graph that peels to nothing returns an empty frame.
    *
    * Same co-partitioned RDD loop as the other iterative operators:
    * per pass ONE shuffle (the degree reduce; both membership joins
    * are partition-local under the shared partitioner) and one count
    * action for the stability test. Pass count is bounded by the
    * peeling depth (the graph's degeneracy ordering length), not by
    * vertex count.
    */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 40): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    // cached keyed by DST with the src as value: survival is judged on
    // OUT-degree among survivors (deg(v) = |{(v,u) ∈ E : u alive}|) —
    // the orientation the recursive-CTE oracle counts, so operator and
    // oracle agree even on a genuinely directed edge list (on the
    // symmetrized graphs callers pass, in- and out-degree coincide)
    val (er, part) = partitionCached(spark,
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .rdd.map(r => (r.getLong(1), r.getLong(0))))
    val live = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[_]]
    try {
      var alive = er.map { case (_, s) => (s, 1L) }
        .reduceByKey(part, (a, _) => a)
        .persist(StorageLevel.MEMORY_AND_DISK)
      live += alive
      var n = alive.count()
      var rounds = 0
      var stable = false
      var core: org.apache.spark.rdd.RDD[(Long, Long)] = null
      while (!stable && n > 0 && rounds < maxIters) {
        // out-degree among survivors: dst gated by the (partition-
        // local) edge join, src by the membership join after the
        // per-src reduce — one shuffle per pass
        val deg = er.join(alive)
          .map { case (_, (src, _)) => (src, 1L) }
          .reduceByKey(part, _ + _)
          .join(alive)
          .mapValues(_._1)
        val next = deg.filter(_._2 >= k)
          .persist(StorageLevel.MEMORY_AND_DISK)
        live += next
        val m = next.count()
        rounds += 1
        if (m == n) { stable = true; core = next }
        else { alive = next.mapValues(_ => 1L); n = m }
      }
      require(stable || n == 0,
        s"kCore: not stable after $maxIters passes")
      val spark2 = spark
      import spark2.implicits._
      val out =
        if (n == 0) spark.emptyDataset[(Long, Long)].toDF("v", "d")
        else core.toDF("v", "d")
      (out.localCheckpoint(), rounds)
    } finally {
      live.foreach(_.unpersist(blocking = false))
      er.unpersist(blocking = false)
    }
  }

  /** Synchronous label-propagation community detection over a
    * DIRECTED edge list (symmetrize first for undirected): every
    * vertex starts as its own label; each round every vertex takes
    * the most frequent label among its in-neighbors' PREVIOUS-round
    * labels, ties broken by the smallest label. A FIXED round count
    * (not convergence — asynchronous/converged LPA is
    * order-dependent, which no cross-engine oracle could replay) plus
    * integer labels make the output a pure function of the graph:
    * bit-identical across engines, partitionings and retries.
    *
    * Same co-partitioned RDD loop as [[bfsDistances]]/[[prCore]]:
    * edges hash-partitioned once; per round the message join is
    * partition-local and the counting is ONE aggregateByKey into the
    * shared partitioner with per-vertex label→count maps (the GraphX
    * aggregateMessages shape): map-side combine collapses each
    * partition's messages to ≤ one map per destination before the
    * round's single shuffle, whose volume is Σ distinct labels per
    * vertex — never raw edge cardinality. The argmax (higher count,
    * tie → smaller label) then runs map-local, and the result is
    * already partitioned for the next round's join. Rounds are a
    * small constant ⇒ bounded lineage, no per-round checkpoint.
    * Returns (v, lab) for every vertex in the edge set.
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 4): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val (er, part) = partitionCached(spark,
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .rdd.map(r => (r.getLong(0), r.getLong(1))))
    val live = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[_]]
    try {
      // v → v seed labels, already in the shared partitioner (the
      // vertex set is the src set — the caller symmetrizes)
      var labels = er.mapValues(_ => 0L).reduceByKey(part, (a, _) => a)
        .mapPartitions(_.map { case (v, _) => (v, v) },
          preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      live += labels
      (1 to rounds).foreach { _ =>
        val nl = er.join(labels)
          .map { case (_, (dst, lab)) => (dst, lab) }
          .aggregateByKey(
            scala.collection.mutable.LongMap.empty[Long], part)(
            (m, lab) => { m(lab) = m.getOrElse(lab, 0L) + 1L; m },
            (a, b) => {
              val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
              small.foreach { case (k, c) =>
                big(k) = big.getOrElse(k, 0L) + c }
              big
            })
          .mapValues { m =>
            var bl = Long.MaxValue; var bc = 0L
            m.foreach { case (k, c) =>
              if (c > bc || (c == bc && k < bl)) { bl = k; bc = c } }
            bl
          }
          .persist(StorageLevel.MEMORY_AND_DISK)
        live += nl
        labels = nl
      }
      val spark2 = spark
      import spark2.implicits._
      labels.toDF("v", "lab").localCheckpoint()
    } finally {
      live.foreach(_.unpersist(blocking = false))
      er.unpersist(blocking = false)
    }
  }

  /** HITS (Kleinberg 1999) over a DIRECTED edge list — hub and
    * authority fixed point: auth(v) ← Σ hub(u) over in-edges,
    * hub(u) ← Σ auth(v) over out-edges, each vector max-normalized
    * per round. Returns (v, hub, auth) for every vertex that touches
    * an edge; a pure sink has hub 0, a pure source auth 0 (so on a
    * bipartite purchase graph the two roles land on the two sides).
    *
    * Same exactness discipline as [[pagerank]]: scores are
    * `scale`-scaled nonneg longs, normalization is (raw·scale) DIV
    * max — integer, associative, order-independent — so the unrolled
    * SQL twin hash-matches bit-for-bit and any re-run/retry is
    * stable. Overflow headroom: raw ≤ max-degree·scale, and the
    * normalization product raw·scale ≤ deg·scale² must stay under
    * 2⁶³ — at the default scale 10⁶ that allows degree ≤ ~9·10⁶,
    * far past any real fan-in (document the cap, don't check per
    * row).
    *
    * Same execution discipline too: the edge list is hash-partitioned
    * ONCE in each orientation and cached; hub/auth vectors inherit
    * the partitioner through every round's reduceByKey, so all four
    * joins per round are partition-local and each round pays exactly
    * two shuffles (the two contribution reduces) plus two O(1)
    * driver max() actions for the normalizers.
    */
  def hits(edges: DataFrame, iters: Int,
           scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val (ebySrc, part) = partitionCached(spark, edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1))))
    val ebyDst = ebySrc.map { case (s, d) => (d, s) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val verts = ebySrc.keys.map((_, ()))
      .union(ebyDst.keys.map((_, ())))
      .reduceByKey(part, (a, _) => a)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val live = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[_]]
    try {
      require(!verts.isEmpty(), "hits needs a non-empty edge list")
      var hub = verts.mapValues(_ => scale)
      var auth = verts.mapValues(_ => 0L)
      var round = 0
      // Same lineage discipline as prCore: the half-round's raw
      // contribution RDD is persisted because its one action (the
      // normalizer max) and its one consumer (the normalized join)
      // would otherwise recompute the shuffle; the normalized vector
      // is localCheckpoint'd so the NEXT half-round's action truncates
      // the DAG there (without it the scheduler re-walks a
      // 4-nodes-per-round lineage every job — measured 4× slower by
      // round 6); superseded frames are freed as soon as the frame
      // after them is materialized.
      while (round < iters) {
        // auth update: in-edge hub mass, max-normalized
        val araw = ebySrc.join(hub)
          .map { case (_, (dst, h)) => (dst, h) }
          .reduceByKey(part, _ + _)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val amax = math.max(1L, araw.values.max()) // materializes araw (and last hub)
        val prevAuth = auth
        auth = verts.leftOuterJoin(araw)
          .mapValues { case (_, r) => (r.getOrElse(0L) * scale) / amax }
        auth.localCheckpoint()
        live += auth
        // hub update: out-edge auth mass (the just-updated auth)
        val hraw = ebyDst.join(auth)
          .map { case (_, (src, a)) => (src, a) }
          .reduceByKey(part, _ + _)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val hmax = math.max(1L, hraw.values.max()) // materializes hraw + auth
        araw.unpersist(blocking = false) // consumed by auth, now settled
        prevAuth.unpersist(blocking = false)
        val prevHub = hub
        hub = verts.leftOuterJoin(hraw)
          .mapValues { case (_, r) => (r.getOrElse(0L) * scale) / hmax }
        hub.localCheckpoint()
        live += hub
        live += hraw // settled only when the next round's amax runs
        prevHub.unpersist(blocking = false)
        round += 1
      }
      val spark2 = spark
      import spark2.implicits._
      hub.join(auth)
        .map { case (v, (h, a)) => (v, h, a) }
        .toDF("v", "hub", "auth").localCheckpoint()
    } finally {
      live.foreach(_.unpersist(blocking = false))
      verts.unpersist(blocking = false)
      ebyDst.unpersist(blocking = false)
      ebySrc.unpersist(blocking = false)
    }
  }
}
