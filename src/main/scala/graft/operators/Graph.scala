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

  /** Components of the undirected graph given by (src, dst) edges.
    * Returns (v, comp) with comp = min vertex id reachable from v.
    * Only vertices that appear in an edge are labeled (isolated
    * vertices are trivially their own singleton component).
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // materialize the symmetric edge list ONCE — it is re-joined every
    // round (and again by every convergence check), and the upstream
    // pair-generation plan (an LSH/Jaccard join) is far too expensive
    // to recompute per round. Symmetrize via explode, not
    // union(edges, edges.swapped): a union of the same un-cached
    // subtree executes the pair-generation join twice when this
    // checkpoint materializes; explode reads it once.
    val sym = edges
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    // lazy checkpoint: the labelSum action right below materializes it,
    // so init costs one job instead of two (same trick each round)
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("comp", col("v"))
      .localCheckpoint(eager = false)
    // convergence test: labels only ever DECREASE under min
    // propagation, so the (small, exact) Σcomp is strictly monotone
    // until fixpoint — equal sums ⇔ no label changed. One scalar agg
    // over checkpointed data per round instead of a join. coalesce
    // covers the empty-graph case (sum over no rows is NULL).
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each vertex's neighbors' labels, then min with its own.
      // Materialized eagerly: the pointer-jump self-join below reads
      // hop TWICE, and without a checkpoint both reads would recompute
      // the propagation join+agg — doubling every round's real work
      // (noise locally, the dominant cost at scale).
      val prop = sym.join(labels.withColumnRenamed("v", "dst"), "dst")
        .select(col("src").as("v"), col("comp"))
      val hop = labels.union(prop)
        .groupBy(col("v")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      // pointer jump: follow the label one more step (comp := comp of
      // comp). Label values are vertex ids, so the self-join always
      // resolves; min-propagation alone needs diameter rounds, the
      // jump compresses chains so rounds ≈ log(diameter) — the
      // standard accelerated label propagation for scale, and locally
      // it halves the number of checkpoint/convergence actions.
      val next = hop.join(
        hop.select(col("v").as("c2v"), col("comp").as("c2")),
        col("comp") === col("c2v"), "left")
        .select(col("v"), coalesce(col("c2"), col("comp")).as("comp"))
        // lazy: the labelSum action below runs ONE job that both
        // computes the jump and persists it; materialization still
        // precedes the unpersists of the superseded round, which only
        // happen after labelSum returns
        .localCheckpoint(eager = false)
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      // freeCheckpoint, not Dataset.unpersist: the latter is a silent
      // no-op for checkpoint RDDs (CacheManager doesn't track them) —
      // these rounds WERE being pinned for the session lifetime
      org.apache.spark.sql.GraftBridge.freeCheckpoint(labels) // superseded round
      org.apache.spark.sql.GraftBridge.freeCheckpoint(hop)    // folded into next
      labels = next
      i += 1
    }
    org.apache.spark.sql.GraftBridge.freeCheckpoint(sym)
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels
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
                        scale: Long = 1000000000000L): (DataFrame, Int) = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val n = deg.count()
    require(n > 0, "pagerank needs a non-empty edge list")
    var ranks = deg.select(col("v"), lit(scale / n).as("r"), col("d"))
      .localCheckpoint(eager = false)
    var rounds = 0
    var converged = false
    try {
      while (!converged && rounds < maxIters) {
        val contrib = e
          .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
          .select(col("dst").as("v"), expr("r DIV d").as("c"))
          .groupBy(col("v")).agg(sum(col("c")).as("contrib"))
        // update FROM ranks (= deg + r): same join as updating from
        // deg, but the old rank is already on the row for the delta
        val next = ranks.join(contrib, Seq("v"), "left")
          .select(col("v"),
            expr(s"(${scale}L * 15) DIV (100 * ${n}L) + " +
              "(85 * coalesce(contrib, CAST(0 AS BIGINT))) DIV 100").as("r"),
            col("d"), col("r").as("r_prev"))
          .localCheckpoint(eager = false)
        // one action computes the movement AND materializes `next`
        val moved = next
          .agg(coalesce(sum(abs(col("r") - col("r_prev"))), lit(0L)))
          .head().getLong(0)
        converged = moved <= tolerance
        org.apache.spark.sql.GraftBridge.freeCheckpoint(ranks)
        ranks = next.drop("r_prev")
        rounds += 1
      }
      if (!converged) {
        // don't leave the last round pinned in executor storage on the
        // failure path — this is the operational long-lived entry point
        org.apache.spark.sql.GraftBridge.freeCheckpoint(ranks)
        throw new IllegalStateException(
          s"pagerankConverged: not within $tolerance after $maxIters rounds")
      }
      (ranks, rounds)
    } finally org.apache.spark.sql.GraftBridge.freeCheckpoint(e)
  }

  def pagerank(edges: DataFrame, iters: Int = 3,
               scale: Long = 1000000000000L): DataFrame = {
    // the edge list is re-joined every iteration — truncate whatever
    // lineage produced it (typically an expensive pair join)
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val n = deg.count() // scalar init constant, not a per-row loop
    require(n > 0, "pagerank needs a non-empty edge list")
    var ranks = deg.select(col("v"), lit(scale / n).as("r"), col("d"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), expr("r DIV d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("contrib"))
      val next = deg.join(contrib, Seq("v"), "left")
        .select(col("v"),
          expr(s"(${scale}L * 15) DIV (100 * ${n}L) + " +
            "(85 * coalesce(contrib, CAST(0 AS BIGINT))) DIV 100").as("r"),
          col("d"))
        .localCheckpoint(eager = false)
      next.count() // materialize before freeing the superseded round
      org.apache.spark.sql.GraftBridge.freeCheckpoint(ranks)
      ranks = next
    }
    org.apache.spark.sql.GraftBridge.freeCheckpoint(e)
    ranks
  }
}
