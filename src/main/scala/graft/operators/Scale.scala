package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Sources

/** Scale techniques as first-class operators (builder mandate:
  * salting for skew, bucketing for co-located joins).
  *
  * These don't change results — they change the shuffle shape. Each is
  * therefore oracle-checkable against its naive form, which is exactly
  * how the suite verifies them.
  */
object Scale {

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.operators.Scale")

  /** Shard count for [[distributedNtile]]'s 2-phase global rank —
    * a pure parallelism knob (output is shard-count-invariant).
    */
  val NtileShards = 32L

  /** Quantile grid for splitting a HOT basis value across shards by
    * key ([[shardBoundaries]]): cut positions snap to this grid, so
    * in-value balance is within ~1/KeyCutGrid of ideal.
    */
  private val KeyCutGrid = 64

  /** approx_percentile accuracy for boundary sampling: boundaries
    * only affect BALANCE (outputs are boundary-invariant), and a
    * 1/1000 quantile error is negligible against the 1/32 target
    * shard mass — while GK-sketch cost grows with accuracy (measured:
    * 10000 cost whole seconds on a 1M-row frame).
    */
  private val BoundaryAccuracy = 1000

  /** Exact distributed `ntile(n)` over the total order (basis asc,
    * key asc) — the operator that replaces an UNPARTITIONED ntile
    * window (which plans as `Exchange SinglePartition`: the entire
    * input sorted in ONE task — the round-8 q_price_deciles finding).
    *
    * 2-phase sharded global rank (the seqPack prefix-sum pattern):
    * rows shard by EQUI-DEPTH composite boundaries over the
    * (basis, key) total order ([[shardBoundaries]] — shards are
    * contiguous ranges of that order, so shard order ⊕ in-shard order
    * IS the total order); per-shard ranks run as up to [[NtileShards]]
    * parallel PARTITIONED windows; per-shard counts (a ≤ shards+1-row
    * frame, limit-proved in-plan for the audit) get a prefix sum and
    * broadcast back; global rank = shard offset + local rank. The
    * bucket is then the closed-form ntile from (rank, N): the first
    * N mod n buckets take ⌈N/n⌉ rows, the rest ⌊N/n⌋ — bit-identical
    * to the window `ntile`, which is why unchanged window-ntile
    * oracles stay the done-gate for every consumer.
    *
    * INTEGRAL CONTRACT: `basis` and `key` must be INTEGRAL
    * expressions (they are cast to long — a fractional basis would
    * silently rank on its truncation); `basis` ascending is the
    * intended primary sort (negate for descending); `key` breaks ties
    * totally. Boundaries are equi-depth (sampled quantiles), so a
    * pathologically skewed basis — even 90% of rows on ONE value —
    * still spreads across shards (hot values split by key quantiles);
    * round 9's equi-WIDTH value buckets bounded parallelism but not
    * balance, conceded in this very docstring and fixed in round 10.
    */
  def distributedNtile(df: DataFrame, n: Int, basis: Column, key: Column,
                       out: String): DataFrame = {
    val u = out
    rankCore(df, basis, key, u)
      // exact ntile(n) from the global rank (greatest(q,1) keeps the
      // dead branch ANSI-safe when N < n)
      .withColumn(out, expr(
        s"""CASE WHEN _r_$u <= (_N_$u % $n) * (_N_$u DIV $n + 1)
           |     THEN (_r_$u - 1) DIV (_N_$u DIV $n + 1) + 1
           |     ELSE (_N_$u % $n) +
           |          (_r_$u - (_N_$u % $n) * (_N_$u DIV $n + 1) - 1)
           |            DIV greatest(_N_$u DIV $n, 1) + 1
           |END""".stripMargin).cast("int"))
      .drop(s"_r_$u", s"_N_$u")
  }

  /** Exact distributed `row_number()` over (basis asc, key asc) — the
    * same 2-phase global rank as [[distributedNtile]], exposed
    * directly for consumers that need the rank itself (e.g. Gini /
    * top-share accounting over all DISTINCT keys of a fact table,
    * where an unpartitioned window would rank billions of keys in one
    * task). `out` is a LONG 1-based rank; `totalOut` optionally also
    * emits the frame's row count (per-row constant) so callers don't
    * re-aggregate the input.
    */
  def distributedRowNumber(df: DataFrame, basis: Column, key: Column,
                           out: String,
                           totalOut: Option[String] = None): DataFrame = {
    val u = out
    val ranked = rankCore(df, basis, key, u).withColumnRenamed(s"_r_$u", out)
    totalOut match {
      case Some(t) => ranked.withColumnRenamed(s"_N_$u", t)
      case None => ranked.drop(s"_N_$u")
    }
  }

  /** Exact distributed INCLUSIVE running sum of `value` over
    * (basis asc, key asc) — the prefix-sum sibling of
    * [[distributedRowNumber]] (same 2-phase shape, shard offsets carry
    * per-shard VALUE totals instead of counts), for cumulative-share
    * accounting (Pareto/ABC, coverage curves, empirical CDFs) over
    * frames whose row count grows with the corpus.
    *
    * INTEGRAL CONTRACT (round-9 advice): `basis`, `key` AND `value`
    * must be INTEGRAL expressions — all three are cast to long, so a
    * fractional `value` would silently sum its truncation and diverge
    * from the window running sum this operator is bit-identical to.
    * Fixed-point encode (cents, micro-nats) before calling, as every
    * in-repo consumer does.
    */
  def distributedPrefixSum(df: DataFrame, basis: Column, key: Column,
                           value: Column, out: String): DataFrame =
    distributedPrefixSums(df, basis, key, Seq(value -> out))

  /** MULTI-PAYLOAD [[distributedPrefixSum]]: N inclusive running sums
    * over ONE (basis asc, key asc) total order, sharing ONE phase 0
    * (one localCheckpoint, one approx_percentile boundary sample, one
    * shard assignment), one local per-shard window pass and one
    * per-shard offset broadcast (the offset frame carries N totals
    * per shard instead of one).
    *
    * Round 11, from the round-10 verdict: chaining two
    * single-payload applications over the SAME ordering — exactly
    * what the exact-KS CDF pair did — pays the constant phase-0 cost
    * twice for identical boundaries. Phase 0 is shared
    * infrastructure across PAYLOADS, not just within one call.
    * Output is bit-identical to N chained applications (each payload's
    * offset algebra is independent given the shared sharding, and the
    * sharding itself is output-invariant), which the chained-vs-fused
    * differential spec pins.
    *
    * Same INTEGRAL + NON-NULL contract as the single-payload form,
    * per payload. `payloads` maps value expression → output column;
    * names must be distinct and absent from `df`.
    */
  def distributedPrefixSums(df: DataFrame, basis: Column, key: Column,
                            payloads: Seq[(Column, String)]): DataFrame = {
    require(payloads.nonEmpty, "distributedPrefixSums: no payloads")
    require(payloads.map(_._2).distinct.size == payloads.size,
      "distributedPrefixSums: duplicate output names")
    val u = payloads.head._2
    val withVals = payloads.foldLeft(df) { case (d, (v, name)) =>
      d.withColumn(s"_v_$name", v.cast("long"))
    }
    val sharded = shardedFrame(withVals, basis, key, u)
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"_s_$u"))
      .orderBy(col(s"_b_$u").asc, col(s"_k_$u").asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val withLocal = payloads.foldLeft(sharded) { case (d, (_, name)) =>
      d.withColumn(s"_lc_$name", sum(col(s"_v_$name")).over(local))
    }
    val offW = org.apache.spark.sql.expressions.Window
      .orderBy(col(s"_s_$u"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val aggs = payloads.map { case (_, name) =>
      sum(col(s"_v_$name")).as(s"_n_$name") }
    val offsets = payloads.foldLeft(
        sharded.groupBy(col(s"_s_$u"))
          .agg(aggs.head, aggs.tail: _*)
          .limit(NtileShards.toInt + 2)) { case (d, (_, name)) =>
        d.withColumn(s"_off_$name",
          coalesce(sum(col(s"_n_$name")).over(offW), lit(0L)))
      }
      .select(col(s"_s_$u").as(s"_os_$u") +:
        payloads.map { case (_, name) => col(s"_off_$name") }: _*)
    val joined = withLocal
      .join(broadcast(offsets), col(s"_s_$u") === col(s"_os_$u"))
    payloads.foldLeft(joined) { case (d, (_, name)) =>
        d.withColumn(name, col(s"_off_$name") + col(s"_lc_$name"))
      }
      .drop(s"_b_$u" +: s"_k_$u" +: s"_s_$u" +: s"_os_$u" +:
        payloads.flatMap { case (_, name) =>
          Seq(s"_v_$name", s"_lc_$name", s"_off_$name") }: _*)
  }

  /** Equi-depth composite shard boundaries over the (basis, key)
    * total order — phase 0 of the 2-phase rank family. Boundaries are
    * sampled quantiles of the BASIS (approx_percentile at
    * [[NtileShards]]−1 evenly spaced ranks); a basis value spanning
    * ≥ 2 quantile slots (a HOT value — up to the 90%-on-one-value
    * zipfian worst case) is additionally split WITHIN the value by
    * quantiles of the KEY, snapped to the [[KeyCutGrid]] grid, so
    * per-shard balance holds for ANY input distribution, not just
    * spread-out ones. The returned pairs are ascending cut points:
    * a row lands in shard = #{cuts ≤ (basis, key) lexicographically};
    * (v, Long.MinValue) cuts BEFORE all rows of basis v.
    *
    * Output of every consumer is boundary-INVARIANT (the offset
    * algebra computes exact global ranks for any monotone, contiguous
    * sharding), so the sampling approximation affects only balance —
    * which is why approx_percentile's estimation error is acceptable
    * where it never would be in a result.
    *
    * NON-NULL CONTRACT (round-11 advice): a null basis or key would
    * get a null shard id from the null-intolerant [[shardCol]]
    * expression and SILENTLY fall out of the null-unsafe offset join
    * — row loss, where the window form ranks nulls first. No in-repo
    * consumer feeds nulls; rather than trust future callers, the
    * boundary sample (a job this phase runs anyway) also counts
    * null sort keys and fails loudly on the first one. The check is
    * one extra aggregate expression in an existing pass — zero added
    * jobs.
    */
  private[graft] def shardBoundaries(base: DataFrame, b: String,
                                     k: String): Seq[(Long, Long)] = {
    val s = NtileShards.toInt
    val probs = (1 until s).map(i => i.toDouble / s).mkString(", ")
    val row = base.agg(
      expr(s"approx_percentile($b, array($probs), $BoundaryAccuracy)").as("_q"),
      sum(when(col(b).isNull || col(k).isNull, 1L).otherwise(0L)).as("_nn")).head()
    require(row.isNullAt(1) || row.getLong(1) == 0L,
      s"rank family: ${row.getLong(1)} row(s) have a NULL basis/key — " +
        "the sharded rank would silently drop them; the window form " +
        "ranks nulls first. Filter or coalesce before calling.")
    if (row.isNullAt(0)) return Seq.empty
    val bq = row.getSeq[Long](0)
    // multiplicity m ≥ 2 means the value holds ≥ ~m/NtileShards of all
    // rows: split it into m key-quantile slices (one extra aggregate,
    // only paid on skewed inputs)
    val hot: Map[Long, Int] = bq.groupBy(identity).view.mapValues(_.size)
      .toMap.filter(_._2 >= 2)
    val keyCuts: Map[Long, Seq[Long]] =
      if (hot.isEmpty) Map.empty
      else {
        val gridProbs = (1 until KeyCutGrid)
          .map(i => i.toDouble / KeyCutGrid).mkString(", ")
        base.filter(col(b).isin(hot.keys.toSeq: _*))
          .groupBy(col(b))
          .agg(expr(s"approx_percentile($k, array($gridProbs), $BoundaryAccuracy)")
            .as("_kq"))
          .collect()
          .map { r =>
            val v = r.getLong(0)
            val grid = r.getSeq[Long](1)
            val m = hot(v)
            v -> (1 until m).map { j =>
              grid(math.min(grid.size - 1,
                math.max(0, j * KeyCutGrid / m - 1)))
            }
          }.toMap
      }
    bq.distinct.sorted.flatMap { v =>
      (v, Long.MinValue) +: keyCuts.getOrElse(v, Seq.empty)
        .distinct.sorted.map(c => (v, c))
    }
  }

  /** Shard id of (b, k) under `bnds`: the count of boundary cuts at
    * or below the row in (basis, key) order — monotone in the total
    * order by construction. Round 10 (second cut): a
    * [[graft.functions.ShardOf]] codegen expression carrying the cut
    * table as a reference object, replacing the original
    * sum-of-when-terms whose ~cuts-sized expression tree cost ~1 s of
    * pure Catalyst/Janino overhead per query (measured
    * data-independent in tools/WinsProbe).
    */
  private[graft] def shardCol(bnds: Seq[(Long, Long)], b: Column,
                              k: Column): Column =
    if (bnds.isEmpty) lit(0L)
    else org.apache.spark.sql.GraftBridge.column(
      graft.functions.ShardOf(
        org.apache.spark.sql.GraftBridge.expression(b),
        org.apache.spark.sql.GraftBridge.expression(k),
        bnds.map(_._1).toArray, bnds.map(_._2).toArray))

  /** Checkpoint `df` with long `_b_<u>`/`_k_<u>` sort columns and the
    * equi-depth `_s_<u>` shard id — the shared phase 0 of
    * [[rankCore]] and [[distributedPrefixSum]].
    */
  private[graft] def shardedFrame(df: DataFrame, basis: Column,
                                  key: Column, u: String): DataFrame = {
    // materialize the input ONCE: the boundary sample, the shard/total
    // aggregates and the ranked frame all consume it, and without the
    // checkpoint each consumer re-executes the input lineage — chained
    // applications then compound MULTIPLICATIVELY (measured: RFM's
    // three chained quintiles planned 250 scans / 386 shuffles;
    // checkpointed, the plan is three flat applications)
    val base = df.withColumn(s"_b_$u", basis.cast("long"))
      .withColumn(s"_k_$u", key.cast("long")).localCheckpoint()
    val bnds = shardBoundaries(base, s"_b_$u", s"_k_$u")
    base.withColumn(s"_s_$u", shardCol(bnds, col(s"_b_$u"), col(s"_k_$u")))
  }

  /** Hard cap on the group-domain size [[distributedGroupedRowNumber]]
    * accepts: per-group boundaries are collected driver-side
    * (|groups| × shards longs) and the per-(group, shard) offset
    * frame broadcasts (|groups| × (shards+2) rows) — trivial to a few
    * thousand groups, which covers every FIXED domain (types, flags,
    * lang × source). A key whose cardinality grows with the corpus
    * (user, document) should keep its plain partitioned window — its
    * parallelism already grows — so past the cap the operator FALLS
    * BACK to exactly that window (round 11; a warning is logged).
    * The boundary collect is limit-bounded to cap+1 rows, so the
    * detection itself never pulls an unbounded table to the driver.
    */
  val MaxRankGroups = 1024

  /** Exact distributed per-GROUP `row_number()` over (basis asc,
    * key asc) WITHIN each group — the operator for windows
    * partitioned by a FIXED SMALL domain (event types, return flags,
    * languages). `Window.partitionBy(group)` caps parallelism at the
    * domain size and each task sorts corpus/|domain| rows: the
    * q_price_deciles single-task ceiling divided by a small constant,
    * which at 100× is the same ceiling (round 10 — found by the
    * fixed-domain window sweep that followed the WindowBounds work).
    *
    * Same 2-phase shape as [[rankCore]] with every stage group-aware:
    * per-group equi-depth (basis, key) boundaries (ONE grouped
    * percentile pass + one hot-value key-quantile pass, driver-
    * collected), local ranks as (group × shard) partitioned windows,
    * per-(group, shard) counts prefix-summed within their group — a
    * ≤ |domain|·(shards+2)-row frame, limit-proved in-plan — and
    * broadcast back; per-group rank = in-group shard offset + local
    * rank, bit-identical to the window form for unique (basis, key).
    *
    * CONTRACT: on the SHARDED path (|group domain| ≤
    * [[MaxRankGroups]]) `group` must be non-null (null never equals
    * the compiled boundary keys — enforced loudly) and `basis`/`key`
    * integral AND non-null as everywhere in the family (the grouped
    * boundary pass counts null sort keys and fails on the first).
    * Enforcement there is COMPLETE, not sampled: the boundary
    * collect's `limit(cap+1)` returning ≤ cap rows proves the
    * grouped domain fit under the cap, so every group — and every
    * group's null counts — was inspected (round-12 advice: the
    * requires used to run before the fallback decision, so groups
    * outside the truncated sample escaped them nondeterministically).
    * Above the cap the operator FALLS BACK to the plain partitioned
    * window (round 11 — previously a hard error): a key whose
    * cardinality grows with the corpus already gets growing
    * parallelism from `Window.partitionBy(group)` itself, so the
    * window IS the right plan there and the two paths are
    * bit-identical for unique (basis, key). The fallback does NOT
    * enforce the null contract — it doesn't need to: the window
    * drops nothing, it keeps a null-group partition and ranks null
    * basis/key rows nulls-first (ordinary window semantics, which
    * the caller inherits). Loud failure exists to prevent the
    * sharded path's silent ROW LOSS; the fallback has no such loss.
    * The fallback logs a warning (a FIXED domain near the cap
    * deserves a look) but keeps the caller running. `totalOut`
    * optionally emits the per-group row count — the
    * `count().over(partitionBy(group))` companion the window form
    * pairs with its rank.
    */
  def distributedGroupedRowNumber(df: DataFrame, group: Column,
                                  basis: Column, key: Column, out: String,
                                  totalOut: Option[String] = None): DataFrame = {
    val u = out
    val base = df.withColumn(s"_g_$u", group.cast("string"))
      .withColumn(s"_b_$u", basis.cast("long"))
      .withColumn(s"_k_$u", key.cast("long")).localCheckpoint()
    val s = NtileShards.toInt
    val probs = (1 until s).map(i => i.toDouble / s).mkString(", ")
    // limit bounds the driver collect BEFORE we know the domain size:
    // a corpus-scaled group key transfers at most cap+1 rows, never
    // the whole domain, and cap+1 rows is proof enough to fall back
    val bRows = base.groupBy(col(s"_g_$u"))
      .agg(expr(s"approx_percentile(_b_$u, array($probs), $BoundaryAccuracy)").as("_q"),
        sum(when(col(s"_b_$u").isNull || col(s"_k_$u").isNull, 1L)
          .otherwise(0L)).as("_nn"))
      .limit(MaxRankGroups + 1)
      .collect()
    if (bRows.length <= MaxRankGroups) {
      // ≤ cap rows out of limit(cap+1) proves the sample is the WHOLE
      // grouped domain, so these checks are complete — past the cap
      // the fallback window below inherits ordinary window null
      // semantics (null partition kept, nulls-first rank; nothing
      // dropped), see the CONTRACT above
      require(!bRows.exists(_.getString(0) == null),
        "distributedGroupedRowNumber: NULL group — the compiled shard " +
          "lookup would silently drop the group's rows; filter or " +
          "encode nulls before calling (the window form keeps a null " +
          "partition)")
      require(bRows.forall(r => r.isNullAt(2) || r.getLong(2) == 0L),
        "distributedGroupedRowNumber: NULL basis/key rows — the sharded " +
          "rank would silently drop them; the window form ranks nulls " +
          "first. Filter or coalesce before calling.")
    }
    if (bRows.length > MaxRankGroups) {
      log.warn(s"distributedGroupedRowNumber: > $MaxRankGroups groups — " +
        "falling back to the plain partitioned window (parallelism " +
        "grows with the domain there); a FIXED domain this large " +
        "deserves a look")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(s"_g_$u"))
        .orderBy(col(s"_b_$u").asc, col(s"_k_$u").asc)
      val ranked = base.withColumn(out, row_number().over(w).cast("long"))
      val withTotal = totalOut match {
        case Some(t) => ranked.withColumn(t, count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(s"_g_$u"))))
        case None => ranked
      }
      return withTotal.drop(s"_g_$u", s"_b_$u", s"_k_$u")
    }
    val hot: Seq[(String, Long, Int)] = bRows.toSeq.flatMap { r =>
      val g = r.getString(0)
      val bq = if (r.isNullAt(1)) Seq.empty[Long] else r.getSeq[Long](1)
      bq.groupBy(identity).collect {
        case (v, occ) if occ.size >= 2 => (g, v, occ.size)
      }
    }
    val keyCuts: Map[(String, Long), Seq[Long]] =
      if (hot.isEmpty) Map.empty
      else {
        val gridProbs = (1 until KeyCutGrid)
          .map(i => i.toDouble / KeyCutGrid).mkString(", ")
        val mult = hot.map { case (g, v, m) => (g, v) -> m }.toMap
        // membership via ONE InSet on a packed composite — the value
        // suffix is spaceless numeric text, so the LAST space splits
        // unambiguously and distinct (group, value) pairs cannot
        // collide. An OR-chain of |hot| conjunctions would rebuild
        // exactly the expression-tree blowup ShardOf exists to avoid
        val packed = hot.map { case (g, v, _) => s"$g $v" }
        base.filter(concat_ws(" ", col(s"_g_$u"),
            col(s"_b_$u").cast("string")).isin(packed: _*))
          .groupBy(col(s"_g_$u"), col(s"_b_$u"))
          .agg(expr(s"approx_percentile(_k_$u, array($gridProbs), $BoundaryAccuracy)")
            .as("_kq"))
          .collect()
          .map { r =>
            val g = r.getString(0); val v = r.getLong(1)
            val grid = r.getSeq[Long](2)
            val m = mult((g, v))
            (g, v) -> (1 until m).map { j =>
              grid(math.min(grid.size - 1,
                math.max(0, j * KeyCutGrid / m - 1)))
            }
          }.toMap
      }
    val bndsByGroup: Seq[(String, Seq[(Long, Long)])] = bRows.toSeq.map { r =>
      val g = r.getString(0)
      val bq = if (r.isNullAt(1)) Seq.empty[Long] else r.getSeq[Long](1)
      g -> bq.distinct.sorted.flatMap { v =>
        (v, Long.MinValue) +: keyCuts.getOrElse((g, v), Seq.empty)
          .distinct.sorted.map(c => (v, c))
      }
    }
    // per-group cut tables ride as ONE reference object (see
    // [[graft.functions.GroupShardOf]]) — the per-group when-chain
    // first cut compiled a |groups|·|cuts|-term tree into every stage
    val cutsMap = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Array[Long]]()
    bndsByGroup.foreach { case (g, bnds) =>
      cutsMap.put(org.apache.spark.unsafe.types.UTF8String.fromString(g),
        (bnds.map(_._1) ++ bnds.map(_._2)).toArray)
    }
    val shardExpr = org.apache.spark.sql.GraftBridge.column(
      graft.functions.GroupShardOf(
        org.apache.spark.sql.GraftBridge.expression(col(s"_g_$u")),
        org.apache.spark.sql.GraftBridge.expression(col(s"_b_$u")),
        org.apache.spark.sql.GraftBridge.expression(col(s"_k_$u")),
        cutsMap))
    val sharded = base.withColumn(s"_s_$u", shardExpr)
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"_g_$u"), col(s"_s_$u"))
      .orderBy(col(s"_b_$u").asc, col(s"_k_$u").asc)
    val withLocal = sharded
      .withColumn(s"_lr_$u", row_number().over(local).cast("long"))
    val offW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"_g_$u")).orderBy(col(s"_s_$u"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val counts = sharded.groupBy(col(s"_g_$u"), col(s"_s_$u"))
      .agg(count(lit(1)).as(s"_n_$u"))
      .limit(MaxRankGroups * (s + 2))
    val offsets = counts
      .withColumn(s"_off_$u",
        coalesce(sum(col(s"_n_$u")).over(offW), lit(0L)))
      .select(col(s"_g_$u").as(s"_og_$u"), col(s"_s_$u").as(s"_os_$u"),
        col(s"_off_$u"))
    val ranked = withLocal
      .join(broadcast(offsets),
        col(s"_g_$u") === col(s"_og_$u") && col(s"_s_$u") === col(s"_os_$u"))
      .withColumn(out, col(s"_off_$u") + col(s"_lr_$u"))
    val withTotal = totalOut match {
      case Some(t) =>
        val tot = counts.groupBy(col(s"_g_$u"))
          .agg(sum(col(s"_n_$u")).as(t))
          .select(col(s"_g_$u").as(s"_tg_$u"), col(t))
        ranked.join(broadcast(tot), col(s"_g_$u") === col(s"_tg_$u"))
          .drop(s"_tg_$u")
      case None => ranked
    }
    withTotal.drop(s"_g_$u", s"_b_$u", s"_k_$u", s"_s_$u", s"_lr_$u",
      s"_og_$u", s"_os_$u", s"_off_$u")
  }

  /** Shared 2-phase sharded global rank: returns df + `_r_<u>` (long
    * 1-based rank over basis asc, key asc) + `_N_<u>` (long total).
    */
  private def rankCore(df: DataFrame, basis: Column, key: Column,
                       u: String): DataFrame = {
    val sharded = shardedFrame(df, basis, key, u)
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"_s_$u"))
      .orderBy(col(s"_b_$u").asc, col(s"_k_$u").asc)
    val withLocal = sharded
      .withColumn(s"_lr_$u", row_number().over(local).cast("long"))
    val offW = org.apache.spark.sql.expressions.Window
      .orderBy(col(s"_s_$u"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // the limit can never truncate (shard ∈ [0, NtileShards]); it
    // encodes the cardinality PROOF in the plan so the single-column
    // prefix window audits as limit-bounded, not trust-the-agg
    val offsets = sharded.groupBy(col(s"_s_$u"))
      .agg(count(lit(1)).as(s"_n_$u"))
      .limit(NtileShards.toInt + 2)
      .withColumn(s"_off_$u",
        coalesce(sum(col(s"_n_$u")).over(offW), lit(0L)))
      .select(col(s"_s_$u").as(s"_os_$u"), col(s"_off_$u"))
    val tot = sharded.agg(count(lit(1)).as(s"_N_$u"))
    withLocal
      .join(broadcast(offsets), col(s"_s_$u") === col(s"_os_$u"))
      .crossJoin(broadcast(tot))
      .withColumn(s"_r_$u", col(s"_off_$u") + col(s"_lr_$u"))
      .drop(s"_b_$u", s"_k_$u", s"_s_$u", s"_lr_$u",
        s"_os_$u", s"_off_$u")
  }

  /** Two-stage salted aggregation for skewed group keys: stage 1
    * splits each hot key across `saltBuckets` reducers (groupBy key +
    * salt), stage 2 combines the partials. Works for any algebraic
    * aggregate expressed as (partial, combine) pairs — here sum/count,
    * the TPC-H revenue shape.
    *
    * At 100 TB the first shuffle caps any reducer's share of a hot key
    * at 1/saltBuckets; the second shuffle moves only `keys ×
    * saltBuckets` pre-aggregated rows. (AQE skew-join handles join
    * skew; THIS handles aggregation skew, which AQE does not split.)
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
                     saltBuckets: Int = 16): DataFrame = {
    // monotonically_increasing_id already encodes the partition in its
    // high bits, so pmod over it round-robins within every partition
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_psum"), count(valueCol).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).as("salted_sum"),
        sum(col("_pcnt")).as("salted_count"))
  }

  /** Oracle-checked query: revenue per nation via salted two-stage
    * aggregation; DuckDB computes the naive GROUP BY — equal results
    * prove the salt/combine algebra.
    */
  def saltedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val joined = Sources.orders(spark, dir)
      .join(broadcast(Sources.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Sources.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
    saltedSumCount(joined, Seq("n_name"), col("o_totalprice"))
      .select(col("n_name"),
        round(col("salted_sum"), 2).as("revenue"),
        col("salted_count").as("n_orders"))
      .orderBy(col("n_name"))
  }

  val saltedRevenueSql: String =
    """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
      |  count(o_totalprice) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Deterministic hash-based train/valid/test split — the sampling
    * primitive a training-data pipeline needs: reproducible across
    * runs, engines and cluster sizes (no RNG), stable under
    * repartitioning, and stratification-friendly (bucket is a pure
    * function of the row key). md5 is engine-portable; the first 8 hex
    * chars give a uniform 32-bit value.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("bigint"), lit(buckets.toLong))

  /** DuckDB twin of [[hashBucket]], interpolated into every oracle
    * that splits/samples on the hash — ONE SQL form of the rule, so a
    * change to the bucketing can't silently diverge per oracle.
    */
  def hashBucketSql(key: String, buckets: Int = 100): String =
    s"CAST(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8)) AS BIGINT) % $buckets"

  /** Engine-portable uniform in [0, 1): the first md5 hex word of the
    * key over 2^32 — a power-of-two division of an exact integer, so
    * both engines produce the identical double (the rule behind every
    * deterministic sampling decision; see also the LSH hyperplane
    * constants, which derive the same word driver-side).
    */
  def md5Uniform(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("bigint").cast("double") / 4294967296.0)

  /** JVM twin of [[md5Uniform]] — the driver-side replay specs use
    * it to re-derive sampling decisions without a Spark job; same
    * first-md5-word / 2^32 rule, byte for byte.
    */
  def md5UniformJvm(key: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val w = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(w, 16).toDouble / 4294967296.0
  }

  /** DuckDB twin of [[md5Uniform]] — ONE SQL form of the rule. */
  def md5UniformSql(key: String): String =
    s"CAST(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8)) AS BIGINT)" +
      " / 4294967296.0"

  /** The deterministic snapshot split shared by incremental dedup,
    * the drift monitor and the resampler: docs with id ≡ 4 (mod 5)
    * are "today's batch", the rest the historical corpus. ONE
    * definition point — these operators are documented as acting on
    * the SAME batch, and a marker changed in one place only would
    * silently decouple them while every oracle still passes.
    */
  def isBatch(id: Column): Column = id % 5 === 4

  /** DuckDB twin of [[isBatch]]. */
  def isBatchSql(col: String): String = s"$col % 5 = 4"

  /** Split assignment: 80/10/10 on the hash bucket of the row key. */
  def hashSplit(key: Column): Column =
    when(hashBucket(key) < 80, "train")
      .when(hashBucket(key) < 90, "valid")
      .otherwise("test")

  /** Oracle-checked query: orders split 80/10/10 on o_orderkey with
    * per-split revenue — DuckDB reproduces the same md5 buckets, so
    * the hash compare proves the split is engine-independent.
    */
  def orderSplit(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .withColumn("split", hashSplit(col("o_orderkey")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("split"))

  val orderSplitSql: String =
    s"""SELECT split, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM (
      |  SELECT o_totalprice,
      |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid'
      |         ELSE 'test' END AS split
      |  FROM (SELECT o_totalprice,
      |          ${hashBucketSql("o_orderkey")} AS b
      |        FROM orders)
      |)
      |GROUP BY split
      |ORDER BY split""".stripMargin

  /** Deterministic stratified sampling: each stratum gets its own
    * sampling rate, applied as a threshold on the row key's hash
    * bucket. Purely scan-side (a filter over a hash of the key — no
    * shuffle, no RNG, no state), so at 100 TB it rides the parquet
    * scan, parallelizes with executor count, and re-runs reproduce the
    * exact same sample regardless of partitioning or cluster size.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(defaultRate * 100)) {
      case (acc, (s, r)) => when(stratum === s, lit(r * 100)).otherwise(acc)
    }
    df.filter(hashBucket(key) < threshold)
  }

  /** Oracle-checked query: language-stratified document sample (en
    * kept at 50%, es at 25%, the long tail at 10%) — the corpus-mix
    * rebalancing step of a training-data pipeline. DuckDB reproduces
    * the identical sample from the same md5 buckets.
    */
  def stratifiedDocSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Sources.documents(spark, dir), col("doc_id"),
      col("lang"), Map("en" -> 0.5, "es" -> 0.25), defaultRate = 0.1)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  val stratifiedDocSampleSql: String =
    s"""SELECT doc_id, lang, source
      |FROM (
      |  SELECT doc_id, lang, source,
      |    ${hashBucketSql("doc_id")} AS b,
      |    CASE WHEN lang = 'es' THEN 25.0 WHEN lang = 'en' THEN 50.0
      |         ELSE 10.0 END AS threshold
      |  FROM documents
      |)
      |WHERE b < threshold
      |ORDER BY doc_id""".stripMargin

  /** Oracle-checked query: urgent-order lineitem revenue by year with
    * the lineitem side bloom-pruned on the urgent orderkeys before the
    * join ([[graft.functions.BloomOps]]). Equal to the plain join —
    * the oracle computes exactly that — while only the bloom-surviving
    * fraction of the fact table reaches the join shuffle.
    */
  def bloomPrunedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Sources.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val pruned = graft.functions.BloomOps.bloomPrune(
      Sources.lineitem(spark, dir), col("l_orderkey"),
      urgent, col("o_orderkey"), expectedItems = 1000000L)
    pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_lineitems"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_year"))
  }

  val bloomPrunedRevenueSql: String =
    """SELECT year(o_orderdate) AS o_year, count(*) AS n_lineitems,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY year(o_orderdate)
      |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------
  // Z-order layout (multi-dimensional data skipping)
  // ---------------------------------------------------------------

  /** Morton/Z-value of two pre-bucketed 8-bit coordinates: interleaves
    * the bits so rows close in BOTH dimensions get close z-values.
    * Pure bit arithmetic (shift/and/multiply on BIGINT) — identical
    * results in any engine, codegen-friendly in Spark.
    */
  def zValue(xb: Column, yb: Column): Column =
    (0 until 8).map { i =>
      shiftright(xb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Scale a numeric column into 0..255 given its global min/max —
    * the floor scaler is engine-portable (no rounding modes) and the
    * +1 on the range keeps the max value inside bucket 255.
    */
  def byteBucket(x: Column, mn: Column, mx: Column): Column =
    floor((x.cast("double") - mn) * 256.0 / (mx - mn + 1.0)).cast("long")

  /** Z-order layout writer: range-partition + sort on the z-value, so
    * every output file covers a narrow rectangle in (x, y) — parquet
    * min/max stats then let scans skip files for predicates on EITHER
    * dimension. This is the layout step a 100 TB table needs before
    * serving multi-dimensional filters; a single-column sort gives
    * skipping on one dimension only.
    */
  def writeZOrdered(df: DataFrame, z: Column, path: String,
                    nFiles: Int): Unit =
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Oracle-checked query: orders mapped onto a 256×256 z-grid over
    * (customer, order day); per z-bucket row counts and coordinate
    * extents. The extents make the locality measurable — and the
    * DuckDB hash-match proves the whole bit-interleave pipeline is
    * engine-exact.
    */
  def zOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val x = col("o_custkey")
    val y = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
    val mm = Sources.orders(spark, dir).agg(
      min(x).cast("double").as("mnx"), max(x).cast("double").as("mxx"),
      min(y).cast("double").as("mny"), max(y).cast("double").as("mxy"))
    val xb = byteBucket(x, col("mnx"), col("mxx"))
    val yb = byteBucket(y, col("mny"), col("mxy"))
    Sources.orders(spark, dir)
      .crossJoin(broadcast(mm))
      .select(shiftright(zValue(xb, yb), 10).as("z_bucket"),
        xb.as("xb"), yb.as("yb"))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("xb")).as("min_xb"), max(col("xb")).as("max_xb"),
        min(col("yb")).as("min_yb"), max(col("yb")).as("max_yb"))
      .orderBy(col("z_bucket"))
  }

  val zOrderStatsSql: String = {
    def bucket(v: String, mn: String, mx: String) =
      s"CAST(floor((CAST($v AS DOUBLE) - $mn) * 256.0 / ($mx - $mn + 1.0)) AS BIGINT)"
    val z = (0 until 8).map { i =>
      s"((xb >> $i) & 1) * ${1L << (2 * i)} + ((yb >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""WITH mm AS (
       |  SELECT CAST(min(o_custkey) AS DOUBLE) AS mnx,
       |         CAST(max(o_custkey) AS DOUBLE) AS mxx,
       |         CAST(min(date_diff('day', DATE '1970-01-01', o_orderdate)) AS DOUBLE) AS mny,
       |         CAST(max(date_diff('day', DATE '1970-01-01', o_orderdate)) AS DOUBLE) AS mxy
       |  FROM orders),
       |coords AS (
       |  SELECT ${bucket("o_custkey", "mnx", "mxx")} AS xb,
       |         ${bucket("date_diff('day', DATE '1970-01-01', o_orderdate)", "mny", "mxy")} AS yb
       |  FROM orders, mm)
       |SELECT ($z) >> 10 AS z_bucket, count(*) AS n_rows,
       |  min(xb) AS min_xb, max(xb) AS max_xb,
       |  min(yb) AS min_yb, max(yb) AS max_yb
       |FROM coords
       |GROUP BY z_bucket
       |ORDER BY z_bucket""".stripMargin
  }

  /** MANIFEST-committed z-clustered layout (round 14): [[writeZOrdered]]
    * lays plain parquet; this composes the same Morton curve with
    * [[graft.sinks.ManifestTable]]'s per-file stats envelopes, which is
    * where multi-dimensional skipping actually cashes out — every
    * committed file covers a narrow (x, y) rectangle, so the manifest
    * records TIGHT min/max for BOTH columns and `pruneFiles`/
    * `readBetween` skip files for a predicate on EITHER dimension. A
    * single-column range layout gives perfect envelopes on one
    * dimension and useless full-range envelopes on the other; at 10⁵+
    * files a 2-D slice query reads ~√ of what the linear layout reads.
    * Bounds for the byte-bucket scaler are taken from the frame itself
    * (one 1-row aggregate).
    */
  def replaceZClustered(df: DataFrame, path: String,
                        xCol: String, yCol: String, nFiles: Int): Long = {
    val b = df.agg(
      min(col(xCol)).cast("double").as("mnx"),
      max(col(xCol)).cast("double").as("mxx"),
      min(col(yCol)).cast("double").as("mny"),
      max(col(yCol)).cast("double").as("mxy")).head()
    val z = zValue(
      byteBucket(col(xCol), lit(b.getDouble(0)), lit(b.getDouble(1))),
      byteBucket(col(yCol), lit(b.getDouble(2)), lit(b.getDouble(3))))
    val laid = df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
    graft.sinks.ManifestTable.replace(laid, path)
  }

  /** Oracle-checked query: a 2-D slice (a customer band × a date band)
    * served THROUGH the z-clustered manifest layout — the skipping
    * read on one dimension, the residual filter on the other — with
    * require()s pinning that the manifest actually skipped more than
    * half the files on EACH dimension independently (the property a
    * linear layout cannot have: ScaleSpec measures its day-envelopes
    * keeping everything). The oracle recomputes the slice from the raw
    * table: identical answers, different bytes — layout is physical,
    * never semantic.
    */
  def zClusterSkip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zclu_").toFile
    try {
      val path = new java.io.File(tmp, "orders_z").toString
      val o = Sources.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Scale.replaceZClustered(o, path, "o_custkey", "dayn", 64)
      val b = o.agg(
        min(col("o_custkey")).as("mnc"), max(col("o_custkey")).as("mxc"),
        min(col("dayn")).as("mnd"), max(col("dayn")).as("mxd")).head()
      val (mnc, mxc) = (b.getAs[Number](0).longValue, b.getAs[Number](1).longValue)
      val (mnd, mxd) = (b.getAs[Number](2).longValue, b.getAs[Number](3).longValue)
      // a ~10% band on each dimension, bounds integer-derived so the
      // oracle reproduces them exactly
      val (loC, hiC) = (mnc + (mxc - mnc) * 2 / 5, mnc + (mxc - mnc) / 2)
      val (loD, hiD) = (mnd + (mxd - mnd) * 2 / 5, mnd + (mxd - mnd) / 2)
      import graft.sinks.ManifestTable
      val (keptX, total) = ManifestTable.pruneFiles(
        spark, path, "o_custkey", loC.toDouble, hiC.toDouble)
      val (keptY, _) = ManifestTable.pruneFiles(
        spark, path, "dayn", loD.toDouble, hiD.toDouble)
      require(total >= 16, s"z-layout produced only $total files")
      require(keptX.size * 2 <= total,
        s"x-dimension did not skip: ${keptX.size}/$total files kept")
      require(keptY.size * 2 <= total,
        s"y-dimension did not skip: ${keptY.size}/$total files kept")
      val out = ManifestTable
        .readBetween(spark, path, "o_custkey", loC.toDouble, hiC.toDouble)
        .filter(col("dayn") >= loD && col("dayn") <= hiD)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("cents")).as("cents_sum"),
          countDistinct(col("o_custkey")).as("n_cust"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
      out.localCheckpoint(eager = true)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(tmp)
    }
  }

  val zClusterSkipSql: String =
    """WITH r AS (
      |  SELECT o_orderkey, o_custkey,
      |         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS dayn,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |b AS (
      |  SELECT min(o_custkey) AS mnc, max(o_custkey) AS mxc,
      |         min(dayn) AS mnd, max(dayn) AS mxd
      |  FROM r)
      |SELECT count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS cents_sum,
      |  count(DISTINCT o_custkey) AS n_cust,
      |  min(o_orderkey) AS min_key,
      |  max(o_orderkey) AS max_key
      |FROM r, b
      |WHERE o_custkey BETWEEN mnc + (mxc - mnc) * 2 // 5
      |                    AND mnc + (mxc - mnc) // 2
      |  AND dayn BETWEEN mnd + (mxd - mnd) * 2 // 5
      |               AND mnd + (mxd - mnd) // 2""".stripMargin

  /** Bucketed table writer: co-locates (and pre-sorts) data on the
    * join/agg key so later joins between tables bucketed the same way
    * need NO exchange — the SinksSpec-style proof lives in ScaleSpec.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Snapshot/delta boundary for [[incrementalAgg]]: orders strictly
    * before this date form the "yesterday's snapshot" side, the rest
    * the fresh delta partition.
    */
  val IncrCutoff = "2000-01-01"

  /** Incremental aggregate maintenance: the snapshot aggregate (orders
    * before [[IncrCutoff]]) merged with the delta partition's aggregate
    * (orders on/after it) by re-aggregating algebraic partials —
    * sum/count merge across the union, avg is derived from the merged
    * partials at the end (it does not merge directly). The oracle
    * recomputes the aggregate over ALL orders in one pass: equality IS
    * the statement that the incremental plan maintains the view.
    *
    * At 100 TB this is the difference between aggregating one day's
    * partition and re-scanning seven years; both sub-scans here push
    * their disjoint date filters into the parquet reader, and a real
    * deployment would read the snapshot side from the previously
    * materialized partials rather than re-deriving them.
    *
    * The merged sum runs in exact integer cents (2-decimal money data)
    * so the partial-merge order is irrelevant — integer addition is
    * associative, floats are not, and a 1-ulp difference landing on a
    * .005 boundary would otherwise flip the rounded revenue vs the
    * oracle's single-pass sum. revenue and avg_price are then pure
    * integer-ratio derivations, bit-identical on both engines.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("o_orderpriority"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("_pcents"),
        count(lit(1)).as("_pcnt"))
    val orders = Sources.orders(spark, dir)
    val cutoff = lit(IncrCutoff).cast("timestamp")
    partials(orders.filter(col("o_orderdate") < cutoff))
      .unionByName(partials(orders.filter(col("o_orderdate") >= cutoff)))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("_pcents")).as("_cents"), sum(col("_pcnt")).as("n_orders"))
      .select(col("o_orderpriority"),
        (col("_cents") / 100.0).as("revenue"),
        col("n_orders"),
        (round(col("_cents") * lit(100.0) / col("n_orders")).cast("long") /
          10000.0).as("avg_price"))
      .orderBy(col("o_orderpriority"))
  }

  val incrementalAggSql: String =
    """SELECT o_orderpriority,
      |  cents / 100.0 AS revenue,
      |  n_orders,
      |  CAST(round(cents * 100.0 / n_orders) AS BIGINT) / 10000.0 AS avg_price
      |FROM (
      |  SELECT o_orderpriority,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin


  /** Feature-hashing (the "hashing trick") encode: each categorical
    * feature value maps to a fixed-dimension index via the engine-
    * portable md5 bucket — no vocabulary build, no fit step, stable
    * across runs/engines/cluster sizes, which is what lets a 100 TB
    * featurization job run as a pure scan-side map. Emitted as the
    * sorted index list per row (the driver compare can't hash arrays,
    * so it rides as a joined string); collisions are the technique's
    * documented trade-off and land as duplicate indices.
    */
  val FeatureDim = 64

  def featureHash(spark: SparkSession, dir: String): DataFrame =
    Sources.customer(spark, dir)
      .select(col("c_custkey"),
        concat_ws(",", transform(array_sort(array(
          hashBucket(concat(lit("seg:"), col("c_mktsegment")), FeatureDim),
          hashBucket(concat(lit("nat:"), col("c_nationkey").cast("string")),
            FeatureDim))), x => x.cast("string"))).as("feature_idx"))
      .orderBy(col("c_custkey"))

  val featureHashSql: String =
    s"""SELECT c_custkey,
      |  array_to_string(list_sort([
      |    ${hashBucketSql("'seg:' || c_mktsegment", FeatureDim)},
      |    ${hashBucketSql("'nat:' || CAST(c_nationkey AS VARCHAR)", FeatureDim)}
      |  ]), ',') AS feature_idx
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Shuffle-key skew diagnostics — the measurement an operator runs
    * BEFORE deciding between plain hash partitioning, salting
    * ([[saltedSumCount]]) and AQE skew splitting: for each candidate
    * key of the lineitem fact, the key count, the heaviest key's row
    * share, the share held by the top 1% of keys, and the Gini
    * coefficient of the row-count distribution
    * (G = 2·Σ i·cᵢ / (n·Σc) − (n+1)/n over counts sorted ascending —
    * ties contribute the same Σ i·cᵢ under any tie order, so the
    * statistic is deterministic).
    *
    * Scale shape (round 10 — the count-of-counts closure): one
    * map-side-combined count per key (the only corpus-sized shuffle),
    * then every rank-weighted statistic closes over the COUNT-OF-
    * COUNTS table f(c) = #keys with exactly c rows — ≤ O(√N) rows
    * (distinct count values sum to ≤ N), orders of magnitude below
    * even the n_keys frame the round-9 form ranked. The key identity
    * never matters: keys tie only on equal c, an equal-c block
    * occupies a contiguous rank range whose rank-sum is an arithmetic
    * series (f·s + f(f+1)/2 — tie order irrelevant, the same
    * invariance the window form's docstring argued), and the top-1%
    * cut takes whole blocks plus an interchangeable boundary slice
    * (every boundary key carries the same c), so ic / top1pct_rows /
    * max are EXACT and bit-identical to the row_number oracle, which
    * stays unchanged as the gate. One [[distributedPrefixSum]] over
    * f(c) per candidate key replaces round 9's two N-sized
    * [[distributedRowNumber]] applications (measured: 6 corpus-frame
    * checkpoints → 3 tiny ones). All moments are exact integers; the
    * three output ratios are single final divisions. (ic saturates
    * long around n_keys ~ 3e9 · avg_c — the same ceiling as the
    * window form's Σ i·c; rescale to sampled keys past that.)
    */
  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    val li = Sources.lineitem(spark, dir)
    def profile(keyCol: String): DataFrame = {
      val counts = li.groupBy(col(keyCol).as("k"))
        .agg(count(lit(1)).as("c"))
      val coc = counts.groupBy(col("c")).agg(count(lit(1)).as("f"))
      // inclusive Σf over c ascending; c is unique per row, so it is
      // its own total tie-break
      val cum = distributedPrefixSum(coc, col("c"), col("c"),
        col("f"), "cumf")
      val tot = coc.agg(sum(col("f")).as("nk"),
        sum(col("c") * col("f")).as("nr"), max(col("c")).as("mx"))
      cum.crossJoin(broadcast(tot))
        // ascending block start s = keys strictly below this c;
        // the block's Σ(rank)·c = c · (f·s + f(f+1)/2)
        .withColumn("s", col("cumf") - col("f"))
        .withColumn("ic_c", col("c") *
          (col("f") * col("s") + expr("(f * (f + 1)) DIV 2")))
        // descending: keys strictly above = nk − cumf; the top-1%
        // cut T = nk DIV 100 takes min(f, T − above) keys here
        .withColumn("t1_c", col("c") *
          greatest(lit(0L), least(col("f"),
            expr("nk DIV 100") - (col("nk") - col("cumf")))))
        .select(lit(keyCol).as("key_name"), col("nk"), col("nr"),
          col("mx"), col("ic_c"), col("t1_c"))
        .groupBy(col("key_name"))
        .agg(max(col("nk")).as("n_keys"),
          max(col("nr")).as("n_rows"),
          max(col("mx")).as("max_rows"),
          sum(col("ic_c")).as("ic"),
          sum(col("t1_c")).as("top1pct_rows"))
    }
    val all = profile("l_orderkey")
      .unionByName(profile("l_partkey"))
      .unionByName(profile("l_suppkey"))
    all.select(col("key_name"), col("n_keys"), col("n_rows"),
        round(col("max_rows").cast("double") /
          col("n_rows").cast("double"), 6).as("max_share"),
        round(col("top1pct_rows").cast("double") /
          col("n_rows").cast("double"), 6).as("top1pct_share"),
        round(lit(2.0) * col("ic").cast("double") /
          (col("n_keys").cast("double") * col("n_rows").cast("double")) -
          (col("n_keys").cast("double") + 1.0) /
            col("n_keys").cast("double"), 6).as("gini"))
      .orderBy(col("key_name"))
  }

  val keySkewSql: String = {
    def one(key: String) =
      s"""SELECT '$key' AS key_name, k, c,
         |    row_number() OVER (ORDER BY c ASC, k ASC) AS i,
         |    row_number() OVER (ORDER BY c DESC, k ASC) AS r,
         |    count(*) OVER () AS nk
         |  FROM (SELECT $key AS k, count(*) AS c FROM lineitem GROUP BY 1)""".stripMargin
    s"""WITH ranked AS (
      |  ${one("l_orderkey")}
      |  UNION ALL
      |  ${one("l_partkey")}
      |  UNION ALL
      |  ${one("l_suppkey")}
      |), m AS (
      |  SELECT key_name, CAST(count(*) AS BIGINT) AS n_keys,
      |    CAST(sum(c) AS BIGINT) AS n_rows,
      |    CAST(max(c) AS BIGINT) AS max_rows,
      |    CAST(sum(i * c) AS BIGINT) AS ic,
      |    CAST(sum(CASE WHEN r * 100 <= nk THEN c ELSE 0 END) AS BIGINT)
      |      AS top1pct_rows
      |  FROM ranked GROUP BY key_name
      |)
      |SELECT key_name, n_keys, n_rows,
      |  round(CAST(max_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
      |    AS max_share,
      |  round(CAST(top1pct_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
      |    AS top1pct_share,
      |  round(2.0 * CAST(ic AS DOUBLE)
      |        / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
      |        - (CAST(n_keys AS DOUBLE) + 1.0) / CAST(n_keys AS DOUBLE), 6)
      |    AS gini
      |FROM m ORDER BY key_name""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_key_skew" -> (keySkew _),
    "q_incremental_agg" -> (incrementalAgg _),
    "q_feature_hash" -> (featureHash _),
    "q_salted_revenue" -> (saltedRevenue _),
    "q_order_split" -> (orderSplit _),
    "q_stratified_sample" -> (stratifiedDocSample _),
    "q_zorder_bucket" -> (zOrderStats _),
    "q_zcluster_skip" -> (zClusterSkip _),
    "q_bloom_pruned_join" -> (bloomPrunedRevenue _)
  )

  val oracles: Map[String, String] = Map(
    "q_key_skew" -> keySkewSql,
    "q_incremental_agg" -> incrementalAggSql,
    "q_feature_hash" -> featureHashSql,
    "q_salted_revenue" -> saltedRevenueSql,
    "q_order_split" -> orderSplitSql,
    "q_stratified_sample" -> stratifiedDocSampleSql,
    "q_zorder_bucket" -> zOrderStatsSql,
    "q_zcluster_skip" -> zClusterSkipSql,
    "q_bloom_pruned_join" -> bloomPrunedRevenueSql
  )
}
