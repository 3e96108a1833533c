package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.Sources._

/** Text / document pipeline operators (SURVEY.md §2.8 L1–L4) — the
  * dedup + text-analysis surface a large-scale training-data pipeline
  * needs, on the harness `documents` table.
  *
  * Scale notes (100 TB):
  *  - Exact dedup groups on md5(text), never on raw text — group keys
  *    stay 32 bytes regardless of document size, and the shuffle
  *    carries (hash, doc_id), not the documents.
  *  - All pairwise ops (Jaccard, MinHash-LSH, SimHash) are BLOCKED on
  *    (lang, source): candidate pairs are generated only inside a
  *    block, turning O(n²) into Σ|block|². At cluster scale the block
  *    key would be the LSH band bucket itself; the shapes below keep
  *    that join form (groupBy bucket → self-join) so swapping the key
  *    is a one-line change.
  *  - No UDFs: shingling/hashing use built-in higher-order functions
  *    (transform/filter/aggregate) and xxhash64, all Catalyst
  *    expressions.
  */
object TextOps {

  /** Distinct unigram token SET per document (array form), with the
    * blocking keys and the per-doc set size — the docSets shape
    * [[pairwiseJaccard]] consumes, so downstream pairwise ops never
    * need a second scan/aggregation to recover |A| and |B|.
    */
  private def tokenSets(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(split(col("text"), " ")).as("set"))
      .withColumn("n_item", size(col("set")))

  // ---------------------------------------------------------------
  // L1: exact dedup
  // ---------------------------------------------------------------

  /** Exact dedup on normalized text: md5(lower(trim(text))) as the
    * group key; survivor = lowest doc_id; n_copies for audit.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(md5(lower(trim(col("text")))).as("text_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  val dedupExactSql: String =
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(lower(trim(text)))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // L1: exact duplicated-substring spans (Lee et al. 2022)
  // ---------------------------------------------------------------

  /** Duplicated-substring window width, chars: a span is reported
    * where a [[DupSpanWindow]]-char window of the doc occurs at ≥ 2
    * positions anywhere in the corpus (other docs OR self-repetition).
    */
  val DupSpanWindow = 30

  /** Oracle doc-length cap: the SQL twin enumerates window positions
    * from a constant series of this length (DuckDB v1.0 has no
    * lateral series over a column). Part of the ORACLE contract — the
    * spec asserts the fixtures stay under it so corpus growth fails
    * loudly there, not as an inscrutable driver hash mismatch.
    */
  val DupSpanOracleMaxLen = 2000

  /** Exact duplicated-substring spans, the "dedup inside documents"
    * operator of Lee et al. 2022 (arXiv:2107.06499): every
    * [[DupSpanWindow]]-char window whose exact content occurs ≥ 2
    * times in the corpus marks its position duplicated; overlapping
    * and touching marked windows merge into maximal per-doc spans
    * (classic gaps-and-islands — fixed width makes `pos > prev + W`
    * the exact merge test). Their suffix-array formulation is
    * single-node; this is the distributed equivalent for a fixed
    * match length.
    *
    * Scale shape: candidate detection shuffles 8-byte xxhash64 keys
    * (partial-agg combines them map-side), NOT window content — the
    * W-char strings are only rederived for the survivors of the hash
    * count, a corpus-duplication-sized fraction, where an exact
    * content count removes any hash-collision false positives; the
    * rejoin packs each doc's surviving positions into one row first,
    * so a document's text crosses that shuffle once regardless of how
    * many of its windows are marked. Net shuffle ≈ 8 bytes per text
    * byte plus W chars per surviving position (the exact-count key);
    * the span merge partitions by doc_id. Both scans run the [[graft.functions.WindowHashes]]
    * codegen kernel (one long[] per document — the text column never
    * rides the generator rows). The duplicated-hash table is
    * broadcast — it is duplication-sized, not corpus-sized; a corpus
    * whose dup-key set outgrows a broadcast swaps the hint for a
    * plain shuffle join on `h` with the shape unchanged.
    */
  def dupSpans(spark: SparkSession, dir: String,
               w: Int = DupSpanWindow): DataFrame = {
    val hashes = documents(spark, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.WindowOps.windowHashes(col("text"), w))
          .as(Seq("pos", "h")))
    // phase 1: duplicated-hash candidates — 8-byte group keys only
    val dupHashes = hashes.groupBy(col("h"))
      .agg(count(lit(1)).as("hc"))
      .filter(col("hc") >= 2)
      .select(col("h"))
    // phase 2: survivors rejoin their document to rederive the window
    // content; the exact content count kills hash-collision false
    // positives (the output is hash-independent). Candidate positions
    // are packed to ONE row per doc_id before the rejoin, so the text
    // column rides the shuffle once per document — not once per marked
    // position, which on a duplication-heavy corpus would be
    // O(positions × doc length) traffic. The windows are rederived by
    // exploding the packed positions AFTER the join, inside the same
    // stage (no shuffle carries the exploded rows until the win count).
    val candByDoc = hashes.join(broadcast(dupHashes), "h")
      .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("ps"))
    val marked = candByDoc
      .join(documents(spark, dir).select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), explode(col("ps")).as("pos"), col("text"))
      .select(col("doc_id"), col("pos"),
        col("text").substr(col("pos") + 1, lit(w)).as("win"))
      .withColumn("occ",
        count(lit(1)).over(Window.partitionBy(col("win"))))
      .filter(col("occ") >= 2)
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("newi",
        when(col("prev").isNull || col("pos") > col("prev") + w, 1)
          .otherwise(0))
      .withColumn("island", sum(col("newi")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + w).as("e"))
      .select(col("doc_id"),
        col("s").cast("long").as("span_start"),
        col("e").cast("long").as("span_end"),
        (col("e") - col("s")).cast("long").as("span_len"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** DuckDB twin: constant position series (capped by
    * [[DupSpanOracleMaxLen]]), content-grouped occurrence count (the
    * hash phase is an internal pruning step with no output effect),
    * same gaps-and-islands merge.
    */
  val dupSpansSql: String =
    s"""WITH series AS (
       |  SELECT unnest(range(0, $DupSpanOracleMaxLen)) AS pos
       |), wins AS (
       |  SELECT doc_id, s.pos,
       |    substr(text, CAST(s.pos + 1 AS INTEGER), $DupSpanWindow) AS win
       |  FROM documents JOIN series s
       |    ON s.pos <= length(text) - $DupSpanWindow
       |), occ AS (
       |  SELECT win FROM wins GROUP BY win HAVING count(*) >= 2
       |), marked AS (
       |  SELECT doc_id, pos FROM wins WHERE win IN (SELECT win FROM occ)
       |), lagged AS (
       |  SELECT doc_id, pos,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM marked
       |), isl AS (
       |  SELECT doc_id, pos,
       |    sum(CASE WHEN prev IS NULL OR pos > prev + $DupSpanWindow
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM lagged
       |)
       |SELECT doc_id,
       |  CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) + $DupSpanWindow AS BIGINT) AS span_end,
       |  CAST(max(pos) + $DupSpanWindow - min(pos) AS BIGINT) AS span_len
       |FROM isl
       |GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin

  // ---------------------------------------------------------------
  // L4: token counting / text statistics
  // ---------------------------------------------------------------

  /** Shared text metrics — single definition point so the three
    * stats/quality/lang-id queries (and their SQL oracles) cannot
    * drift apart. Tokenization = single-space split; the corpus is
    * space-normalized.
    */
  private val toksOf = split(col("text"), " ")
  private val nToksOf = size(toksOf)
  private val stopwords = Seq("the", "a")
  private val nStopOf =
    size(filter(toksOf, t => stopwords.map(t === _).reduce(_ || _)))
  private val stopRatioOf = nStopOf.cast("double") / nToksOf
  private val meanWordLenOf =
    (length(col("text")) - nToksOf + 1).cast("double") / nToksOf

  /** Per-language token statistics. Tokenization = single-space split
    * (the corpus is space-normalized); mean word length is derived
    * arithmetically from n_chars and token count so both engines
    * compute the identical expression.
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .select(
        col("lang"),
        nToksOf.cast("double").as("n_tokens"),
        stopRatioOf.as("stop_ratio"),
        meanWordLenOf.as("mean_word_len"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        round(avg(col("stop_ratio")), 4).as("avg_stop_ratio"),
        round(avg(col("mean_word_len")), 4).as("avg_word_len"))
      .orderBy(col("lang"))
  }

  val tokenStatsSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  round(avg(n_tokens), 4) AS avg_tokens,
      |  round(avg(stop_ratio), 4) AS avg_stop_ratio,
      |  round(avg(mean_word_len), 4) AS avg_word_len
      |FROM (
      |  SELECT lang,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
      |    CAST(len(list_filter(string_split(text, ' '),
      |                         t -> t IN ('the', 'a'))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS stop_ratio,
      |    CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |      / len(string_split(text, ' ')) AS mean_word_len
      |  FROM documents
      |)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** GPT-2-style pre-tokenizer counting: runs of letters, runs of
    * digits, and runs of other non-space symbols each count as one
    * token — the standard proxy for BPE token budgeting when the
    * merges table isn't on the cluster. Pure regexp expression, so it
    * runs scan-side with pruning intact.
    */
  def tokenBpe(spark: SparkSession, dir: String): DataFrame = {
    val pattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
    val toks = regexp_extract_all(col("text"), lit(pattern), lit(0))
    documents(spark, dir)
      .select(col("lang"), size(toks).cast("double").as("n_bpe"),
        size(array_distinct(toks)).cast("double").as("n_bpe_distinct"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe")).cast("long").as("total_bpe_tokens"),
        round(avg(col("n_bpe")), 4).as("avg_bpe_tokens"),
        round(avg(col("n_bpe_distinct") / col("n_bpe")), 4).as("avg_distinct_ratio"))
      .orderBy(col("lang"))
  }

  val tokenBpeSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
      |  round(avg(n_bpe), 4) AS avg_bpe_tokens,
      |  round(avg(n_bpe_distinct / n_bpe), 4) AS avg_distinct_ratio
      |FROM (
      |  SELECT lang,
      |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS DOUBLE) AS n_bpe,
      |    CAST(len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+'))) AS DOUBLE) AS n_bpe_distinct
      |  FROM documents
      |)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // L4: BPE merge training (Sennrich et al. 2016)
  // ---------------------------------------------------------------

  /** Number of BPE merge rounds the trainer runs (and the oracle
    * unrolls). A production vocabulary is ~30k merges of the same
    * per-round shape; the round count is the contract here because
    * each round is one unrolled CTE pair in the DuckDB twin.
    */
  val BpeMerges = 10

  /** Distributed BPE merge training (Sennrich et al. 2016,
    * arXiv:1508.07909), word-level: the corpus collapses to a
    * (word, count) TYPE table first — the Zipf compression every real
    * BPE trainer exploits — and all merge rounds run on types, never
    * re-scanning the corpus. Each round: weighted adjacent-pair
    * counts over the current symbol states, one global argmax (count
    * DESC, then (lhs, rhs) lexicographic — a total order, so training
    * is deterministic on any partitioning), then the merge applies as
    * one string replace on delimiter-framed states: a symbol `s` is
    * stored `(s)`, the pair rule `(a)(b)→(ab)` — framing makes the
    * left-to-right non-overlapping `replace` exactly BPE's
    * greedy-leftmost merge (consecutive pairs both rewrite; `aaa`
    * under `(a)(a)` merges once), and symbols are `[a-z]+` so the
    * frame characters can never collide with content. Training is
    * restricted to alphabetic words (classic word-level BPE;
    * punctuation/digit runs are pre-tokenizer classes, not merge
    * material). Output: one row per round (lhs, rhs, merged,
    * weighted pair count) plus a step-0 baseline row, with the
    * corpus-wide token count after each merge — the compression
    * curve a tokenizer-training run reports.
    *
    * Scale shape: the corpus scan is one map-side-combinable groupBy
    * (types ≪ tokens); per round, the type table does one explode +
    * one partial-agg count on short string pairs, one TakeOrdered(1)
    * global argmax (corpus-size-independent driver literal — the
    * k-means-codebook shape), and one scan-side replace. No join
    * ever touches the corpus. At a real 30k-merge vocabulary the
    * round loop batches non-conflicting merges per pass (fastBPE's
    * trick); the per-round plan here is exactly one such pass.
    */
  def bpeTrain(spark: SparkSession, dir: String,
               merges: Int = BpeMerges): DataFrame = {
    val rules = bpeTrainRules(spark, dir, merges)
    spark.createDataFrame(rules)
      .toDF("step", "lhs", "rhs", "merged", "pair_count", "corpus_tokens")
      .orderBy(col("step"))
  }

  /** `(c)(a)(t)` framing: symbol list from a framed state. */
  private def symsOf(state: Column): Column =
    split(regexp_replace(state, "^\\(|\\)$", ""), "\\)\\(")

  /** Alphabetic word types of the corpus with their initial framed
    * states — round 0 of the trainer and the vocabulary [[bpeEncode]]
    * replays the rules over.
    */
  private def bpeStates0(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("state", concat_ws("",
        transform(split(col("word"), ""), c => concat(lit("("), c, lit(")")))))

  /** One merge rule applied to a framed state column — this exact
    * string construction IS the greedy-leftmost merge contract, so the
    * trainer and [[bpeEncode]]'s replay must share it.
    */
  private def applyMerge(df: DataFrame, l: String, r: String): DataFrame =
    df.withColumn("state",
      replace(col("state"), lit(s"($l)($r)"), lit(s"($l$r)")))

  /** The training loop itself: per-step
    * (step, lhs, rhs, merged, pair_count, corpus_tokens) rows,
    * step 0 = pre-merge baseline, PLUS the final merged state table —
    * already localCheckpoint-materialized, so the encode side never
    * replays the merge chain over the vocabulary. The caller owns the
    * final frame's blocks: [[bpeTrain]] frees them immediately,
    * [[bpeEncode]] serves from them (the Verify/Bench loops unpersist
    * between queries, like every other checkpoint-returning operator).
    * On failure every checkpoint is freed before rethrow. With
    * `curve = false` the per-round corpus-token accounting (one
    * aggregation job per merge) is skipped and corpus_tokens is 0 —
    * for callers that only need the rules or the final states.
    */
  private def bpeTrainLoop(spark: SparkSession, dir: String, merges: Int,
                           curve: Boolean): (Seq[(Long, String, String, String, Long, Long)], DataFrame) = {
    import spark.implicits._
    // coalesce: sum over zero rows is NULL, and a null-to-Long decode
    // throws — an empty vocabulary must read as 0 tokens, not NPE
    val nToks = (st: DataFrame) => st
      .select(coalesce(sum(col("cnt") * size(symsOf(col("state")))), lit(0L)))
      .as[Long].head()
    // Jobs per round: the curve needs the per-round token aggregation,
    // so curve mode runs 2 actions/round (argmax + nToks, the latter
    // doubling as the round's materializer). WITHOUT the curve the
    // only real action is the argmax — each round's lazy checkpoint
    // materializes under the NEXT round's argmax, and the superseded
    // frame is freed only then (its blocks back the unmaterialized
    // successor until that action runs). Halves the job count of the
    // encode path's training replay.
    var states = bpeStates0(spark, dir).localCheckpoint(eager = false)
    var prev: DataFrame = null // settled predecessor awaiting free
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Long)]
    try {
      rules += ((0L, "", "", "", 0L, if (curve) nToks(states) else 0L))
      var step = 1
      var exhausted = false
      while (step <= merges && !exhausted) {
        val top = states
          .select(col("cnt"), explode(zip_with(
            slice(symsOf(col("state")), lit(1), size(symsOf(col("state"))) - 1),
            slice(symsOf(col("state")), lit(2), size(symsOf(col("state"))) - 1),
            (a, b) => concat(a, lit(" "), b))).as("pair"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("c"))
          // ' ' sorts below [a-z], so ordering the joined pair string
          // IS the (lhs, rhs) lexicographic tie-break
          .orderBy(col("c").desc, col("pair"))
          .limit(1).collect()
        // the argmax materialized `states`; its predecessor is dead now
        if (prev != null) {
          org.apache.spark.sql.GraftBridge.freeCheckpoint(prev); prev = null
        }
        if (top.isEmpty) exhausted = true
        else {
          val parts = top(0).getString(0).split(" ", 2)
          val (l, r) = (parts(0), parts(1))
          val next = applyMerge(states, l, r).localCheckpoint(eager = false)
          rules += ((step.toLong, l, r, l + r, top(0).getLong(1),
            if (curve) nToks(next) else 0L))
          if (curve) {
            // nToks materialized `next`; free the superseded round now
            org.apache.spark.sql.GraftBridge.freeCheckpoint(states)
          } else prev = states
          states = next
          step += 1
        }
      }
      if (!curve) {
        // the final round never got a follow-up argmax — one count()
        // materializes it (honoring the returned-frame-is-checkpointed
        // contract) before the second-to-last round is freed
        states.count()
        if (prev != null) {
          org.apache.spark.sql.GraftBridge.freeCheckpoint(prev); prev = null
        }
      }
    } catch { case e: Throwable =>
      if (prev != null) org.apache.spark.sql.GraftBridge.freeCheckpoint(prev)
      org.apache.spark.sql.GraftBridge.freeCheckpoint(states)
      throw e
    }
    (rules.toSeq, states)
  }

  /** Rules-only view of [[bpeTrainLoop]]: frees the final state table
    * before returning.
    */
  private def bpeTrainRules(spark: SparkSession, dir: String, merges: Int,
                            curve: Boolean = true): Seq[(Long, String, String, String, Long, Long)] = {
    val (rules, fin) = bpeTrainLoop(spark, dir, merges, curve)
    org.apache.spark.sql.GraftBridge.freeCheckpoint(fin)
    rules
  }

  /** BPE encode (the apply side of [[bpeTrain]]): replay the trained
    * merge rules over the word-type vocabulary, then report the
    * per-language tokenization the trained tokenizer would produce —
    * word count, character-level baseline tokens, BPE tokens, and the
    * resulting compression ratio.
    *
    * Scale shape: the encoded vocabulary IS the training loop's final
    * state table — already localCheckpoint-materialized, so encode
    * costs zero extra passes over the type table (the previous
    * [[BpeMerges]]-deep replay of [[applyMerge]] rebuilt, from
    * scratch, exactly the frame the loop already held); the corpus
    * pass explodes words once and joins the broadcast (word → encoded
    * length) vocabulary — at production scale that vocab table is
    * ~10⁵–10⁸ short rows, the canonical broadcast/bucket-join side.
    */
  def bpeEncode(spark: SparkSession, dir: String,
                merges: Int = BpeMerges): DataFrame = {
    val (_, finalStates) = bpeTrainLoop(spark, dir, merges, curve = false)
    val encoded = finalStates
      .select(col("word"), size(symsOf(col("state"))).as("enc_len"))
    documents(spark, dir)
      .select(col("lang"), explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .join(broadcast(encoded), "word")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("char_tokens"),
        sum(col("enc_len")).cast("long").as("bpe_tokens"))
      .withColumn("ratio", round(col("bpe_tokens").cast("double") /
        col("char_tokens").cast("double"), 4))
      .orderBy(col("lang"))
  }

  /** DuckDB twin: same type table, [[BpeMerges]] unrolled rounds —
    * per round one pair-count CTE, one LIMIT-1 argmax CTE, one
    * replace CTE — and the same framed-replace merge semantics
    * (DuckDB's `replace` is the same left-to-right non-overlapping
    * scan). Exact integers throughout.
    */
  private def bpeStepCtes(k: Int): String = {
    val prev = s"s${k - 1}"
    s"""p$k AS (
       |  SELECT pair[1] AS l, pair[2] AS r, CAST(sum(cnt) AS BIGINT) AS c
       |  FROM (
       |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
       |      i -> [syms[i], syms[i + 1]])) AS pair
       |    FROM (SELECT cnt, string_split(trim(state, '()'), ')(') AS syms
       |          FROM $prev))
       |  GROUP BY l, r
       |), m$k AS (
       |  SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1
       |), s$k AS (
       |  -- LEFT JOIN ON TRUE, not CROSS JOIN: if the corpus exhausts
       |  -- its pairs before the merge budget, m$k is EMPTY and a cross
       |  -- join would wipe the states (and every later step, and the
       |  -- encode twin's output) while the Spark trainer stops early
       |  -- with the rules it has. With m.l NULL the replace is NULL
       |  -- and coalesce keeps the state unchanged — exactly early-stop.
       |  SELECT word, cnt,
       |    coalesce(replace(state, '(' || m.l || ')(' || m.r || ')',
       |             '(' || m.l || m.r || ')'), state) AS state
       |  FROM $prev LEFT JOIN m$k m ON TRUE
       |)""".stripMargin
  }

  /** Shared oracle prefix: type table, framed round-0 states, and all
    * [[BpeMerges]] unrolled (pair-count, argmax, replace) CTE triples.
    * Ends inside the WITH list — callers append CTEs / final SELECT.
    */
  private def bpeCtePrefix: String = {
    val steps = (1 to BpeMerges).map(bpeStepCtes).mkString(",\n")
    s"""WITH types AS (
       |  SELECT word, count(*) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents)
       |  GROUP BY word
       |), s0 AS (
       |  SELECT word, cnt,
       |    list_aggregate(list_transform(string_split(word, ''),
       |      c -> '(' || c || ')'), 'string_agg', '') AS state
       |  FROM types
       |),
       |$steps""".stripMargin
  }

  val bpeTrainSql: String = {
    def tokCount(s: String): String =
      s"(SELECT CAST(sum(cnt * len(string_split(trim(state, '()'), ')('))) AS BIGINT) FROM $s)"
    val rows = (1 to BpeMerges).map(k =>
      s"""SELECT CAST($k AS BIGINT) AS step, l AS lhs, r AS rhs,
         |  l || r AS merged, c AS pair_count,
         |  ${tokCount(s"s$k")} AS corpus_tokens FROM m$k""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""$bpeCtePrefix
       |SELECT CAST(0 AS BIGINT) AS step, '' AS lhs, '' AS rhs, '' AS merged,
       |  CAST(0 AS BIGINT) AS pair_count, ${tokCount("s0")} AS corpus_tokens
       |UNION ALL
       |$rows
       |ORDER BY step""".stripMargin
  }

  /** DuckDB twin of [[bpeEncode]]: the trained states `s{BpeMerges}`
    * give each word's encoded length; one corpus word pass joins them.
    */
  val bpeEncodeSql: String =
    s"""$bpeCtePrefix,
       |enc AS (
       |  SELECT word, len(string_split(trim(state, '()'), ')(')) AS enc_len
       |  FROM s$BpeMerges
       |), words AS (
       |  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM documents
       |)
       |SELECT lang, count(*) AS n_words,
       |  CAST(sum(length(word)) AS BIGINT) AS char_tokens,
       |  CAST(sum(enc_len) AS BIGINT) AS bpe_tokens,
       |  round(CAST(sum(enc_len) AS DOUBLE) /
       |        CAST(sum(length(word)) AS DOUBLE), 4) AS ratio
       |FROM words JOIN enc USING (word)
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // L4: vocabulary health — unigram entropy + Zipf fit per language
  // ---------------------------------------------------------------

  /** Per-language vocabulary health metrics: type/token counts,
    * type-token ratio, unigram Shannon entropy (bits), and the Zipf
    * rank-frequency slope (OLS of log2 freq on log2 rank) — the
    * standard corpus sanity panel: entropy collapse or a slope far
    * from −1 flags templated/duplicated or synthetic text before it
    * reaches training.
    *
    * Scale shape: one explode + one (lang, word) count is the only
    * corpus-sized work. Everything after runs on the VOCABULARY,
    * whose size is Heaps-law sublinear in the corpus (~10⁵–10⁷ types
    * per language at any scale), so the per-language rank window —
    * nominally a one-partition-per-language sort — is bounded by
    * vocabulary, not data. H = log2(N) − Σ cnt·log2(cnt)/N needs no
    * per-type probabilities materialized; ties in cnt permute equal
    * y-values across the tied ranks, so the Zipf OLS inputs are a
    * deterministic multiset and the rounded metrics hash-match.
    */
  def langEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = documents(spark, dir)
      .select(col("lang"), explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
    val ranked = counts.withColumn("rnk", row_number().over(
      Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("word").asc)))
    ranked.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * log2(col("cnt"))).as("s_clogc"),
        expr("regr_slope(log2(cnt), log2(rnk))").as("slope"))
      .select(col("lang"), col("n_types"), col("n_tokens"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"),
        round(log2(col("n_tokens")) - col("s_clogc") / col("n_tokens"), 6)
          .as("entropy_bits"),
        round(col("slope"), 6).as("zipf_slope"))
      .orderBy(col("lang"))
  }

  val langEntropySql: String =
    """WITH c AS (
      |  SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      |        FROM documents)
      |  GROUP BY 1, 2
      |), r AS (
      |  SELECT lang, cnt,
      |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word ASC) AS rnk
      |  FROM c
      |)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
      |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |  round(CAST(count(*) AS DOUBLE) / sum(cnt), 6) AS type_token_ratio,
      |  round(log2(CAST(sum(cnt) AS DOUBLE))
      |        - sum(cnt * log2(CAST(cnt AS DOUBLE))) / sum(cnt), 6) AS entropy_bits,
      |  round(regr_slope(log2(CAST(cnt AS DOUBLE)), log2(CAST(rnk AS DOUBLE))), 6)
      |    AS zipf_slope
      |FROM r
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // L4: quality scoring
  // ---------------------------------------------------------------

  /** Heuristic quality score (length band + stopword presence + word
    * shape), bucketed keep/drop — the filter stage of a data pipeline.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val score =
      when(nToksOf.between(20, 120), 1).otherwise(0) +
        when(stopRatioOf.between(0.01, 0.3), 1).otherwise(0) +
        when(meanWordLenOf.between(3.0, 6.0), 1).otherwise(0)
    documents(spark, dir)
      .select(col("lang"), score.as("quality_score"))
      .withColumn("keep", when(col("quality_score") >= 2, 1).otherwise(0))
      .groupBy(col("lang"), col("keep"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("quality_score")), 4).as("avg_score"))
      .orderBy(col("lang"), col("keep"))
  }

  val textQualitySql: String =
    """SELECT lang, keep, count(*) AS n_docs,
      |  round(avg(quality_score), 4) AS avg_score
      |FROM (
      |  SELECT lang, quality_score,
      |    CASE WHEN quality_score >= 2 THEN 1 ELSE 0 END AS keep
      |  FROM (
      |    SELECT lang,
      |      (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 120
      |            THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
      |                           t -> t IN ('the', 'a'))) AS DOUBLE)
      |                / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.3
      |              THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |                / len(string_split(text, ' ')) BETWEEN 3.0 AND 6.0
      |              THEN 1 ELSE 0 END) AS quality_score
      |    FROM documents
      |  )
      |)
      |GROUP BY lang, keep
      |ORDER BY lang, keep""".stripMargin

  // ---------------------------------------------------------------
  // L4: repetition filtering (Gopher-rules-style quality signals)
  // ---------------------------------------------------------------

  /** Per-document repetition metrics, computed entirely scan-side with
    * higher-order functions — zero shuffles per document, so at 100 TB
    * this is a pure map stage that scales with executor count:
    *  - uniq_ratio: distinct-token fraction (low ⇒ looping text)
    *  - top_tok_frac: share of the single most frequent token
    *  - dup_bigram_frac: fraction of bigram slots that are repeats
    * Exposed separately so specs can pin the metrics on crafted docs.
    */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val uniq = array_distinct(toks)
    // top-token count in ONE linear pass: longest run of equal
    // adjacent tokens after a sort — not the quadratic
    // per-distinct-token filter scan, which on a 10k-token doc with 5k
    // distinct tokens would do ~50M comparisons inside one projection
    val topCount = aggregate(
      array_sort(toks),
      struct(lit(null).cast("string").as("prev"),
        lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    // guard nTok == 1: unguarded sequence(1, 0) is DESCENDING in
    // Spark and element_at(toks, 0) throws. With the guard the
    // bigram set is empty and dup_bigram_frac = 1 - 0/0 = NULL —
    // identical to the DuckDB oracle's NULL for one-token docs.
    val bigrams = when(nTok >= 2,
      transform(sequence(lit(1), nTok - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), col("lang"),
      (size(uniq).cast("double") / nTok).as("uniq_ratio"),
      (topCount.cast("double") / nTok).as("top_tok_frac"),
      (lit(1.0) - size(array_distinct(bigrams)).cast("double") /
        (nTok - 1).cast("double")).as("dup_bigram_frac"))
  }

  /** Repetition-based quality filter rollup: flag documents whose
    * repetition signals cross the Gopher-style thresholds, report the
    * per-language flag rate and mean signals.
    */
  def docRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionMetrics(documents(spark, dir))
      .withColumn("flagged",
        when(col("uniq_ratio") < 0.35 || col("top_tok_frac") > 0.20 ||
          col("dup_bigram_frac") > 0.10, 1).otherwise(0))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("flagged")).cast("long").as("n_flagged"),
        round(avg(col("uniq_ratio")), 4).as("avg_uniq_ratio"),
        round(avg(col("top_tok_frac")), 4).as("avg_top_tok_frac"),
        round(avg(col("dup_bigram_frac")), 4).as("avg_dup_bigram_frac"))
      .orderBy(col("lang"))

  val docRepetitionSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(flagged) AS BIGINT) AS n_flagged,
      |  round(avg(uniq_ratio), 4) AS avg_uniq_ratio,
      |  round(avg(top_tok_frac), 4) AS avg_top_tok_frac,
      |  round(avg(dup_bigram_frac), 4) AS avg_dup_bigram_frac
      |FROM (
      |  SELECT lang, uniq_ratio, top_tok_frac, dup_bigram_frac,
      |    CASE WHEN uniq_ratio < 0.35 OR top_tok_frac > 0.20
      |              OR dup_bigram_frac > 0.10 THEN 1 ELSE 0 END AS flagged
      |  FROM (
      |    SELECT lang,
      |      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
      |      CAST(list_max(list_transform(list_distinct(toks),
      |             t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
      |        / len(toks) AS top_tok_frac,
      |      1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)),
      |               i -> toks[i] || ' ' || toks[i + 1]))) AS DOUBLE)
      |        / (len(toks) - 1) AS dup_bigram_frac
      |    FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
      |  )
      |)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // L4: language-ID heuristic (stopword-profile scoring)
  // ---------------------------------------------------------------

  /** N-gram/stopword heuristic language ID: the ratio of high-frequency
    * English function words decides en vs unknown; output is the
    * confusion matrix against the labeled lang column.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .select(col("lang"),
        when(stopRatioOf >= 0.05, "en").otherwise("unk").as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  val langIdSql: String =
    """SELECT lang, predicted, count(*) AS n_docs
      |FROM (
      |  SELECT lang,
      |    CASE WHEN CAST(len(list_filter(string_split(text, ' '),
      |                       t -> t IN ('the', 'a'))) AS DOUBLE)
      |              / len(string_split(text, ' ')) >= 0.05
      |         THEN 'en' ELSE 'unk' END AS predicted
      |  FROM documents
      |)
      |GROUP BY lang, predicted
      |ORDER BY lang, predicted""".stripMargin

  /** Profile size of the trigram language classifier. */
  val LangIdProfileK = 50

  /** Character-trigram language identification (Cavnar & Trenkle
    * 1994's n-gram profiles, simplified to set overlap): each
    * language's profile is its train-split's [[LangIdProfileK]] most
    * frequent character trigrams (count desc, trigram asc — a total
    * order); an eval document is classified to the language whose
    * profile shares the most of the document's DISTINCT trigrams
    * (exact integer overlap, ties to the lexicographically first
    * language). Emitted as the (true lang, predicted) confusion
    * matrix — the honest upgrade over [[langId]]'s binary stopword
    * heuristic, and an in-band accuracy readout. On THIS synthetic
    * corpus the matrix reads near-chance (~14%): the five "languages"
    * share one identical 31-word vocabulary, so the labels are not
    * text-derivable — which is precisely the failure a confusion-
    * matrix audit exists to expose before anyone trusts a lang
    * column downstream (the spec pins this diagnosis).
    *
    * Scale shape: trigram explosion is scan-side; profile building
    * aggregates the vocabulary-sized (lang, trigram) table; the
    * profiles are a |langs|×K broadcast; classification is one join
    * + a bounded per-doc argmax (≤ |langs| candidates).
    */
  def langIdTrigram(spark: SparkSession, dir: String): DataFrame = {
    def tri(c: Column): Column =
      array_distinct(when(length(c) >= 3,
        transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3))))
        .otherwise(array().cast("array<string>")))
    val docs = documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("is_train", isTrain)
    val profW = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("tg").asc)
    val profiles = docs.filter(col("is_train"))
      .select(col("lang"), explode(tri(col("text"))).as("tg"))
      .groupBy(col("lang"), col("tg")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(profW))
      .filter(col("rk") <= LangIdProfileK)
      .select(col("lang").as("cand_lang"), col("tg"))
    val scored = docs.filter(!col("is_train"))
      .select(col("doc_id"), col("lang"), explode(tri(col("text"))).as("tg"))
      .join(broadcast(profiles), "tg")
      .groupBy(col("doc_id"), col("lang"), col("cand_lang"))
      .agg(count(lit(1)).as("overlap"))
    val bestW = Window.partitionBy(col("doc_id"))
      .orderBy(col("overlap").desc, col("cand_lang").asc)
    val predicted = scored
      .withColumn("rk", row_number().over(bestW))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang"), col("cand_lang").as("predicted"))
    // docs with zero profile overlap predict 'unk' (kept via the
    // eval-doc spine)
    docs.filter(!col("is_train")).select(col("doc_id"), col("lang"))
      .join(predicted.select(col("doc_id"),
        col("predicted")), Seq("doc_id"), "left")
      .withColumn("predicted", coalesce(col("predicted"), lit("unk")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** DuckDB twin: same trigram enumeration, profile cut, overlap
    * argmax and unk back-fill.
    */
  val langIdTrigramSql: String =
    s"""WITH docs AS (
      |  SELECT doc_id, lang, text,
      |    ${graft.operators.Scale.hashBucketSql("doc_id")} < 80 AS is_train
      |  FROM documents
      |), tg AS (
      |  SELECT doc_id, lang, is_train, tgm
      |  FROM (SELECT doc_id, lang, is_train,
      |          unnest(list_distinct(list_transform(
      |            range(1, greatest(length(text) - 1, 1)),
      |            i -> substr(text, CAST(i AS INT), 3)))) AS tgm
      |        FROM docs)
      |), prof AS (
      |  SELECT lang AS cand_lang, tgm FROM (
      |    SELECT lang, tgm, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY lang
      |        ORDER BY count(*) DESC, tgm ASC) AS rk
      |    FROM tg WHERE is_train GROUP BY lang, tgm)
      |  WHERE rk <= $LangIdProfileK
      |), scored AS (
      |  SELECT t.doc_id, t.lang, p.cand_lang, count(*) AS overlap
      |  FROM tg t JOIN prof p ON p.tgm = t.tgm
      |  WHERE NOT t.is_train
      |  GROUP BY 1, 2, 3
      |), best AS (
      |  SELECT doc_id, lang, cand_lang AS predicted FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY overlap DESC, cand_lang ASC) AS rk
      |    FROM scored)
      |  WHERE rk = 1
      |)
      |SELECT d.lang AS lang, COALESCE(b.predicted, 'unk') AS predicted,
      |  count(*) AS n_docs
      |FROM (SELECT doc_id, lang FROM docs WHERE NOT is_train) d
      |LEFT JOIN best b USING (doc_id)
      |GROUP BY 1, 2
      |ORDER BY d.lang, predicted""".stripMargin

  /** Sketch-based heavy hitters: per-language top-k tokens via the
    * approx_top_k aggregate (a bounded-memory frequency sketch —
    * the 100 TB answer to "top terms" where an exact groupBy over the
    * full vocabulary would shuffle billions of distinct keys; with
    * maxItemsTracked ≥ the true vocabulary it degrades gracefully to
    * exact counts, which is what the DuckDB oracle verifies). The
    * sketch's own output order is implementation-defined, so rows are
    * re-ranked deterministically (count desc, token asc).
    */
  def approxTopTokens(spark: SparkSession, dir: String,
                      k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("tok").asc)
    // over-fetch 4k from the sketch, then re-rank deterministically
    // (cnt DESC, tok ASC) and cut to k: approx_top_k breaks count
    // ties arbitrarily, so asking for exactly k could return a
    // different tie-member than the oracle's ordering at the rank-k
    // boundary. With vocab <= maxItemsTracked the counts are exact,
    // so the margin makes the boundary deterministic unless a single
    // tie group spans more than 3k tokens. (At a scale factor where
    // per-lang vocab exceeds 10000, counts go approximate and this
    // query's oracle no longer applies — raise maxItemsTracked with
    // corpus vocabulary.)
    documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"))
      .agg(expr(s"approx_top_k(tok, ${4 * k}, 10000)").as("top"))
      .select(col("lang"), explode(col("top")).as("s"))
      .select(col("lang"), col("s.item").as("tok"),
        col("s.count").as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("tok"), col("cnt"))
      .orderBy(col("lang"), col("rnk"))
  }

  val approxTopTokensSql: String =
    """SELECT lang, rnk, tok, cnt FROM (
      |  SELECT lang, tok, cnt,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY cnt DESC, tok ASC) AS rnk
      |  FROM (
      |    SELECT lang, tok, count(*) AS cnt
      |    FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
      |          FROM documents)
      |    GROUP BY lang, tok
      |  )
      |)
      |WHERE rnk <= 5
      |ORDER BY lang, rnk""".stripMargin

  /** TF-IDF top terms per document: term frequency from the raw token
    * stream (duplicates count), document frequency from the distinct
    * stream, idf = ln(N/df). Two aggregations + a broadcast join of
    * the (tiny) document-frequency table; the corpus is scanned once
    * per aggregation and never collected.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String,
                    topK: Int = 3): DataFrame = {
    val docs = documents(spark, dir)
    // corpus size as a broadcast one-row frame (no collect on the
    // driver, works at any scale factor)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val terms = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = terms.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // tf has exactly one row per (doc, tok), so counting its rows per
    // tok IS the document frequency — no separate distinct pass
    val df_ = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // rank on the RAW score; round only in the projection so engine
    // rounding can never reorder near-ties differently
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("raw_tfidf").desc, col("tok").asc)
    tf.join(broadcast(df_), "tok")
      .join(broadcast(nDocs))
      .withColumn("raw_tfidf", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("rnk"), col("tok"),
        round(col("raw_tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val tfidfTopTermsSql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, count(*) AS tf FROM terms GROUP BY doc_id, tok
      |), dfreq AS (
      |  SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM terms)
      |  GROUP BY tok
      |), scored AS (
      |  SELECT doc_id, tok,
      |    tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df) AS raw_tfidf,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df) DESC,
      |                                tok ASC) AS rnk
      |  FROM tf JOIN dfreq USING (tok)
      |)
      |SELECT doc_id, rnk, tok, round(raw_tfidf, 6) AS tfidf FROM scored
      |WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------
  // L4+: BM25 keyword retrieval
  // ---------------------------------------------------------------

  /** BM25 parameters (Robertson–Walker Okapi weighting): k1 saturates
    * term frequency, b dials length normalization; the query is a
    * fixed keyword set. Derived constants are computed ONCE here and
    * interpolated into BOTH engines' expressions, so neither engine
    * re-derives `k1 + 1` or `1 − b` with its own constant folding.
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  private val Bm25K1p1 = Bm25K1 + 1.0
  private val Bm25OneMinusB = 1.0 - Bm25B
  val Bm25QueryTerms: Seq[String] = Seq("spark", "hash", "merge")
  val Bm25TopK = 25

  /** Per-document BM25 scores for [[Bm25QueryTerms]] — the keyword
    * leg every retrieval / RAG-serving pipeline runs next to the
    * vector leg (and the hybrid fusion in
    * [[graft.analytics.Similarity.hybridRrf]] consumes).
    *
    * Scale shape: ONE explode pass over the corpus, grouped by doc_id
    * with map-side-combined conditional counts — per-doc length and
    * per-query-term tf in a single shuffle; corpus statistics (N,
    * Σdl, per-term df) are a second aggregation of that per-doc frame
    * to ONE broadcast row. No per-term join, no posting-list
    * materialization: for a fixed query set the score is a scalar
    * projection. Each term's contribution is rounded to integer
    * MICROS before the cross-term sum, so the reduction is exact
    * integer addition — order-free on any engine or partitioning
    * (the float sum would be the one unordered reduction in the
    * operator).
    */
  private[graft] def bm25Scores(spark: SparkSession, dir: String): DataFrame = {
    val toks = documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val perDocAggs = count(lit(1)).as("dl") +: Bm25QueryTerms.map(t =>
      sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(perDocAggs.head, perDocAggs.tail: _*)
    val statAggs = Seq(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl")) ++ Bm25QueryTerms.map(t =>
      sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def contrib(t: String): Column = {
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5))
      val tfn = col(s"tf_$t").cast("double") * Bm25K1p1 /
        (col(s"tf_$t") + lit(Bm25K1) *
          (lit(Bm25OneMinusB) + lit(Bm25B) * col("dl").cast("double") / avgdl))
      when(col(s"tf_$t") > 0,
        round(idf * tfn * 1e6).cast("long")).otherwise(0L)
    }
    perDoc.join(broadcast(stats))
      .withColumn("score_micros",
        Bm25QueryTerms.map(contrib).reduce(_ + _))
      .withColumn("n_terms", Bm25QueryTerms.map(t =>
        when(col(s"tf_$t") > 0, 1).otherwise(0)).reduce(_ + _))
      .select(col("doc_id"), col("n_terms"), col("score_micros"))
  }

  /** BM25 top-k: the ranked keyword hit list. Global top-k runs as
    * TakeOrdered on the integer score (no global sort, no
    * single-partition window over the corpus); the rank column is
    * assigned after the k-row cut.
    */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25Ranked(spark, dir, Bm25TopK)
      .select(col("rnk"), col("doc_id"), col("n_terms"),
        col("score_micros"),
        (col("score_micros") / 1e6).as("score"))
      .orderBy(col("rnk"))

  /** Ranked keyword list at depth k — positive scores only, TakeOrdered
    * cut, rank assigned AFTER the k-row cut. The ONE ranking discipline
    * shared by the standalone BM25 query and the hybrid-RRF keyword
    * leg, so a tie-break or filter change cannot desynchronize the two.
    */
  private[graft] def bm25Ranked(spark: SparkSession, dir: String,
                                k: Int): DataFrame = {
    val w = Window.orderBy(col("score_micros").desc, col("doc_id").asc)
    bm25Scores(spark, dir)
      .filter(col("score_micros") > 0)
      .orderBy(col("score_micros").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w))
  }

  /** Shared BM25 per-doc scoring CTEs (through `scored`) — used by the
    * [[bm25TopKSql]] oracle and embedded by the hybrid-RRF twin so the
    * two cannot drift.
    */
  private[graft] def bm25ScoredCte: String = {
    val tfCols = Bm25QueryTerms.map(t =>
      s"CAST(count(*) FILTER (WHERE tok = '$t') AS BIGINT) AS tf_$t").mkString(",\n    ")
    val dfCols = Bm25QueryTerms.map(t =>
      s"CAST(count(*) FILTER (WHERE tf_$t > 0) AS BIGINT) AS df_$t").mkString(",\n    ")
    val contribs = Bm25QueryTerms.map { t =>
      s"""(CASE WHEN tf_$t > 0 THEN CAST(round(
         |      ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5))
         |      * (CAST(tf_$t AS DOUBLE) * $Bm25K1p1
         |         / (tf_$t + $Bm25K1 * ($Bm25OneMinusB
         |            + $Bm25B * CAST(dl AS DOUBLE)
         |              / (CAST(sum_dl AS DOUBLE) / n_docs))))
         |      * 1e6) AS BIGINT) ELSE 0 END)""".stripMargin
    }.mkString("\n    + ")
    val nTerms = Bm25QueryTerms.map(t =>
      s"(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), per_doc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM toks GROUP BY doc_id
       |), stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    $dfCols
       |  FROM per_doc
       |), scored AS (
       |  SELECT doc_id,
       |    $contribs AS score_micros,
       |    $nTerms AS n_terms
       |  FROM per_doc CROSS JOIN stats
       |)""".stripMargin
  }

  def bm25TopKSql: String =
    s"""WITH $bm25ScoredCte
       |SELECT row_number() OVER (ORDER BY score_micros DESC, doc_id ASC) AS rnk,
       |  doc_id, n_terms, score_micros, score_micros / 1e6 AS score
       |FROM scored WHERE score_micros > 0
       |ORDER BY score_micros DESC, doc_id ASC
       |LIMIT $Bm25TopK""".stripMargin

  // ---------------------------------------------------------------
  // L2: near-dup via n-gram (unigram token-set) Jaccard
  // ---------------------------------------------------------------

  /** Blocked pairwise Jaccard: distinct tokens exploded, self-joined on
    * (lang, source, tok) so only in-block pairs materialize, then
    * |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. The join key keeps the
    * shuffle bounded by Σ block-token-frequency² instead of n².
    */
  /** Unordered near-dup pairs — shared by the oracle query (which
    * adds the presentation sort) and the clustering path (where a
    * pre-sort would only add a wasted range shuffle).
    */
  /** Blocked pairwise Jaccard over any per-doc item stream — THE
    * single pair-generation/scoring pipeline behind both the unigram
    * (nearDupJaccard) and shingle (ngramJaccard) near-dup queries.
    * `items` must carry (doc_id, lang, source, n_item, item) with
    * items distinct per doc; the join runs only inside a
    * (lang, source) block and the per-pair aggregation recovers
    * |A∩B| while n_item rides along so |A∪B| needs no second scan.
    */
  private def pairwiseJaccard(docSets: DataFrame,
                              threshold: Double): DataFrame = {
    // All bounds below compare in EXACT scaled-integer space with the
    // threshold as the rational tNum/tDen. The final filter compares
    // round(J, 6) >= threshold, which admits J >= threshold - 5e-7;
    // tNum = round(threshold*1e6) - 1 guarantees tNum/tDen <=
    // threshold - 5e-7, so every prune keeps every pair the gate can
    // accept. A floating ceil((n_a+n_b)*t/(1+t)) can land one above
    // the exact rational bound and over-prune a viable candidate
    // before verification — integer cross-multiplication cannot.
    val tDen = 1000000L
    val tNum = math.round(threshold * tDen) - 1
    require(tNum > 0, s"threshold too small for rational prunes: $threshold")
    // `docSets` carries (doc_id, lang, source, n_item, set) with `set`
    // the distinct item array. It feeds three branches (df counts,
    // prefix generation, final verification), so materialize it once —
    // rows are doc-sized, making the checkpoint no bigger than the
    // scan it came from; without it the shingle/tokenize expression
    // re-runs per consumer (runtime AQE reuse cannot canonicalize the
    // three different exchanges above it).
    val sets = docSets.localCheckpoint()
    val items = sets.select(col("doc_id"), col("lang"), col("source"),
      col("n_item"), explode(col("set")).as("item"))
    // AllPairs/ppjoin prefix filtering (Bayardo et al., WWW'07; same
    // scheme as Spark MLlib's set-similarity join). Order each doc's
    // items by ascending document frequency inside its (lang, source)
    // block (ties by item — any total order works, rare-first makes
    // candidates collapse): a pair with J >= t has overlap
    // o >= ceil(t*max(|A|,|B|)), so its first-in-order common item
    // lies within the first |X| - ceil(t*|X|) + 1 items of BOTH docs
    // (pigeonhole on the suffix). Joining only those prefixes — each
    // doc's RAREST grams — generates the candidate set; frequent
    // boilerplate shingles never reach the join, so candidate count
    // scales with rare-gram collisions instead of freq² of the most
    // common gram. That is the property that survives a 100 TB corpus.
    val df = items.groupBy(col("lang"), col("source"), col("item"))
      .agg(count(lit(1)).as("df"))
    // the prefix feeds BOTH sides of the candidate self-join —
    // checkpoint it so the df-join + window run once, not per side
    val prefix = items.join(df, Seq("lang", "source", "item"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("item"))))
      // pos <= n - ceil(t*n) + 1  ⟺  ceil(t*n) <= n - pos + 1  ⟺
      // t*n <= n - pos + 1 (RHS integral)  ⟺  tNum*n <= (n-pos+1)*tDen
      .filter(lit(tNum) * col("n_item") <=
        (col("n_item") - col("pos") + 1) * lit(tDen))
      .select(col("doc_id"), col("n_item"), col("lang"), col("source"),
        col("item"), col("pos"))
      .localCheckpoint()
    val a = prefix.select(col("doc_id").as("doc_a"),
      col("n_item").as("n_a"), col("lang"), col("source"), col("item"),
      col("pos").as("pos_a"))
    val b = prefix.select(col("doc_id").as("doc_b"),
      col("n_item").as("n_b"), col("lang"), col("source"), col("item"),
      col("pos").as("pos_b"))
    // size-ratio prune (exact): J(A,B) <= min/max, so J >= t forces
    // t*|B| <= |A| <= |B|/t — the standard length filter of exact
    // set-similarity joins, applied per matched prefix item.
    // Positional prune (ppjoin): past positions pos_a/pos_b, at most
    // 1 + min(n_a − pos_a, n_b − pos_b) common items remain, and
    // J >= t needs overlap o >= t/(1+t)·(n_a+n_b); with t = tNum/tDen
    // that is o·(tNum+tDen) >= tNum·(n_a+n_b), compared exactly in
    // integers. Per-match ANY-semantics is safe: a viable pair's
    // EARLIEST common item has the loosest bound, so at least one
    // matched row survives.
    val cand = a.join(b, Seq("lang", "source", "item"))
      .filter(col("doc_a") < col("doc_b") &&
        lit(tNum) * col("n_a") <= col("n_b") * lit(tDen) &&
        lit(tNum) * col("n_b") <= col("n_a") * lit(tDen) &&
        (lit(1) + least(col("n_a") - col("pos_a"),
          col("n_b") - col("pos_b"))) * lit(tNum + tDen) >=
          lit(tNum) * (col("n_a") + col("n_b")))
      .select(col("doc_a"), col("doc_b")).distinct()
    // exact verification: candidates re-join the full per-doc item
    // sets (a shuffle join on doc_id — never a broadcast assumption)
    // and the true intersection comes from one codegen'd
    // array_intersect per surviving pair.
    cand
      .join(sets.select(col("doc_id").as("doc_a"),
        col("set").as("set_a"), col("n_item").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"),
        col("set").as("set_b"), col("n_item").as("n_b")), Seq("doc_b"))
      .withColumn("n_inter",
        size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private def nearDupPairs(spark: SparkSession, dir: String,
                           threshold: Double): DataFrame =
    pairwiseJaccard(tokenSets(spark, dir), threshold)

  def nearDupJaccard(spark: SparkSession, dir: String,
                     threshold: Double = 0.8): DataFrame =
    nearDupPairs(spark, dir, threshold)
      .orderBy(col("doc_a"), col("doc_b"))

  val nearDupJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, source,
      |    unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents
      |), sizes AS (
      |  SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM toks a JOIN toks b
      |    ON a.lang = b.lang AND a.source = b.source AND a.tok = b.tok
      |   AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)
      |SELECT doc_a, doc_b,
      |  round(CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter), 6) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Containment threshold for [[containmentDup]] — the fraction of
    * the SMALLER doc's token set that must appear in the bigger one.
    */
  val ContainThreshold = 0.9

  /** Containment near-dup: ordered pairs where the smaller document's
    * token set is ≥ [[ContainThreshold]] inside the bigger one —
    * C(A,B) = |A∩B| / min(|A|,|B|). Jaccard misses exactly these
    * pairs (a short doc quoted inside a long one has tiny |A∩B|/|A∪B|
    * but containment ≈ 1), and sub-document copying — quotations,
    * boilerplate wrappers, train/test snippets pasted into larger
    * pages — is the dedup/decontamination case Jaccard-thresholded
    * pipelines are blind to (Broder'97 distinguishes resemblance from
    * containment for precisely this reason).
    *
    * Scale shape: candidates come from the same rare-first AllPairs
    * prefix as [[pairwiseJaccard]], applied to the SMALLER side only —
    * a pair with C ≥ t shares an item inside the smaller doc's first
    * n − ⌈t·n⌉ + 1 rarest items (pigeonhole on its suffix), compared
    * in exact scaled integers. Containment has no size-ratio prune
    * (that asymmetry is the point), so the candidate join is
    * prefix × block-items: cost Σ_item prefix_df · df — still
    * rare-gram-collision-bounded, never block². Verification is one
    * codegen'd array_intersect per candidate.
    */
  def containmentDup(spark: SparkSession, dir: String,
                     threshold: Double = ContainThreshold): DataFrame = {
    val tDen = 1000000L
    val tNum = math.round(threshold * tDen) - 1
    require(tNum > 0, s"threshold too small for rational prunes: $threshold")
    val sets = tokenSets(spark, dir).localCheckpoint()
    val items = sets.select(col("doc_id"), col("lang"), col("source"),
      col("n_item"), explode(col("set")).as("item"))
    val df = items.groupBy(col("lang"), col("source"), col("item"))
      .agg(count(lit(1)).as("df"))
    val withPos = items.join(df, Seq("lang", "source", "item"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("item"))))
      .localCheckpoint() // feeds the prefix side AND the full probe side
    val prefix = withPos
      .filter(lit(tNum) * col("n_item") <=
        (col("n_item") - col("pos") + 1) * lit(tDen))
      .select(col("doc_id").as("doc_small"), col("n_item").as("n_small"),
        col("lang"), col("source"), col("item"))
    val full = withPos.select(col("doc_id").as("doc_big"),
      col("n_item").as("n_big"), col("lang"), col("source"), col("item"))
    val cand = prefix.join(full, Seq("lang", "source", "item"))
      // small→big is a strict total order: size, then id on ties —
      // each unordered pair is generated at most once per shared item
      .filter(col("n_small") < col("n_big") ||
        (col("n_small") === col("n_big") && col("doc_small") < col("doc_big")))
      .select(col("doc_small"), col("doc_big")).distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_small"),
        col("set").as("set_s"), col("n_item").as("n_small")), Seq("doc_small"))
      .join(sets.select(col("doc_id").as("doc_big"),
        col("set").as("set_b"), col("n_item").as("n_big")), Seq("doc_big"))
      .withColumn("n_inter", size(array_intersect(col("set_s"), col("set_b"))))
      .withColumn("containment",
        round(col("n_inter").cast("double") / col("n_small"), 6))
      .filter(col("containment") >= threshold)
      .select(col("doc_small"), col("doc_big"), col("n_small"),
        col("n_big").as("n_big"), col("containment"))
      .orderBy(col("doc_small"), col("doc_big"))
  }

  val containmentDupSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, lang, source,
      |    unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents
      |), sizes AS (
      |  SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
      |  FROM toks a JOIN toks b
      |    ON a.lang = b.lang AND a.source = b.source AND a.tok = b.tok
      |   AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), ordered AS (
      |  SELECT
      |    CASE WHEN sa.n_tok < sb.n_tok
      |           OR (sa.n_tok = sb.n_tok AND da < db) THEN da ELSE db END
      |      AS doc_small,
      |    CASE WHEN sa.n_tok < sb.n_tok
      |           OR (sa.n_tok = sb.n_tok AND da < db) THEN db ELSE da END
      |      AS doc_big,
      |    least(sa.n_tok, sb.n_tok) AS n_small,
      |    greatest(sa.n_tok, sb.n_tok) AS n_big,
      |    n_inter
      |  FROM inter
      |  JOIN sizes sa ON da = sa.doc_id
      |  JOIN sizes sb ON db = sb.doc_id
      |)
      |SELECT doc_small, doc_big, n_small, n_big,
      |  round(CAST(n_inter AS DOUBLE) / n_small, 6) AS containment
      |FROM ordered
      |WHERE round(CAST(n_inter AS DOUBLE) / n_small, 6) >= $ContainThreshold
      |ORDER BY doc_small, doc_big""".stripMargin

  /** L2 (clustering step): near-dup PAIRS → dedup CLUSTERS via
    * connected components (A≈B, B≈C must collapse {A,B,C} even when
    * A≉C), with the canonical doc = min doc_id per cluster. The
    * oracle recomputes components as a recursive-CTE transitive
    * closure over the same pair graph — feasible because the pair set
    * is already candidate-pruned (closure is quadratic in component
    * size, not corpus size).
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairs(spark, dir, threshold = 0.8)
    val comp = graft.operators.Graph.connectedComponents(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    comp.groupBy(col("comp").as("component"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",",
          transform(sort_array(collect_list(col("v"))),
            x => x.cast("string"))).as("doc_ids"))
      .orderBy(col("component"))
  }

  /** MinHash banding quality harness — the text twin of the embedding
    * side's q_ann_recall, and the measurement that justifies a banding
    * choice before a 100 TB dedup run: exact near-dup pairs
    * ([[nearDupJaccard]], true Jaccard ≥ 0.8, AllPairs-verified) vs
    * the LSH pipeline's candidates ([[minHashLsh]], 32 sigs / 8
    * bands, est ≥ 0.75), scored as precision/recall in exact ppm
    * (integer hits, positive-operand DIV). Both pipelines run
    * unchanged — this is one full-outer join of their k-row pair
    * outputs plus one aggregate; nothing new touches the corpus.
    */
  def minhashRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = nearDupJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("e"))
    val lsh = minHashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("l"))
    exact.join(lsh, Seq("doc_a", "doc_b"), "full_outer")
      .agg(count(col("e")).as("n_exact"), count(col("l")).as("n_lsh"),
        count(when(col("e").isNotNull && col("l").isNotNull, 1)).as("n_hit"))
      .select(col("n_exact"), col("n_lsh"), col("n_hit"),
        expr("CASE WHEN n_lsh = 0 THEN 0" +
          " ELSE (1000000 * n_hit) DIV n_lsh END").as("precision_ppm"),
        expr("CASE WHEN n_exact = 0 THEN 0" +
          " ELSE (1000000 * n_hit) DIV n_exact END").as("recall_ppm"))
  }

  /** DuckDB twin: both existing pipelines embedded as subqueries.
    * (lazy: [[minHashLshSql]] initializes later in the file.)
    */
  lazy val minhashRecallSql: String =
    s"""SELECT count(e.doc_a) AS n_exact, count(l.doc_a) AS n_lsh,
       |  count(CASE WHEN e.doc_a IS NOT NULL AND l.doc_a IS NOT NULL
       |        THEN 1 END) AS n_hit,
       |  CASE WHEN count(l.doc_a) = 0 THEN 0
       |       ELSE (1000000 * count(CASE WHEN e.doc_a IS NOT NULL
       |                AND l.doc_a IS NOT NULL THEN 1 END))
       |            // count(l.doc_a) END AS precision_ppm,
       |  CASE WHEN count(e.doc_a) = 0 THEN 0
       |       ELSE (1000000 * count(CASE WHEN e.doc_a IS NOT NULL
       |                AND l.doc_a IS NOT NULL THEN 1 END))
       |            // count(e.doc_a) END AS recall_ppm
       |FROM ($nearDupJaccardSql) e
       |FULL OUTER JOIN ($minHashLshSql) l
       |  ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b""".stripMargin

  /** Cross-lingual vocabulary overlap matrix — the multilingual
    * diagnostic behind tokenizer-sharing decisions (languages with
    * high type overlap share subword inventories profitably; script-
    * disjoint pairs don't): for every ordered language pair, the
    * count of shared word TYPES and the Jaccard of the two
    * vocabularies in ppm. All work is vocabulary-sized after one
    * explode+distinct (Heaps-law bounded); the pair join is on the
    * token, so candidates are per-token language co-occurrences —
    * never a doc-level cross join — and the output is the bounded
    * |langs|² matrix.
    */
  def langOverlap(spark: SparkSession, dir: String): DataFrame = {
    val vocab = documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val sizes = vocab.groupBy(col("lang")).agg(count(lit(1)).as("v"))
    val a = vocab.select(col("lang").as("lang_a"), col("tok"))
    val b = vocab.select(col("lang").as("lang_b"), col("tok"))
    val shared = a.join(b, "tok")
      .filter(col("lang_a") < col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("lang").as("lang_a"), col("v").as("va"))),
        "lang_a")
      .join(broadcast(sizes.select(col("lang").as("lang_b"), col("v").as("vb"))),
        "lang_b")
      .select(col("lang_a"), col("lang_b"), col("n_shared"),
        col("va"), col("vb"),
        expr("(1000000 * n_shared) DIV (va + vb - n_shared)")
          .as("jaccard_ppm"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** DuckDB twin: same distinct vocabularies, same token-keyed pair
    * join, same exact ppm.
    */
  val langOverlapSql: String =
    """WITH vocab AS (
      |  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), sizes AS (
      |  SELECT lang, count(*) AS v FROM vocab GROUP BY lang
      |), shared AS (
      |  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS n_shared
      |  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.lang < b.lang
      |  GROUP BY 1, 2
      |)
      |SELECT lang_a, lang_b, n_shared, sa.v AS va, sb.v AS vb,
      |  (1000000 * n_shared) // (sa.v + sb.v - n_shared) AS jaccard_ppm
      |FROM shared
      |JOIN sizes sa ON sa.lang = lang_a
      |JOIN sizes sb ON sb.lang = lang_b
      |ORDER BY lang_a, lang_b""".stripMargin

  /** Dedup bias audit — does near-dup removal skew the surviving
    * corpus? Compares the quality-score distribution of KEPT vs
    * REMOVED documents under the keep-min-id rule over the 0.8-Jaccard
    * near-dup pairs (removed = any doc that is the larger id of some
    * pair): per verdict, doc count, mean quality in exact milli units
    * ((1000·Σscore) DIV n — integer scores 0..3, so the mean is an
    * exact rational) and the per-score histogram columns. A large
    * kept-vs-removed gap means the dedup is systematically deleting
    * better (or worse) text than it keeps — the bias labs check
    * before shipping a deduped corpus.
    */
  def dedupBiasAudit(spark: SparkSession, dir: String): DataFrame = {
    val removed = nearDupPairs(spark, dir, threshold = 0.8)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("removed", lit(1))
    val score =
      when(nToksOf.between(20, 120), 1).otherwise(0) +
        when(stopRatioOf.between(0.01, 0.3), 1).otherwise(0) +
        when(meanWordLenOf.between(3.0, 6.0), 1).otherwise(0)
    documents(spark, dir)
      .select(col("doc_id"), score.cast("long").as("q"))
      .join(removed, Seq("doc_id"), "left")
      .withColumn("verdict",
        when(col("removed").isNotNull, lit("removed")).otherwise(lit("kept")))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        expr("(1000 * sum(q)) DIV count(1)").as("mean_q_milli"),
        sum(when(col("q") === 0, 1L).otherwise(0L)).as("q0"),
        sum(when(col("q") === 1, 1L).otherwise(0L)).as("q1"),
        sum(when(col("q") === 2, 1L).otherwise(0L)).as("q2"),
        sum(when(col("q") === 3, 1L).otherwise(0L)).as("q3"))
      .orderBy(col("verdict"))
  }

  /** DuckDB twin: the near-dup pair subquery + the same inline score. */
  lazy val dedupBiasAuditSql: String =
    s"""WITH removed AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM ($nearDupJaccardSql)
       |), scored AS (
       |  SELECT doc_id,
       |    (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 120
       |          THEN 1 ELSE 0 END)
       |    + (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
       |                         t -> t IN ('the', 'a'))) AS DOUBLE)
       |              / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.3
       |            THEN 1 ELSE 0 END)
       |    + (CASE WHEN CAST(length(text) - len(string_split(text, ' ')) + 1
       |                   AS DOUBLE)
       |              / len(string_split(text, ' ')) BETWEEN 3.0 AND 6.0
       |            THEN 1 ELSE 0 END) AS q
       |  FROM documents
       |)
       |SELECT CASE WHEN r.doc_id IS NULL THEN 'kept' ELSE 'removed' END
       |    AS verdict,
       |  count(*) AS n_docs,
       |  (1000 * CAST(sum(q) AS BIGINT)) // count(*) AS mean_q_milli,
       |  CAST(sum(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS q0,
       |  CAST(sum(CASE WHEN q = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
       |  CAST(sum(CASE WHEN q = 2 THEN 1 ELSE 0 END) AS BIGINT) AS q2,
       |  CAST(sum(CASE WHEN q = 3 THEN 1 ELSE 0 END) AS BIGINT) AS q3
       |FROM scored s LEFT JOIN removed r USING (doc_id)
       |GROUP BY 1
       |ORDER BY verdict""".stripMargin

  /** Thresholds for [[dedupRateCurve]], as 32nds of the signature
    * width — every one an EXACT binary double, so `est ≥ θ` cannot
    * waver between engines.
    */
  val DedupCurve32s: Seq[Int] = Seq(24, 26, 28, 30)

  /** Dedup yield curve — the threshold-sensitivity audit run before
    * committing a near-dup operating point on a 100 TB corpus: for
    * each candidate threshold (est-Jaccard in exact 32nds), how many
    * LSH pairs qualify and how many documents the keep-min-id rule
    * would remove, as a ppm of the corpus. ONE LSH pass feeds every
    * threshold (the pair table is checkpointed and cross-joined to
    * the 4-row threshold frame); the corpus size rides a 1-row
    * broadcast.
    */
  def dedupRateCurve(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minHashLsh(spark, dir, minEstJaccard = 0.75)
      .select(col("doc_b"), col("est_jaccard")).localCheckpoint()
    val ths = spark.range(DedupCurve32s.length)
      .select(element_at(typedlit(DedupCurve32s), col("id").cast("int") + 1)
        .as("th32"))
    val nDocs = documents(spark, dir).agg(count(lit(1)).as("n_corpus"))
    pairs.crossJoin(broadcast(ths))
      .filter(col("est_jaccard") >= col("th32").cast("double") / 32.0)
      .groupBy(col("th32"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_b")).as("n_docs_removed"))
      .crossJoin(broadcast(nDocs))
      .select(col("th32"), col("n_pairs"), col("n_docs_removed"),
        expr("(1000000 * n_docs_removed) DIV n_corpus").as("removed_ppm"))
      .orderBy(col("th32"))
  }

  /** DuckDB twin: [[minHashLshSql]] embedded once, same 32nd-exact
    * thresholds.
    */
  lazy val dedupRateCurveSql: String =
    s"""WITH lsh AS (
       |  SELECT * FROM ($minHashLshSql)
       |), ths AS (
       |  SELECT unnest([${DedupCurve32s.mkString(", ")}]) AS th32
       |)
       |SELECT th32, count(*) AS n_pairs,
       |  CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_removed,
       |  (1000000 * CAST(count(DISTINCT doc_b) AS BIGINT))
       |    // (SELECT count(*) FROM documents) AS removed_ppm
       |FROM lsh JOIN ths ON est_jaccard >= CAST(th32 AS DOUBLE) / 32.0
       |GROUP BY th32
       |ORDER BY th32""".stripMargin

  /** Top-terms compared by [[topTermsShift]]. */
  val TermShiftK = 50

  /** Vocabulary drift between the daily batch and history — the
    * content-level companion to the length-distribution monitors
    * (χ²/KS/PSI watch SHAPE; this watches WHAT the corpus talks
    * about): each side's [[TermShiftK]] most frequent tokens
    * (count desc, token asc — total order), compared as exact overlap
    * and one-sided entrant/dropout counts, with the overlap share in
    * ppm. A collapsing overlap flags a topic/source shift the length
    * histogram cannot see.
    *
    * Scale shape: two vocabulary-sized token aggregations, two
    * TakeOrdered K-row cuts, one K×K-bounded comparison.
    */
  def topTermsShift(spark: SparkSession, dir: String): DataFrame = {
    val isBatch = graft.operators.Scale.isBatch(col("doc_id"))
    val toks = documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("is_batch", isBatch)
    def top(side: DataFrame) = side
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(TermShiftK)
      .select(col("tok"))
    val h = top(toks.filter(!col("is_batch"))).withColumn("in_hist", lit(1))
    val b = top(toks.filter(col("is_batch"))).withColumn("in_batch", lit(1))
    h.join(b, Seq("tok"), "full_outer")
      .agg(count(col("in_hist")).as("n_hist_top"),
        count(col("in_batch")).as("n_batch_top"),
        count(when(col("in_hist").isNotNull &&
          col("in_batch").isNotNull, 1)).as("n_shared"),
        count(when(col("in_hist").isNull, 1)).as("n_entrants"),
        count(when(col("in_batch").isNull, 1)).as("n_dropouts"))
      .select(col("n_hist_top"), col("n_batch_top"), col("n_shared"),
        col("n_entrants"), col("n_dropouts"),
        // zero guard: an empty batch side must read 0, not NULL in
        // Spark vs a division-by-zero abort in DuckDB
        expr("CASE WHEN n_batch_top = 0 THEN 0 " +
          "ELSE (1000000 * n_shared) DIV n_batch_top END").as("overlap_ppm"))
  }

  /** DuckDB twin: same total-order top-K cuts, same full-outer
    * accounting.
    */
  val topTermsShiftSql: String =
    s"""WITH toks AS (
      |  SELECT ${graft.operators.Scale.isBatchSql("doc_id")} AS is_batch,
      |    unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT tok FROM (
      |    SELECT tok, count(*) AS cnt FROM toks WHERE NOT is_batch
      |    GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT $TermShiftK)
      |), b AS (
      |  SELECT tok FROM (
      |    SELECT tok, count(*) AS cnt FROM toks WHERE is_batch
      |    GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT $TermShiftK)
      |)
      |SELECT count(h.tok) AS n_hist_top, count(b.tok) AS n_batch_top,
      |  count(CASE WHEN h.tok IS NOT NULL AND b.tok IS NOT NULL
      |        THEN 1 END) AS n_shared,
      |  count(CASE WHEN h.tok IS NULL THEN 1 END) AS n_entrants,
      |  count(CASE WHEN b.tok IS NULL THEN 1 END) AS n_dropouts,
      |  CASE WHEN count(b.tok) = 0 THEN 0
      |    ELSE (1000000 * count(CASE WHEN h.tok IS NOT NULL AND b.tok IS NOT NULL
      |              THEN 1 END)) // count(b.tok) END AS overlap_ppm
      |FROM h FULL OUTER JOIN b ON h.tok = b.tok""".stripMargin

  /** Quality-aware dedup representatives — the curation upgrade over
    * keep-min-id: within each near-dup cluster (connected components
    * of the 0.8-Jaccard pair graph), keep the member with the HIGHEST
    * quality score (ties to the smallest doc_id — a total order), so
    * deduplication stops deleting the cleanest copy just because a
    * noisier one has a smaller id. Emits one row per multi-member
    * cluster: the chosen representative, its quality, the cluster's
    * best-vs-worst quality spread (spread > 0 is exactly where this
    * rule and keep-min-id disagree materially).
    *
    * Scale shape: the pair graph + CC loop are the [[dedupClusters]]
    * machinery; the selection is one bounded per-cluster argmax over
    * member scores.
    */
  def dedupQualityReps(spark: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairs(spark, dir, threshold = 0.8)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val comp = graft.operators.Graph.connectedComponents(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val score =
      when(nToksOf.between(20, 120), 1).otherwise(0) +
        when(stopRatioOf.between(0.01, 0.3), 1).otherwise(0) +
        when(meanWordLenOf.between(3.0, 6.0), 1).otherwise(0)
    val members = documents(spark, dir)
      .select(col("doc_id"), score.cast("long").as("q"))
      .join(comp.select(col("v").as("doc_id"), col("comp")), "doc_id")
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("q").desc, col("doc_id").asc)
    members
      .withColumn("rk", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("comp"))))
      .withColumn("q_max", max(col("q")).over(Window.partitionBy(col("comp"))))
      .withColumn("q_min", min(col("q")).over(Window.partitionBy(col("comp"))))
      .filter(col("rk") === 1)
      .select(col("comp").as("cluster"), col("n_docs"),
        col("doc_id").as("representative"), col("q").as("rep_quality"),
        (col("q_max") - col("q_min")).as("quality_spread"))
      .orderBy(col("cluster"))
  }

  /** DuckDB twin: the recursive closure + the same inline score and
    * per-cluster argmax.
    */
  lazy val dedupQualityRepsSql: String =
    s"""WITH RECURSIVE
       |pairs AS (SELECT doc_a, doc_b FROM ($nearDupJaccardSql)),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |),
       |verts AS (SELECT DISTINCT src AS v FROM edges),
       |reach(v, r) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src
       |),
       |comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
       |scored AS (
       |  SELECT d.doc_id, c.component,
       |    (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 120
       |          THEN 1 ELSE 0 END)
       |    + (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
       |                         t -> t IN ('the', 'a'))) AS DOUBLE)
       |              / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.3
       |            THEN 1 ELSE 0 END)
       |    + (CASE WHEN CAST(length(text) - len(string_split(text, ' ')) + 1
       |                   AS DOUBLE)
       |              / len(string_split(text, ' ')) BETWEEN 3.0 AND 6.0
       |            THEN 1 ELSE 0 END) AS q
       |  FROM documents d JOIN comp c USING (doc_id)
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY component
       |      ORDER BY q DESC, doc_id ASC) AS rk,
       |    count(*) OVER (PARTITION BY component) AS n_docs,
       |    max(q) OVER (PARTITION BY component) AS q_max,
       |    min(q) OVER (PARTITION BY component) AS q_min
       |  FROM scored
       |)
       |SELECT component AS cluster, n_docs, doc_id AS representative,
       |  CAST(q AS BIGINT) AS rep_quality,
       |  CAST(q_max - q_min AS BIGINT) AS quality_spread
       |FROM ranked WHERE rk = 1
       |ORDER BY cluster""".stripMargin

  /** Leakage-safe train/valid/test split — the assignment rule that
    * makes a held-out set honest: split membership is decided by the
    * NEAR-DUP CLUSTER's canonical id (min doc_id of the connected
    * component under the 0.8-Jaccard pair graph; singletons are their
    * own cluster), hashed through the engine's one md5 80/10/10 rule
    * ([[graft.operators.Scale.hashSplit]]). A document can therefore
    * never see its near-duplicate across the split boundary — the
    * failure mode a doc-id-hashed split silently ships. The emitted
    * `cross_pairs` column COUNTS boundary-crossing near-dup pairs
    * in-band (grouped by the pair's doc_a split) instead of asserting
    * it: all zeros is part of the hash-gated output.
    *
    * Scale shape: the pair graph and components are the
    * [[dedupClusters]] machinery (bucketed candidates, co-partitioned
    * CC loop); everything after is one hash per doc and two
    * doc-keyed joins.
    */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairs(spark, dir, threshold = 0.8)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val comp = graft.operators.Graph.connectedComponents(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val assign = documents(spark, dir).select(col("doc_id"))
      .join(comp.select(col("v").as("doc_id"), col("comp")),
        Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
      .withColumn("split", graft.operators.Scale.hashSplit(col("cluster")))
      .localCheckpoint() // feeds the rollup and both pair endpoints
    val splits = assign.groupBy(col("split"))
      .agg(countDistinct(col("cluster")).as("n_clusters"),
        count(lit(1)).as("n_docs"))
    val xsp = pairs
      .join(assign.select(col("doc_id").as("doc_a"),
        col("split").as("split_a")), "doc_a")
      .join(assign.select(col("doc_id").as("doc_b"),
        col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .groupBy(col("split_a").as("split"))
      .agg(count(lit(1)).as("cross_pairs"))
    splits.join(xsp, Seq("split"), "left")
      .select(col("split"), col("n_clusters"), col("n_docs"),
        coalesce(col("cross_pairs"), lit(0L)).as("cross_pairs"))
      .orderBy(col("split"))
  }

  /** DuckDB twin: the [[dedupClustersSql]] recursive-closure CTEs for
    * components, the one hashBucket split rule, and the same in-band
    * boundary-pair count.
    */
  val leakageSafeSplitSql: String = {
    val bucket = graft.operators.Scale.hashBucketSql("cluster")
    s"""WITH RECURSIVE
      |pairs AS (SELECT doc_a, doc_b FROM ($nearDupJaccardSql)),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs
      |),
      |verts AS (SELECT DISTINCT src AS v FROM edges),
      |reach(v, r) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src
      |),
      |comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
      |assign AS (
      |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
      |  FROM (SELECT doc_id FROM documents) d
      |  LEFT JOIN comp c USING (doc_id)
      |), splitted AS (
      |  SELECT doc_id, cluster,
      |    CASE WHEN $bucket < 80 THEN 'train'
      |         WHEN $bucket < 90 THEN 'valid'
      |         ELSE 'test' END AS split
      |  FROM assign
      |), splits AS (
      |  SELECT split, count(DISTINCT cluster) AS n_clusters,
      |    count(*) AS n_docs
      |  FROM splitted GROUP BY split
      |), xsp AS (
      |  SELECT sa.split, count(*) AS cross_pairs
      |  FROM pairs p
      |  JOIN splitted sa ON sa.doc_id = p.doc_a
      |  JOIN splitted sb ON sb.doc_id = p.doc_b
      |  WHERE sa.split <> sb.split
      |  GROUP BY 1
      |)
      |SELECT s.split, s.n_clusters, s.n_docs,
      |  COALESCE(x.cross_pairs, CAST(0 AS BIGINT)) AS cross_pairs
      |FROM splits s LEFT JOIN xsp x USING (split)
      |ORDER BY split""".stripMargin
  }

  val dedupClustersSql: String =
    s"""WITH RECURSIVE
      |pairs AS (SELECT doc_a, doc_b FROM ($nearDupJaccardSql)),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs
      |),
      |verts AS (SELECT DISTINCT src AS v FROM edges),
      |reach(v, r) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src
      |),
      |comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v)
      |SELECT component, count(*) AS n_docs,
      |  array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
      |FROM comp
      |GROUP BY component
      |ORDER BY component""".stripMargin

  // ---------------------------------------------------------------
  // L2: MinHash + LSH banding (oracle-checked: the hash family is
  // engine-portable, so DuckDB reproduces signatures bit-for-bit)
  // ---------------------------------------------------------------

  val MinHashK = 32 // signature length (σ of the Jaccard estimate ≈ 0.09)
  val LshBands = 8  // bands of r = K/bands = 4 rows each; recall at
                    // threshold J: 1-(1-J^4)^8 (≈0.99 at J=0.8)
  /** Largest prime below 2^32 — modulus of the seeded hash family. */
  val MinHashP = 4294967291L

  /** Engine-portable hash words: [[md5Hex]] digests every element of a
    * string array ONCE (the digest is the dominant cost — two separate
    * md5-then-substring transforms would hash every token twice, and
    * Spark's subexpression elimination cannot hoist across different
    * lambda scopes); [[hexWord]] then extracts a 32-bit word as
    * conv(hex[off..off+7], 16, 10) — the same value DuckDB's
    * ('0x' || substr(md5(x), off, 8))::BIGINT yields, so hash-defined
    * operators built on these are oracle-checkable. off = 1 and 9
    * give two independent words per element; seeded families derive
    * h_i = (h1 + i*h2) mod [[MinHashP]], which stays under 2^38 —
    * ANSI-overflow-safe. At cluster scale swap in xxhash64: identical
    * shapes, one cheaper hash call (the md5 here buys the
    * cross-engine correctness gate, not speed).
    */
  private def md5Hex(arr: Column): Column = transform(arr, t => md5(t))

  private def hexWord(hexArr: Column, off: Int): Column =
    transform(hexArr, s => conv(substring(s, off, 8), 16, 10).cast("long"))

  /** (doc_id, lang, source, sig): the K-lane MinHash signature array,
    * min over the doc's token set of (h1 + i*h2) mod P per seed —
    * computed by the codegen'd one-pass kernel
    * [[graft.functions.MinHashSigs]] (all K lanes in a single token
    * traversal; the HOF formulation re-walked the arrays K times).
    * Entirely scan-side (no explode, no shuffle): the signature build
    * is a pure map stage, so at 100 TB it scales with executor count
    * and the only shuffle in the LSH pipeline is the band-bucket join
    * itself.
    */
  /** Frame-based variant of [[sigArrays]]: works on ANY frame with
    * (doc_id, text, lang, source) — including a STREAMING one (every
    * step is a scan-side expression), which is what lets the
    * stream-static dedup ([[graft.streaming.Pipeline]]) share the
    * exact signature rule with the batch index.
    */
  private[graft] def sigArraysOf(docs: DataFrame): DataFrame = {
    val toks = array_distinct(split(col("text"), " "))
    docs
      .select((Seq(col("doc_id"), col("lang"), col("source")) :+
        toks.as("toks")): _*)
      .select(col("doc_id"), col("lang"), col("source"),
        md5Hex(col("toks")).as("mds"))
      .select(col("doc_id"), col("lang"), col("source"),
        hexWord(col("mds"), 1).as("h1"), hexWord(col("mds"), 9).as("h2"))
      .select(col("doc_id"), col("lang"), col("source"),
        graft.functions.MinHashOps.minhashSigs(
          col("h1"), col("h2"), MinHashK, MinHashP).as("sig"))
  }

  private def sigArrays(spark: SparkSession, dir: String): DataFrame =
    sigArraysOf(documents(spark, dir))

  /** Public index builder: MinHash band-bucket rows of any (doc_id,
    * text, lang, source) frame — the static side of the streaming
    * dedup probe, and what a production table stores per snapshot.
    */
  def bandIndexOf(docs: DataFrame): DataFrame = bandedOf(sigArraysOf(docs))

  /** Band-bucket rows of a signature frame: one row per (doc, band)
    * with the md5 bucket of that band's r consecutive minhashes —
    * THE banding rule, shared by the pairwise LSH, the incremental
    * dedup, and the streaming probe so they cannot drift.
    */
  private[graft] def bandedOf(
      sigs: DataFrame,
      keyCols: Seq[String] = Seq("doc_id", "lang", "source")): DataFrame = {
    val r = MinHashK / LshBands
    val bandCols: Seq[Column] = (0 until LshBands).map { band =>
      md5(concat_ws(",", (band * r until (band + 1) * r)
        .map(i => element_at(col("sig"), i + 1)): _*))
    }
    sigs.select(
      ((keyCols.map(col) :+ col("sig")) :+
        posexplode(array(bandCols: _*)).as(Seq("band", "bucket"))): _*)
  }

  /** Signature-agreement estimate between two sig columns, through the
    * codegen'd [[graft.functions.SigLaneAgree]] lane-count kernel: the
    * zip_with/aggregate HOF form is not codegen-able and one HOF in a
    * projection knocks the WHOLE enclosing stage out of codegen
    * (measured 31 s vs ~3 s on sourceLeakage's 5.7M-row collision
    * stream), while unrolling K element_at comparisons as Column
    * arithmetic blows the generated method up instead (measured worse
    * still). One scalar loop keeps every LSH consumer's scoring inside
    * whole-stage codegen.
    */
  private[graft] def sigAgreement(a: Column, b: Column): Column =
    // no round(): n/32 is an exact 5-decimal binary fraction (32 = 2⁵),
    // so the oracle's round(·, 5) is the identity and a Spark-side
    // round would only add a per-row BigDecimal allocation on the
    // collision stream
    graft.functions.MinHashOps.sigLaneAgree(a, b).cast("double") / MinHashK

  /** Smallest band index on which the two signatures agree lane-for-
    * lane (Int.MaxValue if none) — lets a band-bucket join emit each
    * colliding pair EXACTLY once (keep only the row whose band equals
    * this) with zero state: the same first-shared-bucket discipline as
    * [[graft.operators.Intervals.overlapJoin]], which is what the
    * STREAMING dedup probe needs (a stateful per-pair dropDuplicates
    * would grow without bound on an unbounded stream).
    */
  private[graft] def firstAgreeingBand(a: Column, b: Column): Column =
    graft.functions.MinHashOps.firstAgreeBand(a, b, LshBands)

  /** Column-per-lane view (h0..h{K-1}) of [[sigArrays]] — the public
    * signature surface the specs pin lane by lane.
    */
  def minHashSignatures(spark: SparkSession, dir: String): DataFrame =
    sigArrays(spark, dir)
      .select((Seq(col("doc_id"), col("lang"), col("source")) ++
        (0 until MinHashK).map(i =>
          element_at(col("sig"), i + 1).as(s"h$i"))): _*)

  /** Candidate pairs via LSH banding: each band of r consecutive
    * minhashes is hashed into a bucket; docs sharing (block, band,
    * bucket) become candidates; candidates are scored by signature
    * agreement (estimated Jaccard) — no second pass over the text.
    */
  def minHashLsh(spark: SparkSession, dir: String,
                 minEstJaccard: Double = 0.75): DataFrame = {
    // one kernel invocation produces the signature ARRAY; both the
    // banding and the agreement estimate read it, so the signature
    // subtree is computed once per join side — no third scan to
    // re-fetch signatures for candidate scoring.
    // index-build-once: the signature map stage has no shuffle for AQE
    // to reuse across the self-join sides, so materialize the (slim:
    // K longs + keys per doc) signature table before banding
    val sigs = sigArrays(spark, dir).localCheckpoint()
    val banded = bandedOf(sigs)
    val a = banded.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("lang"), col("source"), col("band"), col("bucket"))
    val b = banded.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("lang"), col("source"), col("band"), col("bucket"))
    a.join(b, Seq("lang", "source", "band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      // a pair can collide in several bands — exactly-once WITHOUT a
      // pair-dedup shuffle: keep only the collision row at the first
      // lane-agreeing band (codegen'd kernel; bucket equality ⇒ lane
      // equality absent md5 collisions, the contract the streaming
      // probe already relies on)
      .filter(col("band") === firstAgreeingBand(col("sig_a"), col("sig_b")))
      // n/32 is binary-exact with 5 decimal digits, so round(·, 5) is
      // the identity in BOTH engines — no rounding ambiguity at all
      .withColumn("est_jaccard", sigAgreement(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB twin of the FULL LSH pipeline — portable hash words,
    * seeded signature mins, md5 band buckets, candidate join,
    * signature-agreement estimate — so the hash compare proves the
    * whole index construction is engine-independent, not just the
    * final scores.
    */
  val minHashLshSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, source,
      |    unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h1,
      |    CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h2
      |  FROM toks
      |), sig AS (
      |  SELECT doc_id, lang, source, i,
      |    min((h1 + i * h2) % 4294967291) AS m
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS i) seeds
      |  GROUP BY doc_id, lang, source, i
      |), band AS (
      |  SELECT doc_id, lang, source, i // 4 AS band,
      |    md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
      |  FROM sig GROUP BY doc_id, lang, source, i // 4
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM band a JOIN band b USING (lang, source, band, bucket)
      |  WHERE a.doc_id < b.doc_id
      |), agree AS (
      |  SELECT c.doc_a, c.doc_b,
      |    sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS n_eq
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.doc_a
      |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
      |  GROUP BY c.doc_a, c.doc_b
      |)
      |SELECT doc_a, doc_b, round(n_eq / 32.0, 5) AS est_jaccard
      |FROM agree
      |WHERE n_eq / 32.0 >= 0.75
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Cross-source duplicate-leakage matrix: per language, how many
    * near-duplicate pairs STRADDLE two different sources, with the
    * mean signature agreement — the governance view that tells a
    * corpus owner which feeds copy from which (mirrors, scrapes of
    * scrapes, license laundering) before both copies dilute training.
    * The within-source runs ([[minHashLsh]]) deliberately band inside
    * (lang, source); this operator bands on lang ONLY and keeps
    * exactly the pairs those runs exclude (source_a ≠ source_b),
    * canonicalized to an unordered source pair.
    *
    * Scale shape: same kernel, same index — signatures computed once,
    * band-bucket equi-join for candidates (cost scales with real
    * cross-source duplicate density, which IS the output), exact
    * integer pair counts. A duplication-heavy corpus makes the
    * collision stream LARGE (each pair collides in up to all 8 bands —
    * sf0.1's planted duplication yields 5.7M collision rows for 1.05M
    * true pairs), so no per-pair row may cross a shuffle: both join
    * sides carry their signature array and each pair survives ONLY at
    * its [[firstAgreeingBand]] — the stateless exactly-once discipline
    * the streaming probe uses — so multi-band duplicates die inside
    * the join stage, the agreement estimate is computed right there,
    * and the only post-join shuffle is the (lang, src_lo, src_hi)
    * matrix rollup, which map-side combines to the matrix size.
    * Measured at sf0.1: 32.6 s with signatures riding a per-pair
    * dedup shuffle, 7.8 s with a bare-pair dedup + attribute rejoins,
    * ~2 s with the first-band discipline and no pair-level shuffle at
    * all. Each agreement estimate is an exact multiple of 1/32
    * (binary-exact, round-5 is the identity), so their sum is exact
    * and the matrix means are one division — engine-portable.
    */
  def sourceLeakage(spark: SparkSession, dir: String,
                    minEstJaccard: Double = 0.75): DataFrame = {
    // Signature-group collapse (dedup-before-LSH): docs with IDENTICAL
    // signatures — exact copies and boilerplate mirrors, the very thing
    // this operator hunts — would otherwise each collide with every
    // other copy, making the collision stream QUADRATIC in copy
    // multiplicity (measured sf0.1: 5.67M collision rows from 5,000
    // docs in 3,622 signature groups; one 185-copy group alone is 17k
    // intra pairs). Collapsing to one representative per (lang, sig)
    // group first makes the LSH join scale with DISTINCT-signature
    // pair density; group sizes come back as integer weights. Every
    // doc pair maps to exactly one (group pair, source pair) cell, so
    // the matrix is UNCHANGED — the sf0.01/sf0.1 hash gates prove it.
    val sigs = sigArrays(spark, dir)
    val gid = md5(to_binary(concat_ws(",", col("sig")), lit("utf-8")))
    // per-(lang, group, source) copy counts — bounded by groups ×
    // sources, tiny next to the corpus; sig is constant within a group
    val hist = sigs
      .groupBy(col("lang"), gid.as("gid"), col("source"))
      .agg(count(lit(1)).as("cnt"), first(col("sig")).as("sig"))
      .localCheckpoint()
    // tier 1 — within a signature group (est_jaccard exactly 1.0):
    // pairs straddling sources s<t are a cnt_s × cnt_t product, no
    // pair ever materialized
    val x = hist.select(col("lang"), col("gid"),
      col("source").as("source_a"), col("cnt").as("cnt_a"))
    val y = hist.select(col("lang"), col("gid"),
      col("source").as("source_b"), col("cnt").as("cnt_b"))
    val exact = x.join(y, Seq("lang", "gid"))
      .filter(col("source_a") < col("source_b"))
      .filter(lit(1.0) >= minEstJaccard)
      .select(col("lang"), col("source_a").as("src_lo"),
        col("source_b").as("src_hi"),
        (col("cnt_a") * col("cnt_b")).as("w"),
        lit(1.0).as("est_jaccard"))
    // tier 2 — across signature groups: band-bucket join over group
    // REPRESENTATIVES only; exactly-once via the first lane-agreeing
    // band (bucket equality ⇒ lane equality absent md5 collisions —
    // the contract the streaming probe already relies on)
    val groups = hist.groupBy(col("lang"), col("gid"))
      .agg(first(col("sig")).as("sig"))
    val banded = bandedOf(groups.select(col("gid"), col("lang"),
      col("sig")), keyCols = Seq("gid", "lang"))
    val a = banded.select(col("gid").as("gid_a"), col("sig").as("sig_a"),
      col("lang"), col("band"), col("bucket"))
    val b = banded.select(col("gid").as("gid_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"), col("lang"))
    val groupPairs = a.join(b, Seq("lang", "band", "bucket"))
      .filter(col("gid_a") < col("gid_b"))
      .filter(col("band") === firstAgreeingBand(col("sig_a"), col("sig_b")))
      .withColumn("est_jaccard", sigAgreement(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("lang"), col("gid_a"), col("gid_b"), col("est_jaccard"))
    // expand each surviving group pair by the two source histograms
    // (broadcast: groups × sources rows) — cnt_a × cnt_b doc pairs per
    // (source_a ≠ source_b) cell, unordered sources canonicalized
    val hx = hist.select(col("lang"), col("gid").as("gid_a"),
      col("source").as("source_a"), col("cnt").as("cnt_a"))
    val hy = hist.select(col("lang"), col("gid").as("gid_b"),
      col("source").as("source_b"), col("cnt").as("cnt_b"))
    val cross = groupPairs
      .join(broadcast(hx), Seq("lang", "gid_a"))
      .join(broadcast(hy), Seq("lang", "gid_b"))
      .filter(col("source_a") =!= col("source_b"))
      .select(col("lang"),
        least(col("source_a"), col("source_b")).as("src_lo"),
        greatest(col("source_a"), col("source_b")).as("src_hi"),
        (col("cnt_a") * col("cnt_b")).as("w"),
        col("est_jaccard"))
    // weighted rollup: est values are exact multiples of 1/32 and the
    // weights are integers, so sum(est·w)/sum(w) is the same exact
    // rational as the oracle's plain avg over materialized pairs
    exact.unionByName(cross)
      .groupBy(col("lang"), col("src_lo"), col("src_hi"))
      .agg(sum(col("w")).as("n_pairs"),
        round(sum(col("est_jaccard") * col("w")) / sum(col("w")), 6)
          .as("avg_est_jaccard"))
      .orderBy(col("lang"), col("src_lo"), col("src_hi"))
  }

  /** DuckDB twin — the [[minHashLshSql]] pipeline with the source key
    * REMOVED from the band join and the complement filter applied.
    */
  val sourceLeakageSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, source,
      |    unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h1,
      |    CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h2
      |  FROM toks
      |), sig AS (
      |  SELECT doc_id, lang, source, i,
      |    min((h1 + i * h2) % 4294967291) AS m
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS i) seeds
      |  GROUP BY doc_id, lang, source, i
      |), band AS (
      |  SELECT doc_id, lang, source, i // 4 AS band,
      |    md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
      |  FROM sig GROUP BY doc_id, lang, source, i // 4
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
      |    a.source AS source_a, b.source AS source_b
      |  FROM band a JOIN band b USING (lang, band, bucket)
      |  WHERE a.doc_id < b.doc_id AND a.source <> b.source
      |), agree AS (
      |  SELECT c.doc_a, c.doc_b, c.lang, c.source_a, c.source_b,
      |    sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS n_eq
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.doc_a
      |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
      |  GROUP BY 1, 2, 3, 4, 5
      |)
      |SELECT lang, least(source_a, source_b) AS src_lo,
      |  greatest(source_a, source_b) AS src_hi,
      |  count(*) AS n_pairs,
      |  round(avg(round(n_eq / 32.0, 5)), 6) AS avg_est_jaccard
      |FROM agree
      |WHERE round(n_eq / 32.0, 5) >= 0.75
      |GROUP BY 1, 2, 3
      |ORDER BY lang, src_lo, src_hi""".stripMargin

  /** Incremental (cross-snapshot) dedup — the DAILY-pipeline shape:
    * dedup today's batch (doc_id ≡ 4 mod 5, the deterministic batch
    * marker) against the HISTORICAL corpus through the MinHash band
    * index, emitting one verdict row per batch document. The point of
    * the operator is its cost shape: the batch probes the history's
    * bucket index with an equi-join, so a day's run costs
    * O(batch × collisions), never O(corpus²) — and never re-pairs
    * history with itself. In production the history side of `banded`
    * is not recomputed: it IS the stored index table (the
    * ManifestTable gold-table path), appended after each batch
    * passes; intra-batch duplicates are the separate minHashLsh run.
    *
    * Verdict ties break deterministically (est desc, oldest history
    * doc first); batch docs with no colliding bucket emit is_dup=0
    * with null match columns, so the output is a total function of
    * the batch.
    */
  def incrementalDedup(spark: SparkSession, dir: String,
                       minEstJaccard: Double = 0.75): DataFrame = {
    val sigs = sigArrays(spark, dir).localCheckpoint()
    val banded = bandedOf(sigs)
    val isBatch = graft.operators.Scale.isBatch(col("doc_id"))
    val hist = banded.filter(!isBatch)
      .select(col("doc_id").as("dup_of"), col("sig").as("sig_h"),
        col("lang"), col("source"), col("band"), col("bucket"))
    probeVerdict(banded.filter(isBatch), hist,
      sigs.filter(isBatch).select(col("doc_id")).distinct(), minEstJaccard)
  }

  /** Shared verdict tail of [[incrementalDedup]] and
    * [[incrementalDedupPruned]]: probe×history bucket equi-join,
    * signature-agreement score (identical for a pair in every
    * colliding band, so `first` per pair is deterministic), best
    * match per batch doc with deterministic tie-break, and the
    * total-function left join emitting is_dup=0 for clean docs. Both
    * callers MUST produce identical output — the pruned path's whole
    * contract is that file skipping is physically invisible.
    */
  private def probeVerdict(probeBanded: DataFrame, histBanded: DataFrame,
                           batchIds: DataFrame,
                           minEstJaccard: Double): DataFrame = {
    val best = probeBanded
      .join(histBanded, Seq("lang", "source", "band", "bucket"))
      .withColumn("est_jaccard", sigAgreement(col("sig"), col("sig_h")))
      .groupBy(col("doc_id"), col("dup_of"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("est_jaccard").desc, col("dup_of").asc)))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("dup_of"), col("est_jaccard"))
    batchIds
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNotNull, 1L).otherwise(0L).as("is_dup"),
        col("dup_of"), col("est_jaccard"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin: same portable index pipeline as [[minHashLshSql]],
    * restricted to batch-probes-history candidates, with the same
    * deterministic best-match tie-break and total-function output.
    */
  val incrementalDedupSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, lang, source,
      |    unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h1,
      |    CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h2
      |  FROM toks
      |), sig AS (
      |  SELECT doc_id, lang, source, i,
      |    min((h1 + i * h2) % 4294967291) AS m
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS i) seeds
      |  GROUP BY doc_id, lang, source, i
      |), band AS (
      |  SELECT doc_id, lang, source, i // 4 AS band,
      |    md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bucket
      |  FROM sig GROUP BY doc_id, lang, source, i // 4
      |), cand AS (
      |  SELECT DISTINCT a.doc_id, b.doc_id AS dup_of
      |  FROM band a JOIN band b USING (lang, source, band, bucket)
      |  WHERE ${graft.operators.Scale.isBatchSql("a.doc_id")}
      |    AND NOT (${graft.operators.Scale.isBatchSql("b.doc_id")})
      |), agree AS (
      |  SELECT c.doc_id, c.dup_of,
      |    sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS n_eq
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.doc_id
      |  JOIN sig sb ON sb.doc_id = c.dup_of AND sb.i = sa.i
      |  GROUP BY c.doc_id, c.dup_of
      |), best AS (
      |  SELECT doc_id, dup_of, round(n_eq / 32.0, 5) AS est_jaccard,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY round(n_eq / 32.0, 5) DESC, dup_of ASC) AS rk
      |  FROM agree
      |  WHERE n_eq / 32.0 >= 0.75
      |)
      |SELECT d.doc_id,
      |  CASE WHEN b.dup_of IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
      |  b.dup_of, b.est_jaccard
      |FROM (SELECT DISTINCT doc_id FROM documents
      |      WHERE ${graft.operators.Scale.isBatchSql("doc_id")}) d
      |LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // L2+: disk-backed dedup serving index with file skipping
  // (round 12). The streaming/incremental probe's per-batch join
  // SCANS the whole history index (the probe side is batch-sized so
  // the planner builds the hash table on IT — the right pick, but
  // per-batch work is O(index), which at a 100 TB corpus means every
  // micro-batch re-reads the corpus index). The serving index fixes
  // the asymptotic: history is committed through [[graft.sinks
  // .ManifestTable]] range-laid on a packed numeric band-bucket key,
  // so every data file owns a tight key envelope in the manifest
  // stats, and a probe batch opens ONLY the files whose envelopes
  // intersect its own key set — per-batch work O(batch + matching
  // files), never O(index).
  // ---------------------------------------------------------------

  /** Packed sort/stats key of a band-bucket row: band·2⁴⁸ + the first
    * 48 bits of the bucket md5. 51 bits total (band < 8), so the
    * manifest's double stats envelope carries it EXACTLY (doubles are
    * exact to 2⁵³; the envelope's ±1-ulp widening is conservative
    * anyway). Monotone in (band, bucket-prefix): a range layout on
    * this key clusters each band's buckets contiguously.
    */
  private def bandBucketKey: Column =
    col("band").cast("long") * (1L << 48) +
      expr("conv(substring(bucket, 1, 12), 16, 10)").cast("long")

  /** Target file count of the serving index. Toy-scale default keeps
    * every file's envelope narrow enough that a small probe provably
    * skips most files (the spec pins it); a deployment sizes this to
    * ~128 MB files exactly like any lakehouse table.
    */
  val DedupIndexFiles = 32

  /** Commit a banded history index (doc_id, lang, source, sig, band,
    * bucket) as the dedup SERVING table: bkey-keyed, range-laid so
    * each file owns a contiguous key envelope, manifest-committed so
    * the stats ride the snapshot ([[graft.sinks.ManifestTable
    * .replace]] — appends of tomorrow's cleared batch would use the
    * same stage+commit path). Returns the committed version.
    */
  def dedupIndexWrite(histBanded: DataFrame, path: String): Long =
    graft.sinks.ManifestTable.replace(
      histBanded.withColumn("bkey", bandBucketKey)
        .repartitionByRange(DedupIndexFiles, col("bkey"))
        .sortWithinPartitions(col("bkey")),
      path)

  /** APPEND a cleared tranche to the serving index — the daily
    * lifecycle step [[dedupIndexWrite]]'s docstring promises: the new
    * rows are range-laid AMONG THEMSELVES (tight per-file envelopes)
    * and committed via [[graft.sinks.ManifestTable.append]], so
    * existing files carry over untouched while the new files' key
    * envelopes OVERLAP the old layout's. That is exactly the case the
    * prune's interval search handles (runMax walk — containment stays
    * exact under overlap), at the cost of a probe key now matching up
    * to one file per tranche instead of one overall. That growth is
    * BOUNDED (r14): after the commit, if the snapshot's envelope
    * overlap depth exceeds `relayDepth` the whole index is re-laid in
    * the same call via [[compactDedupIndex]] (pass relayDepth=0 to
    * disable — measurement harnesses do). Appends use fewer files
    * than a full write (the tranche is a day, not the corpus):
    * ceil(tranche share) with a floor of 1.
    */
  def dedupIndexAppend(trancheBanded: DataFrame, path: String,
                       files: Int = math.max(1, DedupIndexFiles / 4),
                       relayDepth: Int = DedupRelayDepth): Long = {
    val v = graft.sinks.ManifestTable.append(
      trancheBanded.withColumn("bkey", bandBucketKey)
        .repartitionByRange(files, col("bkey"))
        .sortWithinPartitions(col("bkey")),
      path)
    maybeRelay(trancheBanded.sparkSession, path, relayDepth, v)
  }

  /** [[dedupIndexAppend]] through [[graft.sinks.ManifestTable
    * .appendOnce]] — the per-micro-batch accretion step of the
    * streaming lane: a foreachBatch REPLAY after a crash between the
    * append and the checkpoint commit finds its txn marker in the
    * snapshot and appends nothing (None). The re-lay trigger runs only
    * on a real commit; if a crash lands exactly between the append and
    * its re-lay check, the next batch's append re-checks — the trigger
    * is a maintenance policy, not a correctness gate.
    */
  def dedupIndexAppendOnce(trancheBanded: DataFrame, path: String,
                           txnId: String, files: Int = 1,
                           relayDepth: Int = DedupRelayDepth): Option[Long] =
    graft.sinks.ManifestTable.appendOnce(
      trancheBanded.withColumn("bkey", bandBucketKey)
        .repartitionByRange(files, col("bkey"))
        .sortWithinPartitions(col("bkey")),
      path, txnId)
      .map(v => maybeRelay(trancheBanded.sparkSession, path, relayDepth, v))

  /** Default re-lay threshold for the append path: once the snapshot's
    * envelope [[dedupIndexOverlapDepth]] exceeds this, the next append
    * triggers [[compactDedupIndex]]. Depth — the max number of file
    * envelopes covering one bkey — is the metric that matters (not raw
    * tranche count): it bounds the files a single probe key can match,
    * i.e. exactly the kept-file/readFiles-bytes growth appends cost
    * (measured by `tools/PruneBound`'s appended lane: kept files and
    * probe seconds grow ~linearly with depth at fixed corpus size,
    * and one re-lay restores the write-layout floor).
    */
  val DedupRelayDepth = 8

  private def maybeRelay(spark: SparkSession, path: String,
                         relayDepth: Int, committed: Long): Long =
    if (relayDepth > 0 &&
        dedupIndexOverlapDepth(spark, path) > relayDepth)
      compactDedupIndex(spark, path)
    else committed

  /** Max number of snapshot file envelopes covering any single bkey —
    * 1–2 for a freshly range-laid index (adjacent envelopes can touch
    * at their inclusive endpoints), growing by ~1 per appended tranche
    * (each tranche is range-laid among ITSELF, so its files tile the
    * key space once more). Files with no recorded bkey stats are kept
    * by every probe and therefore count toward every point's depth.
    * Driver cost: one manifest read + an O(files log files) sweep —
    * run per APPEND (a commit-rate event), never per probe.
    */
  def dedupIndexOverlapDepth(spark: SparkSession, path: String): Int = {
    val stats = graft.sinks.ManifestTable.snapshotStats(spark, path)
    val (enveloped, blind) = stats.partition(_._2.contains("bkey"))
    if (enveloped.isEmpty) stats.size
    else {
      // sweep line over (coordinate, +1/-1) events; at equal
      // coordinates starts come before ends (envelopes are inclusive,
      // so files touching at a point DO both match a key there)
      val events = enveloped.flatMap { case (_, st) =>
        val (mn, mx) = st("bkey"); Seq((mn, 1), (mx, -1))
      }.sortBy { case (x, d) => (x, -d) }
      var depth = 0; var max = 0
      events.foreach { case (_, d) =>
        depth += d; if (depth > max) max = depth
      }
      max + blind.size
    }
  }

  /** Re-lay the serving index range-laid in ONE commit: read the
    * snapshot, re-sort by bkey into [[DedupIndexFiles]] tight
    * envelopes, publish via [[dedupIndexWrite]] (readers on the old
    * snapshot are undisturbed — manifest isolation), vacuum old
    * versions. Exact duplicate rows are squeezed out — the only way
    * they arise is the documented appendOnce re-lay window, and the
    * pair-level dedupe in [[probeVerdict]] means they were affecting
    * bytes, never verdicts.
    */
  def compactDedupIndex(spark: SparkSession, path: String): Long = {
    val banded = graft.sinks.ManifestTable.read(spark, path)
      .select(col("doc_id"), col("lang"), col("source"),
        col("sig"), col("band"), col("bucket"))
      .dropDuplicates("doc_id", "band", "bucket")
    val v = dedupIndexWrite(banded, path)
    graft.sinks.ManifestTable.vacuum(spark, path, keepVersions = 2)
    v
  }

  /** Sorted interval index over a snapshot's bkey file envelopes,
    * broadcast ONCE PER SNAPSHOT VERSION and reused by every probe
    * batch against that version (r12 VERDICT #3: the previous shape
    * re-read the manifest, re-expanded envelopes per band and
    * re-broadcast a files-sized local relation EVERY micro-batch —
    * file-count work in the driver's per-batch hot loop, fatal at a
    * ~10⁶-file corpus index). `starts` is ascending; `runMax(i)` is
    * the running max of `ends(0..i)` so containment lookups stay
    * correct for OVERLAPPING envelopes (a non-range-laid index after
    * appends): walk left from the upper bound while runMax ≥ key.
    */
  private final case class DedupEnvIndex(starts: Array[Double],
      ends: Array[Double], runMax: Array[Double], names: Array[String])

  /** Cached per-snapshot envelope state for one index path. Identity
    * is (version, manifest length, manifest mtime) — NOT version alone
    * (r13 advice): an index deleted and recreated at the same path
    * restarts version numbering at 0, and a version-only key would
    * serve the OLD table's envelopes — kept/blind names usually fail
    * loudly in readFiles, but a probe whose keys fall outside the
    * stale envelopes silently reports zero duplicates. `lastUse` is an
    * LRU tick for the size cap.
    */
  private final case class DedupEnvEntry(version: Long, mlen: Long,
      mtime: Long, bc: org.apache.spark.broadcast.Broadcast[DedupEnvIndex],
      blind: Seq[String], total: Int,
      lastUse: java.util.concurrent.atomic.AtomicLong)

  /** Envelope cache per index path. Version + manifest identity are
    * re-resolved per call (one FS listing + one stat — snapshot
    * freshness), the heavy part (manifest parse, sort, broadcast)
    * runs once per snapshot. Entries for deleted tables are swept on
    * every rebuild and the cache is capped (LRU) — a long-lived JVM
    * cycling temp indexes (Verify, tests, ad-hoc probes) must not
    * accumulate dead broadcasts (r13 advice).
    */
  private val dedupEnvCache = new java.util.concurrent.ConcurrentHashMap[
    String, DedupEnvEntry]()
  private val dedupEnvTick = new java.util.concurrent.atomic.AtomicLong()
  private val DedupEnvCacheMax = 64

  /** Drop cache entries whose table no longer resolves, then enforce
    * the LRU cap. Runs only on rebuilds (once per new snapshot), so
    * the per-entry FS probe never sits in the steady-state hot path.
    */
  private def dedupEnvSweep(spark: SparkSession, keep: String): Unit = {
    import scala.jdk.CollectionConverters._
    dedupEnvCache.entrySet().asScala.toList.foreach { e =>
      if (e.getKey != keep &&
          graft.sinks.ManifestTable.latestVersion(spark, e.getKey).isEmpty &&
          dedupEnvCache.remove(e.getKey, e.getValue))
        e.getValue.bc.unpersist(blocking = false)
    }
    while (dedupEnvCache.size() > DedupEnvCacheMax) {
      val victims = dedupEnvCache.entrySet().asScala.toList
        .filter(_.getKey != keep).sortBy(_.getValue.lastUse.get())
      victims.headOption match {
        case Some(e) =>
          if (dedupEnvCache.remove(e.getKey, e.getValue))
            e.getValue.bc.unpersist(blocking = false)
        case None => return
      }
    }
  }

  private def dedupEnvIndexFor(spark: SparkSession, path: String)
      : (org.apache.spark.broadcast.Broadcast[DedupEnvIndex], Seq[String], Int) = {
    import graft.sinks.ManifestTable
    val v = ManifestTable.latestVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed dedup index at $path"))
    val (mlen, mtime) = ManifestTable.manifestIdentity(spark, path, v)
    val cached = dedupEnvCache.get(path)
    if (cached != null && cached.version == v && cached.mlen == mlen &&
        cached.mtime == mtime) {
      cached.lastUse.set(dedupEnvTick.incrementAndGet())
      (cached.bc, cached.blind, cached.total)
    } else {
      val stats = ManifestTable.snapshotStats(spark, path, Some(v))
      val (enveloped, blind) = stats.partition(_._2.contains("bkey"))
      val sorted = enveloped
        .map { case (f, st) => val (mn, mx) = st("bkey"); (mn, mx, f) }
        .sortBy(_._1)
      val starts = sorted.map(_._1).toArray
      val ends = sorted.map(_._2).toArray
      val runMax = ends.clone()
      var i = 1
      while (i < runMax.length) {
        runMax(i) = math.max(runMax(i - 1), runMax(i)); i += 1
      }
      val bc = spark.sparkContext.broadcast(
        DedupEnvIndex(starts, ends, runMax, sorted.map(_._3).toArray))
      val entry = DedupEnvEntry(v, mlen, mtime, bc, blind.map(_._1),
        stats.size,
        new java.util.concurrent.atomic.AtomicLong(
          dedupEnvTick.incrementAndGet()))
      val prev = dedupEnvCache.put(path, entry)
      if (prev != null) prev.bc.unpersist(blocking = false)
      dedupEnvSweep(spark, path)
      (bc, entry.blind, entry.total)
    }
  }

  /** The serving-index files a probe batch must open. The probe's
    * packed bkeys are matched to file envelopes DISTRIBUTED — each
    * task binary-searches the broadcast interval index — and only the
    * matched file NAMES (bounded by the file count, and in practice by
    * the matching-file count, never the probe size) come back to the
    * driver. Range containment alone is exact here: bkey packs the
    * band into its top bits, so `bkey ∈ [mn, mx]` already implies the
    * old expansion's band-equality leg. Files with no recorded bkey
    * stats are kept unconditionally (skipping must be conservative).
    * Per-batch cost: O(probe·log files) task work + O(matched)
    * driver/collect; the per-version envelope build is amortized by
    * [[dedupEnvIndexFor]]. Returns (kept, total).
    */
  private[graft] def dedupPrunedFiles(spark: SparkSession, path: String,
      probeBanded: DataFrame): (Seq[String], Int) = {
    val (bc, blind, total) = dedupEnvIndexFor(spark, path)
    val hit =
      if (bc.value.starts.isEmpty) Seq.empty[String]
      else {
        import spark.implicits._
        probeBanded.select(bandBucketKey.as("bkey")).as[Long]
          .mapPartitions { it =>
            val env = bc.value
            val seen = new scala.collection.mutable.BitSet(env.names.length)
            it.foreach { k =>
              val kd = k.toDouble
              // upper bound: first index with start > kd
              var lo = 0; var hi = env.starts.length
              while (lo < hi) {
                val m = (lo + hi) >>> 1
                if (env.starts(m) <= kd) lo = m + 1 else hi = m
              }
              var i = lo - 1
              while (i >= 0 && env.runMax(i) >= kd) {
                if (env.ends(i) >= kd) seen += i
                i -= 1
              }
            }
            seen.iterator.map(env.names(_))
          }
          .distinct().collect().toSeq
      }
    ((hit ++ blind).distinct, total)
  }

  /** One probe batch against a committed serving index: band the
    * batch, open ONLY [[dedupPrunedFiles]], and emit the verdict
    * through the SHARED [[probeVerdict]] tail — identical row-for-row
    * to what [[incrementalDedup]] would say about the same (batch,
    * history) split. The per-micro-batch unit of the streaming lane
    * ([[graft.streaming.Pipeline.dedupProbePrunedToWarehouse]]) and
    * of [[incrementalDedupPruned]].
    */
  def probePrunedBatch(batchDocs: DataFrame, indexPath: String,
                       minEstJaccard: Double = 0.75): DataFrame = {
    import graft.sinks.ManifestTable
    val spark = batchDocs.sparkSession
    // r12 ADVICE: this method used to execute the batch subtree THREE
    // times uncached — the prune collect, the verdict's probe side and
    // its batch-id side — and inside foreachBatch every execution
    // re-runs the micro-batch source (state reads included). Persist
    // the signature frame (the expensive shingle/minhash stage, and
    // the common ancestor of all three consumers) so the batch source
    // executes ONCE, and return the verdict as an eagerly materialized
    // local checkpoint so the caller's downstream actions (e.g.
    // upsertPruned's null probe + stage write) replay blocks instead
    // of the plan — which also lets the persist be released here
    // rather than leaking past the call.
    // Local-checkpoint trade-off (r13 advice, on record): the blocks
    // are non-replicated and non-recomputable, so on a real cluster
    // an executor loss mid-downstream fails the micro-batch (the
    // checkpointed stream replays it — correctness holds, latency
    // pays), and blocks are reclaimed by the ContextCleaner rather
    // than eagerly; a deployment where executor churn dominates
    // should swap this for persist + caller-side unpersist.
    val sigs = sigArraysOf(batchDocs).persist()
    try {
      val probe = bandedOf(sigs)
      val (kept, _) = dedupPrunedFiles(spark, indexPath, probe)
      val histRaw =
        if (kept.isEmpty)
          ManifestTable.read(spark, indexPath).filter(lit(false))
        else ManifestTable.readFiles(spark, indexPath, kept)
      val hist = histRaw.select(col("doc_id").as("dup_of"),
        col("sig").as("sig_h"),
        col("lang"), col("source"), col("band"), col("bucket"))
      probeVerdict(probe, hist,
        sigs.select(col("doc_id")).distinct(), minEstJaccard)
        .localCheckpoint(eager = true)
    } finally sigs.unpersist(blocking = false): Unit
  }

  /** One probe-AND-ACCRETE batch — the daily-lifecycle unit the r13
    * verdict named as the missing loop closure: probe the serving
    * index ([[probePrunedBatch]]'s skipping read), then APPEND the
    * batch's NOVEL documents' banded signatures so the NEXT batch's
    * probe sees them (the disk twin of the in-memory accretion
    * contract: batch N is judged against batches 1..N-1 plus the
    * initial history). Returns the verdict frame (same schema and
    * row semantics as [[incrementalDedup]], eagerly local-checkpointed).
    *
    * Exactly-once under foreachBatch replay, by construction:
    *  - the HISTORY side anti-joins away THIS batch's own doc_ids, so
    *    a replay whose failed predecessor already appended the batch
    *    (crash between append and checkpoint commit) computes the
    *    IDENTICAL verdict — batch docs can never match themselves or
    *    each other through the half-committed tranche. doc_id is the
    *    document's identity across batches (re-submitting an id is a
    *    replay, not a new document) — the contract that makes this
    *    exclusion semantically a no-op on clean runs.
    *  - the append itself rides [[dedupIndexAppendOnce]]'s txn marker:
    *    the replay's append is a detected no-op.
    *  - within-batch near-duplicates are NOT flagged against each
    *    other (same as every incremental path: the batch is judged
    *    against history) — both land in the index and the next
    *    occurrence flags against whichever appended first.
    */
  def probeAppendBatch(batchDocs: DataFrame, indexPath: String,
                       txnId: String, minEstJaccard: Double = 0.75,
                       appendFiles: Int = 1,
                       relayDepth: Int = DedupRelayDepth): DataFrame = {
    import graft.sinks.ManifestTable
    val spark = batchDocs.sparkSession
    val sigs = sigArraysOf(batchDocs).persist()
    try {
      val probe = bandedOf(sigs)
      val batchIds = sigs.select(col("doc_id")).distinct()
      val (kept, _) = dedupPrunedFiles(spark, indexPath, probe)
      val histRaw =
        if (kept.isEmpty)
          ManifestTable.read(spark, indexPath).filter(lit(false))
        else ManifestTable.readFiles(spark, indexPath, kept)
      val hist = histRaw
        .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
        .select(col("doc_id").as("dup_of"), col("sig").as("sig_h"),
          col("lang"), col("source"), col("band"), col("bucket"))
      val verdict = probeVerdict(probe, hist, batchIds, minEstJaccard)
        .localCheckpoint(eager = true)
      val novelIds = verdict.filter(col("is_dup") === 0)
        .select(col("doc_id"))
      // an all-dup batch appends nothing (and writes no txn marker —
      // a replay recomputes the same empty novel set, so idempotence
      // holds without one)
      if (!novelIds.isEmpty)
        dedupIndexAppendOnce(probe.join(broadcast(novelIds), Seq("doc_id")),
          indexPath, txnId, appendFiles, relayDepth): Unit
      verdict
    } finally sigs.unpersist(blocking = false): Unit
  }

  /** Per-JVM committed-index cache for [[incrementalDedupPruned]],
    * keyed by corpus dir and gated on `-Dgraft.bench.cacheDedupIndex`
    * (set ONLY by [[graft.Bench]] — VERDICT r12 #4): the bench's
    * repeated passes were measuring an index REBUILD every pass
    * (~85% of the query's 2.5–4 s), a build metric standing in for
    * the serving metric. With the cache, pass 1 builds + commits the
    * index once and later passes measure what a serving deployment
    * pays per batch: the probe. Verify/oracle runs never set the flag
    * and keep the build-probe-delete shape. Cached dirs are removed by
    * a JVM shutdown hook.
    */
  private val dedupIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** [[incrementalDedup]] through the disk-backed serving index:
    * history is committed with [[dedupIndexWrite]], the probe runs
    * [[probePrunedBatch]] — so the output is identical row-for-row to
    * the in-memory path and the same DuckDB oracle gates both. What
    * this query adds over q_incr_dedup is the PHYSICAL claim: file
    * skipping changes which bytes are read, never which rows match.
    */
  /** Build-or-reuse plumbing shared by the serving-index queries:
    * under the bench flag the committed index is served from
    * [[dedupIndexCache]] (keyed so the write-path and append-path
    * indexes never collide); otherwise build-probe-delete.
    */
  private def withServingIndex(cacheKey: String)
      (build: java.io.File => String)
      (use: String => DataFrame): DataFrame =
    if (sys.props.get("graft.bench.cacheDedupIndex").contains("true")) {
      val path = dedupIndexCache.computeIfAbsent(cacheKey, { _ =>
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_dedup_idx_cache_").toFile
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          graft.sinks.Sinks.deleteRecursively(tmp)))
        build(tmp)
      })
      use(path)
    } else {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_dedup_idx_").toFile
      try use(build(tmp))
      finally graft.sinks.Sinks.deleteRecursively(tmp)
    }

  def incrementalDedupPruned(spark: SparkSession, dir: String,
                             minEstJaccard: Double = 0.75): DataFrame = {
    val docs = documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val isBatch = graft.operators.Scale.isBatch(col("doc_id"))
    withServingIndex(dir) { into =>
      val path = new java.io.File(into, "dedup_index").toString
      dedupIndexWrite(bandIndexOf(docs.filter(!isBatch)), path)
      path
    }(path => probePrunedBatch(docs.filter(isBatch), path, minEstJaccard))
  }

  /** [[incrementalDedup]] through a serving index built by WRITE then
    * APPEND — the daily index lifecycle: history is split in two
    * deterministic tranches (doc_id parity — engine-independent), the
    * first committed range-laid with [[dedupIndexWrite]], the second
    * appended with [[dedupIndexAppend]], so the probe runs against an
    * index whose file ENVELOPES OVERLAP (the post-append physical
    * state). Output identical row-for-row to [[incrementalDedup]] and
    * [[incrementalDedupPruned]] — the same DuckDB oracle gates all
    * three physical paths. What this query adds over
    * q_incr_dedup_pruned: the prune's overlap-tolerant interval
    * containment (the runMax walk) is exercised by the ORACLE GATE,
    * not only by a spec.
    */
  def incrementalDedupAppended(spark: SparkSession, dir: String,
                               minEstJaccard: Double = 0.75): DataFrame = {
    val docs = documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val isBatch = graft.operators.Scale.isBatch(col("doc_id"))
    withServingIndex(s"$dir#appended") { into =>
      val path = new java.io.File(into, "dedup_index").toString
      val hist = bandIndexOf(docs.filter(!isBatch))
        .localCheckpoint(eager = true) // two tranche writes, one sig pass
      dedupIndexWrite(hist.filter(col("doc_id") % 2 === 0), path)
      dedupIndexAppend(hist.filter(col("doc_id") % 2 =!= 0), path)
      path
    }(path => probePrunedBatch(docs.filter(isBatch), path, minEstJaccard))
  }

  /** [[incrementalDedup]] through a serving index whose build goes
    * append → append → append → TRIGGERED RE-LAY: four doc_id-quarter
    * tranches accrete with the relay disabled, then the last append
    * runs with `relayDepth = 2` — a threshold the snapshot already
    * exceeds — so the oracle-gated path goes through
    * [[dedupIndexOverlapDepth]] and [[compactDedupIndex]] before the
    * probe. Output identical row-for-row to the other three physical
    * paths under the SAME DuckDB oracle: what q_incr_dedup_appended
    * proved for the overlap walk, this proves for the COMPACTION —
    * re-laying (and its exact-duplicate squeeze) changes which bytes
    * a probe reads, never which rows match. The require makes Verify
    * itself fail loudly if the trigger ever stops firing (the physical
    * precondition, not just the row answer).
    */
  def incrementalDedupCompacted(spark: SparkSession, dir: String,
                                minEstJaccard: Double = 0.75): DataFrame = {
    val docs = documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val isBatch = graft.operators.Scale.isBatch(col("doc_id"))
    withServingIndex(s"$dir#compacted") { into =>
      val path = new java.io.File(into, "dedup_index").toString
      val hist = bandIndexOf(docs.filter(!isBatch))
        .localCheckpoint(eager = true) // four tranche writes, one sig pass
      (0 until 4).foreach { i =>
        dedupIndexAppend(hist.filter(col("doc_id") % 4 === i), path,
          files = math.max(1, DedupIndexFiles / 4),
          relayDepth = if (i < 3) 0 else 2): Unit
      }
      require(dedupIndexOverlapDepth(spark, path) <= 2,
        "q_incr_dedup_compacted fixture: the re-lay trigger did not fire")
      path
    }(path => probePrunedBatch(docs.filter(isBatch), path, minEstJaccard))
  }

  // ---------------------------------------------------------------
  // L2: SimHash (oracle-checked: fingerprints derive from the same
  // engine-portable md5 words as MinHash, and the banding is
  // pigeonhole-complete at the default radius, so DuckDB's
  // brute-force same-block hamming join is the exact oracle)
  // ---------------------------------------------------------------

  /** 64-bit SimHash per doc: each token contributes two portable
    * 32-bit hash words ([[hexWord]] at offsets 1 and 9 = fingerprint
    * bits 0..31 and 32..63); every bit gets a ±1 vote and fingerprint
    * bit i is the vote sign. Implemented by the codegen'd one-pass
    * kernel [[graft.functions.SimHashPack]] (64 vote counters filled
    * in a single token traversal — the HOF form took 64
    * size(filter(...)) passes), a pure map stage: no explode, no UDF,
    * no shuffle. Bit i's vote sum over ±1 is
    * 2·(#hashes with bit i set) − n, so the sign test `sum > 0`
    * becomes `2·count > n`.
    */
  def simHashFingerprints(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("doc_id"), col("lang"), col("source"),
        md5Hex(col("toks")).as("mds"))
      .select(col("doc_id"), col("lang"), col("source"),
        hexWord(col("mds"), 1).as("h1"), hexWord(col("mds"), 9).as("h2"))
      .select(col("doc_id"), col("lang"), col("source"),
        graft.functions.MinHashOps.simhashPack(col("h1"), col("h2"))
          .as("simhash"))

  /** Near-dup pairs by SimHash: block on (lang, source), band the
    * 64-bit fingerprint into four 16-bit chunks, verify candidates
    * with bit_count(xor) ≤ maxHamming.
    *
    * Recall contract: by pigeonhole, two fingerprints within hamming
    * distance 3 ALWAYS share at least one of the 4 chunks, so results
    * are complete for maxHamming ≤ 3. Larger thresholds are best-effort
    * (a pair with its differing bits spread across all 4 chunks is
    * never generated as a candidate) — hence the default of 3.
    */
  def simHashDedup(spark: SparkSession, dir: String,
                   maxHamming: Int = 3): DataFrame = {
    // pigeonhole completeness: two hashes within hamming h must agree
    // on at least one of h+1 disjoint chunks — size the banding to the
    // requested radius instead of pinning 4 chunks (which is complete
    // only for h <= 3). More chunks = more candidate pairs, so the
    // chunk count is the smallest 64-divisor that covers the radius.
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15], got $maxHamming")
    val nChunks = Seq(1, 2, 4, 8, 16).find(_ >= maxHamming + 1).get
    val width = 64 / nChunks
    val mask = if (width == 64) -1L else (1L << width) - 1
    // index-build-once: the 64-bit-vote aggregation is the dominant
    // cost and the chunk self-join would compute it per side
    val fps = simHashFingerprints(spark, dir).localCheckpoint()
    val chunks = (0 until nChunks).map(c =>
      shiftright(col("simhash"), c * width).bitwiseAND(lit(mask)))
    val banded = fps.select(
      (Seq(col("doc_id"), col("lang"), col("source"), col("simhash")) :+
        posexplode(array(chunks: _*)).as(Seq("chunk", "chunk_val"))): _*)
    val a = banded.select(col("doc_id").as("doc_a"),
      col("simhash").as("sim_a"), col("lang"), col("source"),
      col("chunk"), col("chunk_val"))
    val b = banded.select(col("doc_id").as("doc_b"),
      col("simhash").as("sim_b"), col("lang"), col("source"),
      col("chunk"), col("chunk_val"))
    a.join(b, Seq("lang", "source", "chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Brute-force same-block hamming join over DuckDB-recomputed
    * fingerprints (two 32-bit words — (1::BIGINT << 63) has no home in
    * a signed BIGINT build, two words do). Deliberately NOT a
    * replication of the chunk banding: the banding is
    * pigeonhole-complete at the default radius, so banded Spark
    * output ≡ brute force — the hash compare is a standing proof of
    * that completeness claim, query by query.
    */
  val simHashDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, source,
      |    unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h1,
      |    CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h2
      |  FROM toks
      |), votes AS (
      |  SELECT doc_id, lang, source, i,
      |    sum(CASE WHEN i < 32 THEN (h1 >> i) & 1
      |             ELSE (h2 >> (i - 32)) & 1 END) AS ones,
      |    count(*) AS n
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS i) bitidx
      |  GROUP BY doc_id, lang, source, i
      |), fp AS (
      |  SELECT doc_id, lang, source,
      |    CAST(sum(CASE WHEN i < 32 AND 2 * ones > n
      |                  THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(sum(CASE WHEN i >= 32 AND 2 * ones > n
      |                  THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS hi
      |  FROM votes GROUP BY doc_id, lang, source
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS hamming
      |FROM fp a JOIN fp b
      |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------
  // L4: document fingerprinting (winnowing; oracle-checked — the
  // shingle hash is the portable 32-bit md5 word, so DuckDB rebuilds
  // the identical fingerprint sets with list comprehensions)
  // ---------------------------------------------------------------

  /** Winnowing fingerprints via higher-order functions only: 3-gram
    * shingle rolling hashes (positional, NOT distinct — winnowing
    * windows are positional), then the min hash of each width-4
    * window, deduplicated — the classic local fingerprint set,
    * computed entirely scan-side (no shuffle at all until the final
    * ordering).
    */
  def docFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nShingle = greatest(size(toks) - 2, lit(1))
    val shingleHashes = transform(
      sequence(lit(1), nShingle),
      i => conv(substring(md5(concat_ws(" ", slice(toks, i, lit(3)))),
        1, 8), 16, 10).cast("long"))
    val w = 4
    val windows = transform(
      sequence(lit(1), greatest(size(col("shingle_hashes")) - (w - 1), lit(1))),
      j => array_min(slice(col("shingle_hashes"), j, lit(w))))
    documents(spark, dir)
      .select(col("doc_id"), shingleHashes.as("shingle_hashes"))
      .select(col("doc_id"),
        array_distinct(windows).as("fingerprints"))
      .select(col("doc_id"),
        size(col("fingerprints")).as("n_fingerprints"),
        array_min(col("fingerprints")).as("min_fp"),
        array_max(col("fingerprints")).as("max_fp"))
      .orderBy(col("doc_id"))
  }

  val docFingerprintsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    [CAST(('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
      |                          1, 8)) AS BIGINT)
      |     FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)] AS hs
      |  FROM t
      |), win AS (
      |  SELECT doc_id,
      |    list_distinct([list_min(hs[j:j+3])
      |                   FOR j IN range(1, greatest(len(hs) - 3, 1) + 1)]) AS fps
      |  FROM sh
      |)
      |SELECT doc_id, len(fps) AS n_fingerprints,
      |  list_min(fps) AS min_fp, list_max(fps) AS max_fp
      |FROM win
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // L4+: benchmark contamination & unigram-LM scoring over a
  // train/eval hash split (the split rule is operators.Scale's —
  // engine-independent md5 bucketing, oracle-proved by q_order_split)
  // ---------------------------------------------------------------

  /** Train bucket predicate: md5(doc_id) bucket < 80 (80/20 split). */
  private def isTrain: Column =
    graft.operators.Scale.hashBucket(col("doc_id")) < 80

  /** The distinct n-token shingle hashes of `text`, as one guarded
    * scan-side expression — THE single definition of a "gram" shared
    * by contamination and ngramJaccard (and mirrored by their
    * oracles), so the shingle rule cannot drift per consumer.
    * sequence+transform build all window hashes in one codegen'd
    * projection; docs shorter than n tokens yield an empty array (the
    * unguarded sequence(1, 0) would be DESCENDING). md5 keeps the
    * gram engine-portable for the oracles; at cluster scale a 64-bit
    * hash (xxhash64) halves the shuffle width.
    */
  private def gramArray(n: Int): Column = {
    val toks = split(col("text"), " ")
    array_distinct(when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => md5(concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>")))
  }

  /** Distinct (doc_id, gram) pairs via [[gramArray]]. */
  private def docGrams(spark: SparkSession, dir: String,
                       n: Int): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), explode(gramArray(n)).as("gram"))

  /** N-gram (shingle) Jaccard near-dup: [[pairwiseJaccard]] over the
    * [[gramArray]] shingle hashes instead of unigram token sets —
    * word *sequences*, not word sets, so reordered documents stop
    * counting as duplicates. The only shuffles are the gram join and
    * the pair aggregation.
    */
  def ngramJaccard(spark: SparkSession, dir: String, n: Int = 3,
                   threshold: Double = 0.6): DataFrame =
    pairwiseJaccard(
      documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          gramArray(n).as("set"))
        .withColumn("n_item", size(col("set"))),
      threshold)
      .orderBy(col("doc_a"), col("doc_b"))

  val ngramJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, source, string_split(text, ' ') AS t
      |  FROM documents
      |), grams AS (
      |  SELECT DISTINCT doc_id, lang, source,
      |    md5(array_to_string(list_slice(t, i, i + 2), ' ')) AS gram
      |  FROM (SELECT doc_id, lang, source, t,
      |          unnest(range(1, greatest(len(t) - 1, 1))) AS i
      |        FROM toks)
      |), sizes AS (
      |  SELECT doc_id, count(*) AS n_gram FROM grams GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM grams a JOIN grams b
      |    ON a.lang = b.lang AND a.source = b.source AND a.gram = b.gram
      |   AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)
      |SELECT doc_a, doc_b,
      |  round(CAST(n_inter AS DOUBLE) / (sa.n_gram + sb.n_gram - n_inter), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_gram + sb.n_gram - n_inter), 6) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Benchmark-contamination check: for each eval-split document, how
    * many of its distinct 8-gram shingles also appear anywhere in the
    * train split. The train gram set is reduced to DISTINCT grams
    * before the join, so the shuffle carries each train gram once —
    * at 100 TB this is a shuffle join on a 32-byte key, optionally
    * pre-filtered by a bloom of the (much smaller) eval gram set.
    * Docs with fewer than 8 tokens produce no grams and are absent,
    * matching the SQL oracle.
    */
  def contamination(spark: SparkSession, dir: String,
                    n: Int = 8): DataFrame = {
    // the eval and train branches both consume the gram table —
    // materialize it once (scan + 8-gram md5 explode + distinct are
    // the expensive part), same discipline as Graph.connectedComponents
    val grams = docGrams(spark, dir, n).localCheckpoint()
    val evalGrams = grams.filter(!isTrain)
    val trainGrams = grams.filter(isTrain).select(col("gram")).distinct()
    evalGrams
      .join(trainGrams.withColumn("hit", lit(1)), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("hit")).as("n_shared"))
      .withColumn("contam_ratio",
        round(col("n_shared").cast("double") / col("n_grams"), 6))
      .orderBy(col("doc_id"))
  }

  val contaminationSql: String =
    s"""WITH split AS (
      |  SELECT doc_id, text,
      |    ${graft.operators.Scale.hashBucketSql("doc_id")} < 80 AS is_train
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, is_train, string_split(text, ' ') AS t FROM split
      |), grams AS (
      |  SELECT DISTINCT doc_id, is_train,
      |    md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS gram
      |  FROM (SELECT doc_id, is_train, t,
      |          unnest(range(1, greatest(len(t) - 6, 1))) AS i
      |        FROM toks)
      |), tr AS (SELECT DISTINCT gram FROM grams WHERE is_train)
      |SELECT g.doc_id, count(*) AS n_grams,
      |  count(tr.gram) AS n_shared,
      |  round(CAST(count(tr.gram) AS DOUBLE) / count(*), 6) AS contam_ratio
      |FROM grams g LEFT JOIN tr ON g.gram = tr.gram
      |WHERE NOT g.is_train
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  /** N-gram novelty of the daily batch against history — the
    * continual-training budget metric ("how much of today's crawl is
    * genuinely new text?") that decides whether a batch is worth a
    * training epoch: per language, the batch's distinct 8-gram
    * shingles anti-joined against history's, with the novel fraction
    * in exact ppm. Uses the SAME gram enumeration as the
    * contamination check and the SAME batch marker as the incremental
    * dedup family — one definition of "gram" and one of "today".
    *
    * Scale shape: distinct-gram tables (shingle-hash keyed) and one
    * hash anti-join on (lang, gram); nothing pairwise, nothing
    * driver-side.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val isBatch = graft.operators.Scale.isBatch(col("doc_id"))
    val base = documents(spark, dir)
      .select(col("lang"), col("doc_id"), explode(gramArray(8)).as("gram"))
      .withColumn("is_batch", isBatch)
    val b = base.filter(col("is_batch"))
      .select(col("lang"), col("gram")).distinct()
    val h = base.filter(!col("is_batch"))
      .select(col("lang"), col("gram")).distinct()
      .withColumn("hit", lit(1))
    b.join(h, Seq("lang", "gram"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_batch_grams"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("lang"), col("n_batch_grams"), col("n_novel"),
        expr("(1000000 * n_novel) DIV n_batch_grams").as("novelty_ppm"))
      .orderBy(col("lang"))
  }

  /** DuckDB twin: same shingle hash, same batch marker, same
    * anti-join.
    */
  val ngramNoveltySql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, lang,
      |    ${graft.operators.Scale.isBatchSql("doc_id")} AS is_batch,
      |    string_split(text, ' ') AS t
      |  FROM documents
      |), grams AS (
      |  SELECT DISTINCT lang, is_batch,
      |    md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS gram
      |  FROM (SELECT lang, is_batch, t,
      |          unnest(range(1, greatest(len(t) - 6, 1))) AS i
      |        FROM toks)
      |), b AS (SELECT DISTINCT lang, gram FROM grams WHERE is_batch),
      |h AS (SELECT DISTINCT lang, gram FROM grams WHERE NOT is_batch)
      |SELECT b.lang, count(*) AS n_batch_grams,
      |  CAST(sum(CASE WHEN h.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  (1000000 * CAST(sum(CASE WHEN h.gram IS NULL THEN 1 ELSE 0 END)
      |             AS BIGINT)) // count(*) AS novelty_ppm
      |FROM b LEFT JOIN h ON b.lang = h.lang AND b.gram = h.gram
      |GROUP BY b.lang
      |ORDER BY b.lang""".stripMargin

  /** Unigram-LM quality score: a Laplace-smoothed unigram model is
    * fit on the train split's token counts and every eval document is
    * scored by its average negative log-likelihood (the KenLM-style
    * perplexity proxy used to filter web corpora). All relational:
    * token counts are one hash aggregation, the corpus constants (N
    * tokens, V vocab) one tiny broadcast, scoring a left join + avg.
    * Unseen tokens get probability 1/(N+V).
    */
  def lmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val trainTok = docs.filter(isTrain)
      .select(explode(split(col("text"), " ")).as("tok"))
    val counts = trainTok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // corpus constants derive from the tiny per-token count table —
    // re-aggregating trainTok would re-scan and re-explode the corpus
    val stats = counts.agg(sum(col("c")).as("n"),
      count(lit(1)).as("v"))
    val evalTok = docs.filter(!isTrain)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    evalTok
      .join(counts, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(avg(-log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (col("n") + col("v")))), 6).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  val lmPerplexitySql: String =
    s"""WITH split AS (
      |  SELECT doc_id, text,
      |    ${graft.operators.Scale.hashBucketSql("doc_id")} < 80 AS is_train
      |  FROM documents
      |), ttok AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok
      |  FROM split WHERE is_train
      |), counts AS (
      |  SELECT tok, count(*) AS c FROM ttok GROUP BY tok
      |), stats AS (
      |  SELECT count(*) AS n, count(DISTINCT tok) AS v FROM ttok
      |), etok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM split WHERE NOT is_train
      |)
      |SELECT doc_id, count(*) AS n_tok,
      |  round(avg(-ln((coalesce(c, 0) + 1.0) / (n + v))), 6) AS avg_nll
      |FROM etok LEFT JOIN counts USING (tok) CROSS JOIN stats
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin


  /** Bigram LM scoring (the [[lmPerplexity]] upgrade a real quality
    * filter runs): per eval document, the average negative log
    * likelihood under a Laplace-smoothed bigram model fitted on the
    * train split — P(w2|w1) = (c(w1 w2)+1) / (ctx(w1)+V), with ctx the
    * count of train bigrams opening with w1 and V the train unigram
    * vocabulary. All model counts are exact integers; the only float
    * is the final ln of identical int ratios on both engines.
    *
    * Bigram generation is scan-side (one guarded transform, no
    * self-join); model lookup is a shuffle join on the bigram string
    * and on the context token — at 100 TB both sides partial-aggregate
    * before shuffling and nothing is assumed broadcastable except the
    * 1-row vocabulary scalar.
    */
  def lmBigram(spark: SparkSession, dir: String): DataFrame = {
    def bigrams(c: Column): Column = {
      val t = split(c, " ")
      when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", slice(t, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
    }
    val docs = documents(spark, dir)
    val trainBg = docs.filter(isTrain)
      .select(explode(bigrams(col("text"))).as("bg"))
    val c2 = trainBg.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    // context counts derive from the already-aggregated bigram table
    // (sum of c12 per opening token), not a corpus re-scan
    val ctx = c2
      .select(substring_index(col("bg"), " ", 1).as("w1"), col("c12"))
      .groupBy(col("w1")).agg(sum(col("c12")).as("ctx"))
    val vocab = docs.filter(isTrain)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    docs.filter(!isTrain)
      .select(col("doc_id"), explode(bigrams(col("text"))).as("bg"))
      .join(c2, Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigram"),
        round(avg(-log((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
          (coalesce(col("ctx"), lit(0L)) + col("v")))), 6).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  val lmBigramSql: String =
    s"""WITH split AS (
      |  SELECT doc_id, text,
      |    ${graft.operators.Scale.hashBucketSql("doc_id")} < 80 AS is_train
      |  FROM documents
      |), tb AS (
      |  SELECT array_to_string(list_slice(t, i, i + 1), ' ') AS bg
      |  FROM (SELECT string_split(text, ' ') AS t
      |        FROM split WHERE is_train),
      |    unnest(range(1, len(t))) AS u(i)
      |), c2 AS (
      |  SELECT bg, count(*) AS c12 FROM tb GROUP BY bg
      |), ctx AS (
      |  SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c12) AS BIGINT) AS ctx
      |  FROM c2 GROUP BY 1
      |), vocab AS (
      |  SELECT count(DISTINCT tok) AS v
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |        FROM split WHERE is_train)
      |), eb AS (
      |  SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS bg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t
      |        FROM split WHERE NOT is_train),
      |    unnest(range(1, len(t))) AS u(i)
      |)
      |SELECT doc_id, count(*) AS n_bigram,
      |  round(avg(-ln((coalesce(c12, 0) + 1.0) /
      |                (coalesce(ctx, 0) + v))), 6) AS avg_nll
      |FROM eb
      |LEFT JOIN c2 USING (bg)
      |LEFT JOIN ctx ON split_part(bg, ' ', 1) = w1
      |CROSS JOIN vocab
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Jelinek–Mercer interpolation weight on the bigram term (λ = 3/4;
    * the unigram floor gets 1−λ).
    */
  val JmLambda = 0.75

  /** Jelinek–Mercer interpolated bigram scoring (Jelinek & Mercer
    * 1980; Chen & Goodman 1999's simplest production smoothing):
    * per eval document, average NLL under
    *   P(w2|w1) = λ·c12/c1 + (1−λ)·(c(w2)+1)/(N+V)
    * — a linear blend of the bigram MLE and the Laplace-smoothed
    * unigram floor, so an unseen CONTEXT backs off gracefully instead
    * of flattening to 1/V the way [[lmBigram]]'s pure Laplace does.
    * Completes the smoothing family: Laplace ([[lmBigram]]),
    * interpolation (this), absolute discounting ([[lmKneserNey]]).
    *
    * λ = 0.75 is an exact binary double and every count ratio divides
    * identical integers, so both engines evaluate the same IEEE
    * expression per bigram (the [[lmBigram]] recipe, hash-proven).
    *
    * Scale shape: identical to [[lmBigram]] — scan-side bigram
    * generation, model tables vocabulary-sized, lookup a shuffle join
    * with nothing assumed broadcastable but the 1-row stats frame.
    */
  def lmInterp(spark: SparkSession, dir: String): DataFrame = {
    def bigrams(c: Column): Column = {
      val t = split(c, " ")
      when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", slice(t, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
    }
    val docs = documents(spark, dir)
    val trainBg = docs.filter(isTrain)
      .select(explode(bigrams(col("text"))).as("bg"))
    val c2 = trainBg.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val ctx = c2
      .select(substring_index(col("bg"), " ", 1).as("w1"), col("c12"))
      .groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val uni = docs.filter(isTrain)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val stats = uni.agg(sum(col("cu")).as("n"), count(lit(1)).as("v"))
    docs.filter(!isTrain)
      .select(col("doc_id"), explode(bigrams(col("text"))).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(c2, Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni.select(col("tok").as("w2"), col("cu")), Seq("w2"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("p",
        when(coalesce(col("c1"), lit(0L)) > 0,
          lit(JmLambda) * coalesce(col("c12"), lit(0L)).cast("double") /
            col("c1")).otherwise(lit(0.0)) +
        lit(1 - JmLambda) * (coalesce(col("cu"), lit(0L)) + lit(1.0)) /
          (col("n") + col("v")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigram"),
        round(avg(-log(col("p"))), 6).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  val lmInterpSql: String =
    s"""WITH split AS (
      |  SELECT doc_id, text,
      |    ${graft.operators.Scale.hashBucketSql("doc_id")} < 80 AS is_train
      |  FROM documents
      |), tb AS (
      |  SELECT array_to_string(list_slice(t, i, i + 1), ' ') AS bg
      |  FROM (SELECT string_split(text, ' ') AS t
      |        FROM split WHERE is_train),
      |    unnest(range(1, len(t))) AS u(i)
      |), c2 AS (
      |  SELECT bg, count(*) AS c12 FROM tb GROUP BY bg
      |), ctx AS (
      |  SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c12) AS BIGINT) AS c1
      |  FROM c2 GROUP BY 1
      |), uni AS (
      |  SELECT tok, count(*) AS cu
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |        FROM split WHERE is_train)
      |  GROUP BY tok
      |), stats AS (
      |  SELECT CAST(sum(cu) AS BIGINT) AS n, count(*) AS v FROM uni
      |), eb AS (
      |  SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS bg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t
      |        FROM split WHERE NOT is_train),
      |    unnest(range(1, len(t))) AS u(i)
      |)
      |SELECT doc_id, count(*) AS n_bigram,
      |  round(avg(-ln(
      |    (CASE WHEN coalesce(c1, 0) > 0
      |          THEN $JmLambda * CAST(coalesce(c12, 0) AS DOUBLE) / c1
      |          ELSE 0.0 END)
      |    + ${1 - JmLambda} * (coalesce(cu, 0) + 1.0) / (n + v))), 6)
      |    AS avg_nll
      |FROM eb
      |LEFT JOIN c2 USING (bg)
      |LEFT JOIN ctx ON split_part(bg, ' ', 1) = w1
      |LEFT JOIN uni ON split_part(bg, ' ', 2) = tok
      |CROSS JOIN stats
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Interpolated Kneser-Ney bigram model
  // ---------------------------------------------------------------

  /** KN discount in quarters (3 = the standard d = 0.75), bigrams kept
    * per language, and the minimum support below which the
    * highest-probability list would be hapax noise.
    */
  val KnDiscountQuarters = 3
  val KnTopK = 10
  val KnMinCount = 5L

  /** Interpolated Kneser-Ney bigram model (Kneser & Ney 1995; Chen &
    * Goodman 1999's benchmark smoothing for n-gram LMs) — per
    * language, the [[KnTopK]] highest-probability bigrams under
    *   P(w2|w1) = max(c12 − d, 0)/c1 + d·N1+(w1·)/c1 · N1+(·w2)/N1+(··)
    * with d = [[KnDiscountQuarters]]/4: absolute discounting plus the
    * continuation-probability backoff that makes KN the production
    * smoothing ("san Francisco" scores low as a continuation even
    * though "Francisco" is frequent, because it follows few contexts).
    *
    * Arithmetic: with d in quarters every term is an exact integer
    * rational — P = ((4·c12 − 3)·nbt + 3·n1p_w1·n1p_w2) / (4·c1·nbt) —
    * and the emitted micro-probability is one positive integer DIV
    * (trunc ≡ floor for positives, identical on both engines). No
    * float exists anywhere, so ranking cannot drift. The 1e6·num
    * intermediate stays inside BIGINT while c12·nbt < 9.2e12 (far
    * beyond these corpora; a 100 TB run switches the scoring
    * projection to the equivalent double form, ranking unchanged).
    *
    * Scale shape: every model table (c12/c1/N1+ margins/type totals)
    * derives from the ONE aggregated per-language bigram table —
    * vocabulary-sized by Heaps' law, the same discipline as PMI; the
    * corpus is scanned once, margins are sums over the aggregate, and
    * the final per-language top-k ranks a vocabulary-sized frame.
    */
  def lmKneserNey(spark: SparkSession, dir: String): DataFrame = {
    def bigrams(c: Column): Column = {
      val t = split(c, " ")
      when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", slice(t, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
    }
    val d = KnDiscountQuarters
    val c2 = documents(spark, dir)
      .select(col("lang"), explode(bigrams(col("text"))).as("bg"))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .localCheckpoint() // one bigram model table feeds all margins
    val left = c2.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_w1"))
    val right = c2.groupBy(col("lang"), col("w2"))
      .agg(count(lit(1)).as("n1p_w2"))
    val total = c2.groupBy(col("lang")).agg(count(lit(1)).as("nbt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("p_micro").desc, col("bg").asc)
    c2.join(left, Seq("lang", "w1"))
      .join(right, Seq("lang", "w2"))
      .join(broadcast(total), Seq("lang"))
      .filter(col("c12") >= KnMinCount)
      .withColumn("p_micro",
        expr(s"(1000000 * ((4 * c12 - $d) * nbt + $d * n1p_w1 * n1p_w2))" +
          s" DIV (4 * c1 * nbt)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= KnTopK)
      .select(col("lang"), col("rnk"), col("bg").as("bigram"),
        col("c12"), col("c1"), col("p_micro"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** DuckDB twin: same single bigram model table, margins, exact
    * rational micro-probability (`//` ≡ Spark DIV for positives).
    */
  val lmKneserNeySql: String = {
    val d = KnDiscountQuarters
    s"""WITH tb AS (
       |  SELECT lang, array_to_string(list_slice(t, i, i + 1), ' ') AS bg
       |  FROM (SELECT lang, string_split(text, ' ') AS t FROM documents),
       |    unnest(range(1, len(t))) AS u(i)
       |), c2 AS (
       |  SELECT lang, bg, split_part(bg, ' ', 1) AS w1,
       |    split_part(bg, ' ', 2) AS w2, count(*) AS c12
       |  FROM tb GROUP BY 1, 2, 3, 4
       |), lft AS (
       |  SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1,
       |    count(*) AS n1p_w1
       |  FROM c2 GROUP BY 1, 2
       |), rgt AS (
       |  SELECT lang, w2, count(*) AS n1p_w2 FROM c2 GROUP BY 1, 2
       |), tot AS (
       |  SELECT lang, count(*) AS nbt FROM c2 GROUP BY 1
       |), scored AS (
       |  SELECT c2.lang, c2.bg, c2.c12, lft.c1,
       |    (1000000 * ((4 * c2.c12 - $d) * tot.nbt
       |                + $d * lft.n1p_w1 * rgt.n1p_w2))
       |      // (4 * lft.c1 * tot.nbt) AS p_micro
       |  FROM c2
       |  JOIN lft ON lft.lang = c2.lang AND lft.w1 = c2.w1
       |  JOIN rgt ON rgt.lang = c2.lang AND rgt.w2 = c2.w2
       |  JOIN tot ON tot.lang = c2.lang
       |  WHERE c2.c12 >= $KnMinCount
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang
       |      ORDER BY p_micro DESC, bg ASC) AS rnk
       |  FROM scored
       |)
       |SELECT lang, rnk, bg AS bigram, c12, c1, p_micro
       |FROM ranked WHERE rnk <= $KnTopK
       |ORDER BY lang, rnk""".stripMargin
  }

  /** Curriculum stages over the difficulty distribution. */
  val CurriculumStages = 4

  /** Curriculum staging by LM difficulty (Bengio et al. 2009's
    * easy-first curriculum, operationalized the way data pipelines
    * ship it): eval-split documents are scored by [[lmPerplexity]]'s
    * per-doc avg NLL, the NLL axis is binned to deci-nats (a bounded
    * histogram — floor of the already-rounded score, identical on
    * both engines), and stage boundaries fall at equal CUMULATIVE
    * TOKEN quarters over the binned distribution — the histogram
    * quantile cut every at-scale system uses instead of a global sort
    * (a `ntile` over the corpus would funnel every row through one
    * task's sort; the histogram keeps all post-scan work bounded by
    * the bin domain). stage = (4·cum_tokens_before_bin) DIV total —
    * positive integers end to end.
    *
    * Scale shape: the expensive part IS [[lmPerplexity]] (one model
    * join); staging adds one bin aggregation + a window over the
    * bounded bin table.
    */
  def curriculumStages(spark: SparkSession, dir: String): DataFrame = {
    val base = lmPerplexity(spark, dir)
      .withColumn("bin", floor(col("avg_nll") * 10).cast("long"))
    val bins = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("total", sum(col("n_tokens")).over(Window.partitionBy()))
      .withColumn("stage", least(
        expr(s"($CurriculumStages * (cum - n_tokens)) DIV total"),
        lit((CurriculumStages - 1).toLong)))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_bins"), sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("bin")).as("bin_lo"), max(col("bin")).as("bin_hi"))
      .orderBy(col("stage"))
  }

  /** DuckDB twin: [[lmPerplexitySql]] embedded, same bins, same
    * cumulative-quarter staging.
    */
  lazy val curriculumStagesSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, n_tok, avg_nll,
       |    CAST(floor(avg_nll * 10) AS BIGINT) AS bin
       |  FROM ($lmPerplexitySql)
       |), bins AS (
       |  SELECT bin, count(*) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |  FROM base GROUP BY bin
       |), staged AS (
       |  SELECT *,
       |    least(($CurriculumStages *
       |        (CAST(sum(n_tokens) OVER (ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |              AS BIGINT)
       |         - n_tokens))
       |      // CAST(sum(n_tokens) OVER () AS BIGINT),
       |      CAST(${CurriculumStages - 1} AS BIGINT)) AS stage
       |  FROM bins
       |)
       |SELECT stage, count(*) AS n_bins,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(bin) AS bin_lo, max(bin) AS bin_hi
       |FROM staged
       |GROUP BY stage
       |ORDER BY stage""".stripMargin

  /** Collocation-mining knobs: minimum bigram support (PMI explodes on
    * hapax pairs) and collocations kept per language.
    */
  val PmiMinCount = 5L
  val PmiTopK = 5

  /** Collocation mining via pointwise mutual information over
    * consecutive-token bigrams (Church & Hanks 1990) — the corpus-
    * analysis pass that surfaces multiword units ("new york"-style
    * fixed phrases) for tokenizer vocab decisions and n-gram feature
    * selection. All probabilities come from ONE self-contained model
    * table: c12 is the bigram count, the margins ctx1/ctx2 are the
    * per-position sums of that same table, n_bg its per-language
    * total — so PMI = ln((c12/ctx1)·(n_bg/ctx2)) needs no second
    * corpus pass and no cross-table denominator mismatch.
    *
    * Scale shape: bigram generation is scan-side (the [[lmBigram]]
    * transform); everything after the first (lang, bigram) aggregation
    * is VOCABULARY-sized — Heaps-law sublinear in the corpus — and the
    * margins derive from the aggregated table, never a re-scan. The
    * PMI ratio is computed as two divisions (never c12·n_bg, which
    * overflows BIGINT at real corpus sizes); ordering uses the RAW
    * double with a bigram tie-break, rounding only in the projection.
    */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    def bigrams(c: Column): Column = {
      val t = split(c, " ")
      when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", slice(t, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
    }
    // the aggregated bigram model is consumed FOUR times (scores +
    // two margins + totals); materialize the vocabulary-sized frame
    // once instead of re-running the corpus explode per consumer
    val c2 = documents(spark, dir)
      .select(col("lang"), explode(bigrams(col("text"))).as("bg"))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val ctx1 = c2.groupBy(col("lang"),
        substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("ctx1"))
    val ctx2 = c2.groupBy(col("lang"),
        substring_index(col("bg"), " ", -1).as("w2"))
      .agg(sum(col("c12")).as("ctx2"))
    val nBg = c2.groupBy(col("lang")).agg(sum(col("c12")).as("n_bg"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("pmi_raw").desc, col("bg").asc)
    c2.filter(col("c12") >= PmiMinCount)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(ctx1, Seq("lang", "w1"))
      .join(ctx2, Seq("lang", "w2"))
      .join(broadcast(nBg), Seq("lang"))
      .withColumn("pmi_raw",
        log((col("c12").cast("double") / col("ctx1")) *
          (col("n_bg").cast("double") / col("ctx2"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= PmiTopK)
      .select(col("lang"), col("rnk"), col("w1"), col("w2"), col("c12"),
        round(col("pmi_raw"), 6).as("pmi"))
      .orderBy(col("lang"), col("rnk"))
  }

  val pmiCollocationsSql: String =
    s"""WITH tb AS (
      |  SELECT lang, array_to_string(list_slice(t, i, i + 1), ' ') AS bg
      |  FROM (SELECT lang, string_split(text, ' ') AS t FROM documents),
      |    unnest(range(1, len(t))) AS u(i)
      |), c2 AS (
      |  SELECT lang, bg, CAST(count(*) AS BIGINT) AS c12 FROM tb GROUP BY 1, 2
      |), ctx1 AS (
      |  SELECT lang, split_part(bg, ' ', 1) AS w1,
      |    CAST(sum(c12) AS BIGINT) AS ctx1
      |  FROM c2 GROUP BY 1, 2
      |), ctx2 AS (
      |  SELECT lang, split_part(bg, ' ', 2) AS w2,
      |    CAST(sum(c12) AS BIGINT) AS ctx2
      |  FROM c2 GROUP BY 1, 2
      |), nb AS (
      |  SELECT lang, CAST(sum(c12) AS BIGINT) AS n_bg FROM c2 GROUP BY 1
      |), scored AS (
      |  SELECT c2.lang, bg, split_part(bg, ' ', 1) AS w1,
      |    split_part(bg, ' ', 2) AS w2, c12,
      |    ln((CAST(c12 AS DOUBLE) / ctx1) * (CAST(n_bg AS DOUBLE) / ctx2))
      |      AS pmi_raw
      |  FROM c2
      |  JOIN ctx1 ON ctx1.lang = c2.lang AND ctx1.w1 = split_part(bg, ' ', 1)
      |  JOIN ctx2 ON ctx2.lang = c2.lang AND ctx2.w2 = split_part(bg, ' ', 2)
      |  JOIN nb ON nb.lang = c2.lang
      |  WHERE c12 >= $PmiMinCount
      |)
      |SELECT lang, rnk, w1, w2, c12, round(pmi_raw, 6) AS pmi
      |FROM (
      |  SELECT lang, w1, w2, c12, pmi_raw,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY pmi_raw DESC, bg ASC) AS rnk
      |  FROM scored
      |)
      |WHERE rnk <= $PmiTopK
      |ORDER BY lang, rnk""".stripMargin

  /** Per-source quota capping (domain caps): keep at most `cap` docs
    * per (lang, source), chosen deterministically by hash order (then
    * doc_id to break hash ties) — the corpus-mix control that stops a
    * crawl's giant domains from dominating a training set. One window
    * (rank within the partition key) over one shuffle; at 100 TB the
    * heavy groups are exactly what the cap trims, and the hash order
    * makes the kept subset stable under re-partitioning and re-runs.
    * Emitted as a per-group rollup (kept/dropped) so the gate result
    * stays small while the row_number path is fully exercised.
    */
  /** Per-(lang, source) quota cap — ONE constant shared by
    * sourceQuota, corpusCuration, their oracles and their specs, so
    * the funnel cannot silently diverge from the standalone operator.
    */
  val QuotaCap = 40

  /** Salted quota-ordering key, hashBucket("quota:" + doc_id) — ONE
    * definition for the Spark and SQL twins. Salted for the same
    * reason as the sampling key: the raw-doc_id buckets already
    * assign train/valid/test, and ordering the quota by them would
    * keep ONLY low-bucket (all-train) docs once a source exceeds the
    * cap, emptying valid/test downstream of the curation.
    */
  private def quotaOrder: Column =
    graft.operators.Scale.hashBucket(
      concat(lit("quota:"), col("doc_id").cast("string")))

  private val quotaOrderSql: String =
    graft.operators.Scale.hashBucketSql("'quota:' || CAST(doc_id AS VARCHAR)")

  /** Round 10: the per-(lang, source) rank rides
    * [[graft.operators.Scale.distributedGroupedRowNumber]] — the
    * quota window ran over the RAW document rows partitioned by a
    * fixed ~|langs|·|sources| domain, i.e. corpus/|domain| rows
    * sorted per task (the winsorize class of ceiling). The quota
    * basis is the 100-value salted hash bucket, maximally tied — the
    * grouped operator's hot-value key-quantile split is what keeps
    * its shards balanced. Window oracle unchanged as the gate.
    */
  def sourceQuota(spark: SparkSession, dir: String,
                  cap: Int = QuotaCap): DataFrame = {
    graft.operators.Scale.distributedGroupedRowNumber(
      documents(spark, dir),
      // NUL-joined composite group key: a separator no lang/source
      // value can contain, so distinct (lang, source) pairs never
      // merge into one rank group. Each side is null-TAGGED before
      // joining (round-11 advice): concat_ws silently SKIPS null
      // elements, so (null, "x") and ("x", null) would both have
      // encoded to "x" and merged -- and collided with non-null
      // pairs -- where the window oracle keeps null partitions
      // distinct. Tagging ("v" + value, null -> "n") is injective:
      // every non-null encoding starts with "v", so "n" cannot
      // collide with one.
      concat_ws("\u0000",
        coalesce(concat(lit("v"), col("lang")), lit("n")),
        coalesce(concat(lit("v"), col("source")), lit("n"))),
      quotaOrder, col("doc_id"), "rn")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= cap, 1L).otherwise(0L)).as("n_kept"),
        min(when(col("rn") <= cap, col("doc_id"))).as("first_kept_doc"),
        max(when(col("rn") <= cap, col("doc_id"))).as("last_kept_doc"))
      .orderBy(col("lang"), col("source"))
  }

  val sourceQuotaSql: String =
    s"""WITH ranked AS (
      |  SELECT lang, source, doc_id,
      |    row_number() OVER (
      |      PARTITION BY lang, source
      |      ORDER BY $quotaOrderSql, doc_id
      |    ) AS rn
      |  FROM documents
      |)
      |SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN rn <= $QuotaCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  min(CASE WHEN rn <= $QuotaCap THEN doc_id END) AS first_kept_doc,
      |  max(CASE WHEN rn <= $QuotaCap THEN doc_id END) AS last_kept_doc
      |FROM ranked
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------
  // L1+: chunk-level exact dedup (substring dedup) and deterministic
  // weighted sampling
  // ---------------------------------------------------------------

  /** Chunk width (tokens) of the substring-dedup pass. */
  val ChunkW = 8

  /** Exact SUBSTRING-level dedup: split each doc into non-overlapping
    * [[ChunkW]]-token chunks (full chunks only), hash each chunk, and
    * count how many of a doc's chunks also occur anywhere else in the
    * corpus — the boilerplate/template-contamination signal that
    * document-level exact dedup misses. Shapes: one explode, one
    * count aggregation on the 32-byte chunk hash, one join back, one
    * per-doc aggregation — every shuffle key is a hash, never text.
    * Docs shorter than one full chunk carry no chunks and are absent,
    * like the other gram-based operators.
    */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nFull = floor(size(toks) / ChunkW).cast("int")
    val chunkArr = when(size(toks) >= ChunkW,
      transform(sequence(lit(0), nFull - 1),
        c => md5(concat_ws(" ", slice(toks, c * ChunkW + 1, lit(ChunkW))))))
      .otherwise(array().cast("array<string>"))
    val chunks = documents(spark, dir)
      .select(col("doc_id"), explode(chunkArr).as("chunk"))
    // cross-document occurrence: a chunk repeated only WITHIN one doc
    // is self-repetition (docRepetition's signal), not boilerplate —
    // count distinct docs per chunk, not occurrences
    val freq = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("n_docs_with"))
    chunks.join(freq, Seq("chunk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs_with") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ratio",
        round(col("n_dup").cast("double") / col("n_chunks"), 6))
      .orderBy(col("doc_id"))
  }

  val chunkDedupSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |ch AS (
      |  SELECT doc_id,
      |    unnest([md5(array_to_string(toks[(c*8+1):(c*8+8)], ' '))
      |            FOR c IN range(0, CAST(floor(len(toks) / 8) AS BIGINT))]) AS chunk
      |  FROM t WHERE len(toks) >= 8
      |), freq AS (SELECT chunk, count(DISTINCT doc_id) AS n_docs_with
      |            FROM ch GROUP BY chunk)
      |SELECT doc_id, count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  round(CAST(sum(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |          / count(*), 6) AS dup_ratio
      |FROM ch JOIN freq USING (chunk)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Deterministic quality-weighted downsampling: each doc keeps with
    * probability n_tok% (capped at 95) — longer docs are likelier to
    * survive — decided by the same engine-portable md5 bucket rule as
    * the train/valid/test split but on a SALTED key ("sample:" +
    * doc_id): the raw-doc_id buckets already assign train/valid/test,
    * and an unsalted reuse would correlate the keep decision with
    * split membership (short docs would vanish from valid/test
    * entirely). Reproducible on any engine at any cluster size — no
    * RNG, no seed plumbing, no coordination. Output audits the
    * sampling per
    * (lang, source): docs in/kept and the kept token mass, all exact
    * integers — no float aggregate to drift at scale.
    */
  /** The salted keep rule over columns (doc_id, n_tok) — ONE
    * definition for the Spark and SQL twins, shared by weightedSample
    * and corpusCuration's sampling stage.
    */
  private def sampleKeep: Column =
    graft.operators.Scale.hashBucket(
      concat(lit("sample:"), col("doc_id").cast("string"))) <
      least(col("n_tok"), lit(95))

  private val sampleKeepSql: String =
    s"${graft.operators.Scale.hashBucketSql("'sample:' || CAST(doc_id AS VARCHAR)")}" +
      " < least(n_tok, 95)"

  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(split(col("text"), " "))
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), nTok.as("n_tok"))
      .withColumn("keep", sampleKeep)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_tok").cast("long"))
          .otherwise(0L)).as("kept_tok_sum"))
      .orderBy(col("lang"), col("source"))
  }

  val weightedSampleSql: String =
    s"""WITH d0 AS (
      |  SELECT doc_id, lang, source,
      |    len(string_split(text, ' ')) AS n_tok
      |  FROM documents
      |), d AS (
      |  SELECT lang, source, n_tok, $sampleKeepSql AS keep FROM d0
      |)
      |SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tok_sum
      |FROM d
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** End-to-end corpus curation in ONE declarative DAG — the composite
    * funnel a training-data pipeline actually runs, with a per-stage
    * audit: quality gate (length + distinct-token ratio) → exact dedup
    * among the passers (survivor = min doc_id per normalized-text
    * hash) → per-source quota (the hash-ordered cap of sourceQuota) →
    * deterministic weighted sample (weightedSample's salted rule).
    * Stages are FLAGS over one scan (two window shuffles + one
    * aggregation), never materialized intermediates — Catalyst
    * pipelines the whole funnel and at 100 TB no stage rewrites the
    * corpus. The audit row per (lang, source) is the monotone funnel
    * n_raw ≥ n_quality ≥ n_unique ≥ n_quota ≥ n_sampled.
    */
  def corpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val base = documents(spark, dir).select(
      col("doc_id"), col("lang"), col("source"),
      md5(lower(trim(col("text")))).as("h"),
      size(toks).as("n_tok"),
      (size(array_distinct(toks)).cast("double") / size(toks))
        .as("uniq_ratio"))
    val q = base.withColumn("q_pass",
      col("n_tok") >= 10 && col("uniq_ratio") > 0.3)
    // partitioning each window by the upstream flag keeps rejected
    // docs from consuming dedup/quota ranks without a second pass
    val dedup = q.withColumn("dup_rk", row_number().over(
      Window.partitionBy(col("h"), col("q_pass")).orderBy(col("doc_id"))))
      .withColumn("uniq", col("q_pass") && col("dup_rk") === 1)
    val quota = dedup.withColumn("quota_rk", row_number().over(
      Window.partitionBy(col("lang"), col("source"), col("uniq"))
        .orderBy(quotaOrder, col("doc_id"))))
      .withColumn("quota_keep", col("uniq") && col("quota_rk") <= QuotaCap)
    val sampled = quota.withColumn("kept", col("quota_keep") && sampleKeep)
    sampled.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("q_pass"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("uniq"), 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("quota_keep"), 1L).otherwise(0L)).as("n_quota"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_sampled"))
      .orderBy(col("lang"), col("source"))
  }

  val corpusCurationSql: String =
    s"""WITH base AS (
      |  SELECT doc_id, lang, source,
      |    md5(lower(trim(text))) AS h,
      |    len(string_split(text, ' ')) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS uniq_ratio
      |  FROM documents
      |), q AS (
      |  SELECT *, n_tok >= 10 AND uniq_ratio > 0.3 AS q_pass FROM base
      |), dedup AS (
      |  SELECT *, q_pass AND row_number() OVER (
      |      PARTITION BY h, q_pass ORDER BY doc_id) = 1 AS uniq
      |  FROM q
      |), quota AS (
      |  SELECT *, uniq AND row_number() OVER (
      |      PARTITION BY lang, source, uniq
      |      ORDER BY $quotaOrderSql, doc_id
      |    ) <= $QuotaCap AS quota_keep
      |  FROM dedup
      |), sampled AS (
      |  SELECT *, quota_keep AND $sampleKeepSql AS kept
      |  FROM quota
      |)
      |SELECT lang, source, count(*) AS n_raw,
      |  CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      |  CAST(sum(CASE WHEN uniq THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |  CAST(sum(CASE WHEN quota_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quota,
      |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM sampled
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** Vocabulary coverage / OOV audit: build the global top-V token
    * vocabulary (count-desc, token-asc tie-break — deterministic on
    * any engine) and report per-language token totals and
    * out-of-vocabulary counts. The vocab is selected with
    * orderBy+limit — a distributed TakeOrdered, never a
    * single-partition window — so at 100 TB the top-V over millions
    * of distinct tokens is a per-partition top-V + k-row merge, and
    * the vocab side of the coverage join broadcasts. Output is all
    * exact integers.
    */
  def vocabOov(spark: SparkSession, dir: String, v: Int = 16): DataFrame = {
    val toks = documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(v)
      .select(col("tok"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .orderBy(col("lang"))
  }

  val vocabOovSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), vocab AS (
      |  SELECT tok FROM (
      |    SELECT tok, count(*) AS c FROM toks GROUP BY tok
      |    ORDER BY c DESC, tok ASC LIMIT 16)
      |)
      |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tok,
      |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |FROM toks t LEFT JOIN vocab v USING (tok)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // Positional inverted index + phrase search
  // ---------------------------------------------------------------

  /** How many top bigram phrases the phrase-search query probes. */
  val PhraseTopK = 3

  /** Phrase search through a positional inverted index — the
    * elastic-style "exact phrase over a corpus" primitive. Stage 1
    * builds the positional postings (token, doc_id, pos) — the index a
    * serving stack would persist bucketed BY TOKEN, so a phrase probe
    * reads only the query words' posting lists. Stage 2 derives the
    * query set from the corpus itself (the [[PhraseTopK]] most
    * frequent word bigrams, count-desc / lexicographic tie-break) so
    * the query is deterministic at every scale. Stage 3 is the
    * probe: postings of word1 equi-joined to postings of word2 on
    * (doc_id, pos+1) — adjacency IS the join predicate — aggregated to
    * per-doc occurrence counts and first positions.
    *
    * Scale shape: one explode pass builds the index (shuffle on
    * token); bigram stats are map-side scan expressions (no self-join
    * — consecutive pairs come from one slice/zip per document); the
    * probe touches only the broadcast query words' lists. Nothing is
    * ever pairwise in the corpus.
    */
  def phraseSearch(spark: SparkSession, dir: String,
                   topK: Int = PhraseTopK): DataFrame = {
    val docs = documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
    // positional postings: the inverted index
    val postings = docs
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("tok"))
    // top-K bigrams, derived scan-side (zip of consecutive tokens)
    val phrases = docs
      .select(explode(arrays_zip(
        slice(col("ts"), lit(1), size(col("ts")) - 1).as("w1"),
        slice(col("ts"), lit(2), size(col("ts")) - 1).as("w2"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"))
    // probe: w1 postings ⋈ w2 postings on (doc_id, pos+1). BOTH legs
    // are broadcast-semi-filtered to the query tokens FIRST, so the
    // adjacency join's inputs are query-term posting lists — never the
    // corpus-sized postings table. The shuffle_hash hint pins the
    // adjacency join to a shuffled join: a frequent query token's
    // posting list is O(corpus fraction), so broadcasting either leg
    // would re-introduce the corpus-sized-broadcast hazard AQE might
    // otherwise pick at small SF.
    val a = postings.select(col("doc_id"), col("pos"), col("tok").as("w1"))
      .join(broadcast(phrases), "w1")
    val b = postings.select(col("doc_id").as("doc_id2"),
      col("pos").as("pos2"), col("tok").as("tok2"))
      .join(broadcast(phrases.select(col("w2").as("tok2")).distinct()),
        "tok2")
    a.join(b.hint("shuffle_hash"), col("doc_id2") === col("doc_id") &&
        col("pos2") === col("pos") + 1 && col("tok2") === col("w2"))
      .groupBy(concat(col("w1"), lit(" "), col("w2")).as("phrase"),
        col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
      .orderBy(col("phrase"), col("doc_id"))
  }

  /** DuckDB twin: same postings enumeration, same top-K bigram cut,
    * same adjacency join.
    */
  val phraseSearchSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
       |), toks AS (
       |  SELECT doc_id, pos, ts[pos] AS tok FROM (
       |    SELECT doc_id, ts,
       |      unnest(range(1, len(ts) + 1)) AS pos
       |    FROM d)
       |), phrases AS (
       |  SELECT w1, w2 FROM (
       |    SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*) AS cnt FROM (
       |      SELECT ts, unnest(range(1, len(ts))) AS i FROM d)
       |    GROUP BY 1, 2
       |    ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT $PhraseTopK)
       |)
       |SELECT p.w1 || ' ' || p.w2 AS phrase, a.doc_id AS doc_id,
       |  count(*) AS n_occ, min(a.pos) AS first_pos
       |FROM phrases p
       |JOIN toks a ON a.tok = p.w1
       |JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |           AND b.tok = p.w2
       |GROUP BY 1, 2
       |ORDER BY phrase, doc_id""".stripMargin

  // ---------------------------------------------------------------
  // TextRank keyword extraction (PageRank on the word graph)
  // ---------------------------------------------------------------

  /** Words returned per language by [[textrank]], iteration count and
    * the rank fixed-point scale (same constants discipline as the
    * co-purchase PageRank family).
    */
  val TextrankTopK = 10
  val TextrankIters = 3
  val TextrankScale = 1000000000000L

  /** Portable 48-bit vertex id for a (lang, word) node: first 12
    * md5-hex chars — the engine-neutral hash family every
    * MinHash/bucket operator here uses, wide enough that a vocabulary
    * would need ~2²⁴ types for collisions to be likely (the spec
    * asserts injectivity on the fixtures at every SF).
    */
  private def wordVid(lang: Column, w: Column): Column =
    conv(substring(md5(concat_ws("|", lang, w)), 1, 12), 16, 10).cast("long")

  private def wordVidSql(lang: String, w: String): String =
    s"CAST(('0x' || substr(md5($lang || '|' || $w), 1, 12)) AS BIGINT)"

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    * over the word ADJACENCY graph — vertices are (lang, word),
    * undirected edges connect tokens that appear adjacent in any
    * document — then the top-[[TextrankTopK]] words per language by
    * rank. The graph-centrality complement of [[rakeKeywords]]'
    * degree/frequency heuristic: a word scores high when its
    * NEIGHBORS score high, not merely when it is frequent.
    *
    * Runs on [[graft.operators.Graph.pagerank]] — the co-partitioned
    * exact-integer RDD loop — so ranks are deterministic BIGINTs and
    * the oracle replays the identical recurrence over the identical
    * md5-derived vertex ids. Scale shape: adjacency pairs are
    * generated scan-side (one guarded transform per doc), the graph
    * is vocabulary²-bounded but Zipf-sparse (distinct ADJACENT pairs),
    * and everything after the one distinct-pairs shuffle runs on
    * vocabulary-sized frames.
    */
  def textrank(spark: SparkSession, dir: String,
               k: Int = TextrankTopK): DataFrame = {
    val t = split(col("text"), " ")
    val pairsExpr = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"),
          element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    // OPTIMIZATION r14 (guide §2.4): canonicalize the pair BEFORE the
    // one distinct — least/greatest collapses "a b" and "b a" into a
    // single undirected edge, so the symmetrizing union below needs NO
    // second distinct (canonical pairs are unique ⇒ their two oriented
    // copies are too; w1 ≠ w2 is already enforced). Same directed edge
    // set as before — one fewer full exchange of the edge list.
    val adj = documents(spark, dir)
      .select(col("lang"), explode(pairsExpr).as("p"))
      .select(col("lang"), col("p.w1").as("wa"), col("p.w2").as("wb"))
      .filter(col("wa") =!= col("wb"))
      .select(col("lang"), least(col("wa"), col("wb")).as("w1"),
        greatest(col("wa"), col("wb")).as("w2"))
      .distinct()
      .localCheckpoint() // feeds the edge build AND the vocab map-back
    val edges = adj.select(wordVid(col("lang"), col("w1")).as("src"),
        wordVid(col("lang"), col("w2")).as("dst"))
      .union(adj.select(wordVid(col("lang"), col("w2")).as("src"),
        wordVid(col("lang"), col("w1")).as("dst")))
    val pr = graft.operators.Graph.pagerank(edges,
      iters = TextrankIters, scale = TextrankScale)
    val vocab = adj.select(col("lang"), col("w1").as("word"))
      .union(adj.select(col("lang"), col("w2").as("word")))
      .distinct()
      .withColumn("v", wordVid(col("lang"), col("word")))
    vocab.join(pr, Seq("v"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("r").desc, col("word").asc)))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("word"), col("r").as("tr"))
      .orderBy(col("lang"), col("rnk"))
  }

  val textrankSql: String = {
    val iter = (prev: String, cur: String) =>
      s"""$cur AS (
        |  SELECT d.v, ($TextrankScale * 15) // (100 * nn.n) +
        |    (85 * coalesce(c.contrib, 0)) // 100 AS r, d.d
        |  FROM deg d
        |  LEFT JOIN (
        |    SELECT e.dst AS v, CAST(sum(r.r // r.d) AS BIGINT) AS contrib
        |    FROM edges e JOIN $prev r ON e.src = r.v
        |    GROUP BY e.dst) c ON d.v = c.v
        |  CROSS JOIN nn
        |)""".stripMargin
    val iters = (1 to TextrankIters)
      .map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH adj AS (
      |  SELECT DISTINCT lang, t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT lang, string_split(text, ' ') AS t FROM documents),
      |    unnest(range(1, len(t))) AS u(i)
      |  WHERE t[i] <> t[i + 1]
      |), edges AS (
      |  SELECT ${wordVidSql("lang", "w1")} AS src,
      |         ${wordVidSql("lang", "w2")} AS dst
      |  FROM adj
      |  UNION
      |  SELECT ${wordVidSql("lang", "w2")},
      |         ${wordVidSql("lang", "w1")}
      |  FROM adj
      |), deg AS (
      |  SELECT src AS v, count(*) AS d FROM edges GROUP BY 1
      |), nn AS (
      |  SELECT count(*) AS n FROM deg
      |), r0 AS (
      |  SELECT v, $TextrankScale // nn.n AS r, d FROM deg CROSS JOIN nn
      |),
      |$iters, vocab AS (
      |  SELECT DISTINCT lang, word, ${wordVidSql("lang", "word")} AS v
      |  FROM (SELECT lang, w1 AS word FROM adj
      |        UNION ALL SELECT lang, w2 FROM adj)
      |), ranked AS (
      |  SELECT lang, word, CAST(r AS BIGINT) AS tr,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY r DESC, word ASC) AS rnk
      |  FROM vocab JOIN r$TextrankIters USING (v)
      |)
      |SELECT lang, rnk, word, tr
      |FROM ranked WHERE rnk <= $TextrankTopK
      |ORDER BY lang, rnk""".stripMargin
  }

  // ---------------------------------------------------------------
  // RAKE keyword extraction
  // ---------------------------------------------------------------

  /** Phrases returned per language by [[rakeKeywords]]. */
  val RakeTopK = 10

  /** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010,
    * "Automatic keyword extraction from individual documents", in Text
    * Mining: Applications and Theory): candidate phrases are the
    * maximal stopword-free token runs; each word scores
    * degree/frequency (degree = Σ length of phrases containing it);
    * a phrase scores the sum of its words' scores. Scores are kept in
    * exact integer millis ((1000·degree) DIV freq) so the ranking — and
    * therefore the top-k — is engine-portable with no float-sum order
    * sensitivity. No phrase-length cap (the classic formulation);
    * phrase count is bounded by stopword occurrences, so the explode
    * stays linear in the corpus.
    *
    * Scale shape: run-splitting is pure scan-side array work (stopwords
    * are a tiny plan-time literal); the only shuffles aggregate
    * vocabulary- and phrase-vocabulary-sized frames, and the final
    * top-k per language is one bounded window.
    */
  def rakeKeywords(spark: SparkSession, dir: String,
                   k: Int = RakeTopK): DataFrame = {
    val mapped = transform(split(col("text"), " "),
      t => when(stopwords.map(t === _).reduce(_ || _), lit("|"))
        .otherwise(t))
    val phrases = documents(spark, dir)
      .select(col("lang"),
        explode(filter(
          transform(split(array_join(mapped, " "), "\\|"), s => trim(s)),
          s => s =!= "")).as("phrase"))
    val pf = phrases.groupBy(col("lang"), col("phrase"))
      .agg(count(lit(1)).as("p_freq"))
    val words = phrases
      .select(col("lang"), split(col("phrase"), " ").as("ws"))
      .select(col("lang"), size(col("ws")).cast("long").as("plen"),
        explode(col("ws")).as("w"))
    val wsc = words.groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .withColumn("score_milli", expr("(1000 * degree) DIV freq"))
      .select(col("lang"), col("w"), col("score_milli"))
    val pw = pf.select(col("lang"), col("phrase"), col("p_freq"),
      explode(split(col("phrase"), " ")).as("w"))
    val byLang = Window.partitionBy(col("lang")).orderBy(
      col("score_milli").desc, col("p_freq").desc, col("phrase").asc)
    pw.join(wsc, Seq("lang", "w"))
      .groupBy(col("lang"), col("phrase"), col("p_freq"))
      .agg(sum(col("score_milli")).as("score_milli"))
      .withColumn("rnk", row_number().over(byLang))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("phrase"),
        col("score_milli"), col("p_freq"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** DuckDB twin: same run splitting, same integer-milli scoring. */
  val rakeKeywordsSql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH ph AS MATERIALIZED (
       |  SELECT lang, trim(p) AS phrase FROM (
       |    SELECT lang,
       |      unnest(string_split(array_to_string(
       |        list_transform(string_split(text, ' '),
       |          t -> CASE WHEN t IN ($stopList) THEN '|' ELSE t END),
       |        ' '), '|')) AS p
       |    FROM documents)
       |  WHERE trim(p) <> ''
       |), pf AS (
       |  SELECT lang, phrase, count(*) AS p_freq FROM ph GROUP BY 1, 2
       |), wsc AS (
       |  SELECT lang, w, (1000 * degree) // freq AS score_milli FROM (
       |    SELECT lang, w, count(*) AS freq,
       |      CAST(sum(plen) AS BIGINT) AS degree
       |    FROM (
       |      SELECT lang, CAST(len(string_split(phrase, ' ')) AS BIGINT)
       |          AS plen,
       |        unnest(string_split(phrase, ' ')) AS w
       |      FROM ph)
       |    GROUP BY 1, 2)
       |), scored AS (
       |  SELECT p.lang, p.phrase, p.p_freq,
       |    CAST(sum(s.score_milli) AS BIGINT) AS score_milli
       |  FROM (SELECT lang, phrase, p_freq,
       |          unnest(string_split(phrase, ' ')) AS w FROM pf) p
       |  JOIN wsc s ON s.lang = p.lang AND s.w = p.w
       |  GROUP BY 1, 2, 3
       |), ranked AS (
       |  SELECT lang, phrase, p_freq, score_milli,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY score_milli DESC, p_freq DESC, phrase ASC) AS rnk
       |  FROM scored
       |)
       |SELECT lang, rnk, phrase, score_milli, p_freq
       |FROM ranked WHERE rnk <= $RakeTopK
       |ORDER BY lang, rnk""".stripMargin
  }

  // ---------------------------------------------------------------
  // DSIR data selection (Xie et al. 2023)
  // ---------------------------------------------------------------

  /** Hashed-feature buckets, candidates returned, and the target
    * predicate's language for [[dsirSelect]] — interpolated into both
    * sides of the oracle.
    */
  val DsirBuckets = 64
  val DsirTopK = 20
  val DsirTargetLang = "en"

  /** DSIR data selection (Xie, Santurkar, Ma & Liang 2023, "Data
    * selection for language models via importance resampling",
    * NeurIPS): rank raw-pool documents by how target-like their
    * hashed-unigram distribution is. Features are md5 buckets
    * ([[graft.operators.Scale.hashBucket]], the engine-portable hash
    * every sampler here shares); bucket probabilities are
    * Laplace-smoothed counts under the target (lang =
    * [[DsirTargetLang]]) vs the full corpus; a document's importance
    * weight is the standard log-likelihood ratio
    * log w(x) = Σ_b n_b(x)·(log p_tgt[b] − log p_src[b]).
    *
    * Arithmetic discipline: the per-bucket log-ratio is floored to
    * exact integer MICRO-NATS once (64 values — a ±1-ulp ln
    * difference between engines moves a floor only if the value sits
    * within an ulp of a millionth boundary), and every doc weight is
    * then an exact integer dot product of bucket counts with that
    * table — no float sum whose partial-aggregation order could
    * drift, the same fixed-point recipe as PageRank/EMA.
    *
    * Scale shape: one explode pass aggregates to (doc, bucket)
    * counts (≤ [[DsirBuckets]] rows per doc); the ratio table is a
    * [[DsirBuckets]]-row broadcast; selection is a distributed
    * TakeOrdered of k rows. Nothing is pairwise and the only
    * corpus-sized shuffles group on doc_id.
    */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val B = DsirBuckets
    val toks = documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("lang"), col("source"),
        graft.operators.Scale.hashBucket(col("tok"), B).as("b"))
    val srcCnt = toks.groupBy(col("b")).agg(count(lit(1)).as("c_src"))
    val tgtCnt = toks.filter(col("lang") === DsirTargetLang)
      .groupBy(col("b")).agg(count(lit(1)).as("c_tgt"))
    // dense 64-row bucket table (empty buckets keep their smoothing
    // mass) + totals, all tiny broadcast frames
    val totals = toks.agg(count(lit(1)).as("n_src"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("n_tgt"))
    val lr = spark.range(B).select(col("id").as("b"))
      .join(srcCnt, Seq("b"), "left")
      .join(tgtCnt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor(lit(1e6) *
          (log((coalesce(col("c_tgt"), lit(0L)) + 1).cast("double") /
               (col("n_tgt") + B).cast("double")) -
           log((coalesce(col("c_src"), lit(0L)) + 1).cast("double") /
               (col("n_src") + B).cast("double"))))
          .cast("long").as("lr_micro"))
    val docB = toks.filter(col("lang") =!= DsirTargetLang)
      .groupBy(col("doc_id"), col("lang"), col("source"), col("b"))
      .agg(count(lit(1)).as("n"))
    docB.join(broadcast(lr), "b")
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(sum(col("n") * col("lr_micro")).as("logw_micro"),
        sum(col("n")).as("n_tok"))
      .orderBy(col("logw_micro").desc, col("doc_id").asc)
      .limit(DsirTopK)
      .withColumn("rnk", row_number().over(Window.orderBy(
        col("logw_micro").desc, col("doc_id").asc)))
      .select(col("rnk"), col("doc_id"), col("lang"), col("source"),
        col("logw_micro"), col("n_tok"))
      .orderBy(col("rnk"))
  }

  /** DuckDB twin: identical md5 buckets, micro-nat floor, integer
    * dot, top-k cut.
    */
  val dsirSelectSql: String = {
    val bucket = graft.operators.Scale.hashBucketSql("tok", DsirBuckets)
    s"""WITH toks AS (
       |  SELECT doc_id, lang, source, $bucket AS b
       |  FROM (SELECT doc_id, lang, source,
       |          unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |), tot AS (
       |  SELECT count(*) AS n_src,
       |    sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS n_tgt
       |  FROM toks
       |), lr AS (
       |  SELECT g.b,
       |    CAST(floor(1e6 * (
       |      ln(CAST(COALESCE(t.c_tgt, 0) + 1 AS DOUBLE)
       |         / (tot.n_tgt + $DsirBuckets))
       |      - ln(CAST(COALESCE(s.c_src, 0) + 1 AS DOUBLE)
       |           / (tot.n_src + $DsirBuckets)))) AS BIGINT) AS lr_micro
       |  FROM (SELECT unnest(range(0, $DsirBuckets)) AS b) g
       |  LEFT JOIN (SELECT b, count(*) AS c_src FROM toks GROUP BY b) s
       |    ON s.b = g.b
       |  LEFT JOIN (SELECT b, count(*) AS c_tgt FROM toks
       |             WHERE lang = '$DsirTargetLang' GROUP BY b) t
       |    ON t.b = g.b
       |  CROSS JOIN tot
       |), doc AS (
       |  SELECT doc_id, lang, source,
       |    CAST(sum(n * lr_micro) AS BIGINT) AS logw_micro,
       |    CAST(sum(n) AS BIGINT) AS n_tok
       |  FROM (
       |    SELECT doc_id, lang, source, b, count(*) AS n FROM toks
       |    WHERE lang <> '$DsirTargetLang'
       |    GROUP BY 1, 2, 3, 4) db
       |  JOIN lr USING (b)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT row_number() OVER (ORDER BY logw_micro DESC, doc_id ASC) AS rnk,
       |  doc_id, lang, source, logw_micro, n_tok
       |FROM doc
       |ORDER BY logw_micro DESC, doc_id ASC
       |LIMIT $DsirTopK""".stripMargin
  }

  /** Documents selected by [[setCoverSelect]] and its shingle width. */
  val SetCoverK = 10
  val SetCoverN = 3

  /** Greedy maximum-coverage data selection (the classic (1−1/e)
    * submodular greedy): pick [[SetCoverK]] documents, each round
    * taking the document covering the most NOT-yet-covered 3-gram
    * shingles — facility-location-style subset selection, the
    * coverage-driven complement of score-based picks like DSIR (a
    * coverage pick never spends budget on a near-duplicate of an
    * already-chosen doc, which is why curation stacks run both).
    * Ties break on the lowest doc_id; emits each round's pick, its
    * marginal gain, and cumulative corpus-gram coverage in ppm.
    *
    * Scale shape: the covered-gram set is a DISTRIBUTED frame, never
    * driver state — each round is one anti-join of the (doc, gram)
    * incidence against it plus a TakeOrdered(1) argmax; K rounds ⇒ K
    * bounded shuffles. The only collect is the 1-row argmax (a query
    * anchor). The gram definition is the ONE [[gramArray]] rule the
    * dedup/contamination family shares.
    */
  def setCoverSelect(spark: SparkSession, dir: String): DataFrame = {
    val items = docGrams(spark, dir, SetCoverN).localCheckpoint()
    val totGrams = items.select(col("gram")).distinct().count()
    // OPTIMIZATION r14 (guide §2.4/§3.1): the covered-gram set is
    // bounded by K · (grams per picked doc) — CORPUS-INDEPENDENT (K
    // picks of bounded-length documents), so it is driver/broadcast
    // material, not a distributed frame. The old shape paid, per
    // greedy round, a distributed anti-join against the accumulated
    // `covered` frame PLUS a union+distinct shuffle PLUS an eager
    // localCheckpoint materialization; this shape pays one
    // InSet-filtered aggregation (the round's only shuffle) and one
    // narrow collect of the picked doc's grams. Result is identical
    // by construction: same covered-set semantics, same
    // (gain desc, doc_id asc) argmax — the oracle SQL is unchanged.
    val covered = scala.collection.mutable.HashSet.empty[String]
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var cum = 0L
    for (r <- 1 to SetCoverK) {
      val uncovered =
        if (covered.isEmpty) items
        else items.filter(!col("gram").isInCollection(covered.toSet))
      val best = uncovered
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val (docId, gain) = (best(0).getLong(0), best(0).getLong(1))
        cum += gain
        picks += ((r, docId, gain, cum))
        covered ++= items.filter(col("doc_id") === docId)
          .select(col("gram")).collect().map(_.getString(0))
      }
    }
    import spark.implicits._
    picks.toSeq.toDF("rnk", "doc_id", "gain", "cum_grams")
      .withColumn("coverage_ppm",
        expr(s"(cum_grams * 1000000L) DIV ${totGrams}L"))
      .orderBy(col("rnk"))
  }

  val setCoverSelectSql: String = {
    val gramCte =
      """items AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(list_slice(t, i, i + 2), ' ')) AS gram
        |  FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents))
        |)""".stripMargin
    val rounds = (1 to SetCoverK).map { r =>
      val prevCov = if (r == 1) "" else
        s"  WHERE NOT EXISTS (SELECT 1 FROM c${r - 1} WHERE c${r - 1}.gram = i.gram)\n"
      val covBody = if (r == 1)
        s"SELECT gram FROM items WHERE doc_id = (SELECT doc_id FROM b$r)"
      else
        s"""SELECT gram FROM c${r - 1}
           |  UNION
           |  SELECT gram FROM items WHERE doc_id = (SELECT doc_id FROM b$r)""".stripMargin
      s"""b$r AS MATERIALIZED (
        |  SELECT i.doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM items i
        |$prevCov  GROUP BY 1 ORDER BY gain DESC, doc_id ASC LIMIT 1
        |), c$r AS MATERIALIZED (
        |  $covBody
        |)""".stripMargin
    }.mkString(",\n")
    val finalRows = (1 to SetCoverK).map { r =>
      s"""SELECT $r AS rnk, doc_id, gain,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c$r) AS cum_grams
         |FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $gramCte,
      |tot AS (SELECT CAST(count(DISTINCT gram) AS BIGINT) AS n FROM items),
      |$rounds
      |SELECT rnk, doc_id, gain, cum_grams,
      |  (cum_grams * 1000000) // (SELECT n FROM tot) AS coverage_ppm
      |FROM ($finalRows)
      |ORDER BY rnk""".stripMargin
  }

  /** Chao2 richness estimate + Good–Turing unseen mass over 3-gram
    * shingle INCIDENCE (per-document presence, the sampling-unit form
    * of the species-richness family) — the crawl-planning readout:
    * "how many distinct shingles does this language's population
    * hold beyond what we've collected, and what fraction of the next
    * document's grams will be new". Chao2's bias-corrected form
    * D + ((m−1)/m)·q1(q1−1)/(2(q2+1)) is always defined (no q2=0
    * pole) and emitted in exact milli units via one nonnegative DIV;
    * the Good–Turing new-gram rate is q1/incidences in ppm.
    *
    * Scale shape: one corpus pass into the (lang, gram, doc-count)
    * incidence table (shingle-vocabulary-sized); everything after is
    * per-language constants.
    */
  def chao2Richness(spark: SparkSession, dir: String): DataFrame = {
    val inc = documents(spark, dir)
      .select(col("lang"), col("doc_id"), explode(gramArray(3)).as("gram"))
      .groupBy(col("lang"), col("gram"))
      .agg(count(lit(1)).as("f"))
    val m = documents(spark, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("m_docs"))
    inc.groupBy(col("lang"))
      .agg(count(lit(1)).as("d_grams"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("q1"),
        sum(when(col("f") === 2, 1L).otherwise(0L)).as("q2"),
        sum(col("f")).as("incidences"))
      .join(broadcast(m), Seq("lang"))
      // decimal carrier (round 11): q1·(q1−1) is a vocabulary-scale
      // SQUARE — the all-BIGINT product ceilinged at q1 ≈ 2·10⁶
      // singleton types; DECIMAL(38,0) is exact while
      // m_docs·q1²·10³ < 10³⁸ — e.g. 10¹¹ docs needs q1 < ~3·10¹¹
      // singleton types (10¹² singletons would put the product AT the
      // precision-38 cap, where non-ANSI decimal overflow returns
      // NULL silently, as with every carrier in this audit)
      .withColumn("chao2_milli", expr(
        "d_grams * 1000L + (CAST(m_docs - 1 AS DECIMAL(20,0)) * q1" +
          " * (q1 - 1) * 1000L)" +
          " DIV (CAST(m_docs AS DECIMAL(20,0)) * 2 * (q2 + 1))"))
      .withColumn("unseen_ppm", expr("(q1 * 1000000L) DIV incidences"))
      .select(col("lang"), col("m_docs"), col("d_grams"), col("q1"),
        col("q2"), col("chao2_milli"), col("unseen_ppm"))
      .orderBy(col("lang"))
  }

  val chao2RichnessSql: String =
    """WITH inc AS (
      |  SELECT lang, gram, CAST(count(*) AS BIGINT) AS f
      |  FROM (SELECT DISTINCT lang, doc_id,
      |          md5(array_to_string(list_slice(t, i, i + 2), ' ')) AS gram
      |        FROM (SELECT lang, doc_id, t,
      |                unnest(range(1, greatest(len(t) - 1, 1))) AS i
      |              FROM (SELECT lang, doc_id, string_split(text, ' ') AS t
      |                    FROM documents)))
      |  GROUP BY 1, 2
      |), m AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS m_docs
      |  FROM documents GROUP BY 1
      |), agg AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS d_grams,
      |    CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
      |    CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS q2,
      |    CAST(sum(f) AS BIGINT) AS incidences
      |  FROM inc GROUP BY 1
      |)
      |SELECT agg.lang, m_docs, d_grams, q1, q2,
      |  d_grams * 1000 + CAST((CAST(m_docs - 1 AS HUGEINT) * q1
      |      * (q1 - 1) * 1000)
      |    // (CAST(m_docs AS HUGEINT) * 2 * (q2 + 1)) AS BIGINT)
      |    AS chao2_milli,
      |  (q1 * 1000000) // incidences AS unseen_ppm
      |FROM agg JOIN m USING (lang)
      |ORDER BY lang""".stripMargin

  /** KS discrimination of the NB classifier margin — the
    * two-sample Kolmogorov–Smirnov statistic between the margin
    * distributions of CORRECTLY and INCORRECTLY classified test docs
    * (the "KS" every scorecard quotes: how separable are the score
    * distributions of the two outcomes; KS ≈ 0 means the margin
    * carries no signal about correctness and cannot gate anything).
    * Exact arithmetic: margins are integer micro-nats, each empirical
    * CDF value is one positive DIV, D is a max over |difference of
    * floors| at the observed margins — deterministic on both engines;
    * ties in D break on the smallest margin.
    *
    * Scale shape: everything after [[nbScores]] is |classes| rows per
    * doc; the two empirical-CDF counts `c_ok`/`c_bad` are INCLUSIVE
    * prefix sums of the outcome indicators over (margin, doc_id) —
    * round 10 rebuilt them on
    * [[graft.operators.Scale.distributedPrefixSum]], replacing the
    * round-9 unpartitioned window that swept the corpus-scaled margin
    * table through a single task (the last `spwckpt` flag in the plan
    * audit); round 11 fuses the two chained applications into ONE
    * [[graft.operators.Scale.distributedPrefixSums]] call — both
    * indicators ride the SAME (margin, doc_id) order, so chaining
    * paid the phase-0 cost (localCheckpoint + boundary sample) twice
    * for identical boundaries. Output is provably identical — a
    * prefix sum is a prefix sum, and the fused form's offset algebra
    * is per-payload independent — so the unchanged window-form oracle
    * below stays the done-gate; the argmax readout is a distributed
    * top-1 (TakeOrderedAndProject). [[nbKsSketch]] remains the
    * constant-state variant for stream merging.
    */
  def nbKs(spark: SparkSession, dir: String): DataFrame = {
    val labeled = nbMargins(spark, dir)
    val tot = labeled.agg(sum(col("ok")).as("n_ok"),
      sum(lit(1L) - col("ok")).as("n_bad"))
    import graft.operators.Scale
    Scale.distributedPrefixSums(
        labeled.withColumn("bad", lit(1L) - col("ok")),
        col("margin"), col("doc_id"),
        Seq(col("ok") -> "c_ok", col("bad") -> "c_bad"))
      .crossJoin(broadcast(tot))
      .withColumn("d_ppm", abs(
        expr("(c_ok * 1000000L) DIV n_ok") -
          expr("(c_bad * 1000000L) DIV n_bad")))
      .orderBy(col("d_ppm").desc, col("margin").asc)
      .limit(1)
      .select(col("n_ok").as("n_correct"), col("n_bad").as("n_incorrect"),
        col("d_ppm").as("ks_ppm"), col("margin").as("at_margin_micro"))
  }

  /** Per-test-doc (doc_id, ok, margin) — correctness indicator and
    * best-minus-runner-up decision margin — shared by the exact and
    * binned KS variants so a tie-break change cannot desynchronize
    * them.
    */
  private[graft] def nbMargins(spark: SparkSession, dir: String): DataFrame = {
    val ranked = nbScores(spark, dir)
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("c").asc)))
      .filter(col("rn") <= 2)
      .localCheckpoint()
    ranked.filter(col("rn") === 1)
      .select(col("doc_id"),
        when(col("c") === col("true_source"), 1L).otherwise(0L).as("ok"),
        col("score").as("s1"))
      .join(ranked.filter(col("rn") === 2)
        .select(col("doc_id"), col("score").as("s2")), Seq("doc_id"))
      .withColumn("margin", col("s1") - col("s2"))
  }

  /** Margin-histogram bin width (micro-nats) for [[nbKsSketch]]. */
  val NbKsBinMicros = 200000L

  /** Bin-domain CLAMP for [[nbKsSketch]] (round 10): margins past
    * `NbKsMaxBin × NbKsBinMicros` land in the tail bin, so the sketch
    * state is ≤ NbKsMaxBin+1 rows BY CONSTRUCTION — not merely
    * "margin-range/width" (the round-10 WindowBounds harness measured
    * that range growing 5→16 bins under the 4× morph: content-, not
    * row-count-driven, but unbounded in principle; extreme documents
    * can push the max margin arbitrarily high). Margins are ≥ 0
    * (best minus runner-up), so only the high side needs the clamp.
    */
  val NbKsMaxBin = 64L

  /** [[nbKs]] from the mergeable margin histogram instead of the
    * per-point CDF sweep — the scale path the exact query's docstring
    * promised. Both outcome classes bin their margins on the same
    * fixed [[NbKsBinMicros]] grid, clamped to [[NbKsMaxBin]]; the CDF
    * difference is evaluated at BIN BOUNDARIES only, so the statistic
    * is a lower bound on the exact D that misses at most the largest
    * single bin's probability mass (the spec pins exactly that
    * sandwich — and the bound survives the clamp, because the merged
    * tail bin's mass is itself counted in "largest bin", and removing
    * evaluation points can only LOWER a max). Sketch state is
    * (bin → ok count, bad count): ≤ [[NbKsMaxBin]]+1 rows, provably
    * corpus-independent, elementwise-addable — no global sort of the
    * margin table anywhere.
    *
    * The cumulative walk's unpartitioned window runs on the bounded
    * bin table (the [[graft.analytics.Stats.sketchQuantiles]]
    * discipline), never the doc-level frame.
    */
  def nbKsSketch(spark: SparkSession, dir: String): DataFrame = {
    val binned = nbMargins(spark, dir)
      .select(expr(
        s"least(margin DIV $NbKsBinMicros, ${NbKsMaxBin}L)").as("bin"),
        col("ok"))
      .groupBy(col("bin"))
      .agg(sum(col("ok")).as("ok_n"),
        sum(lit(1L) - col("ok")).as("bad_n"))
    val tot = binned.agg(sum(col("ok_n")).as("n_ok"),
      sum(col("bad_n")).as("n_bad"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("c_ok", sum(col("ok_n")).over(w))
      .withColumn("c_bad", sum(col("bad_n")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("d_ppm", abs(
        expr("(c_ok * 1000000L) DIV n_ok") -
          expr("(c_bad * 1000000L) DIV n_bad")))
      .orderBy(col("d_ppm").desc, col("bin").asc)
      .limit(1)
      .select(col("n_ok").as("n_correct"), col("n_bad").as("n_incorrect"),
        col("d_ppm").as("ks_ppm"), col("bin").as("at_bin"),
        expr(s"(bin + 1) * $NbKsBinMicros").as("at_margin_hi_micro"))
  }

  /** (lazy: [[nbScoredCtes]] initializes later in the file.) */
  lazy val nbKsSketchSql: String =
    s"""WITH $nbScoredCtes, ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, c ASC) AS rn
      |  FROM scored
      |), labeled AS (
      |  SELECT b.doc_id,
      |    CASE WHEN b.c = b.true_source THEN 1 ELSE 0 END AS ok,
      |    b.score - s.score AS margin
      |  FROM ranked b JOIN ranked s
      |    ON b.doc_id = s.doc_id AND b.rn = 1 AND s.rn = 2
      |), binned AS (
      |  SELECT least(margin // $NbKsBinMicros, $NbKsMaxBin) AS bin,
      |    CAST(sum(ok) AS BIGINT) AS ok_n,
      |    CAST(sum(1 - ok) AS BIGINT) AS bad_n
      |  FROM labeled GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(ok_n) AS BIGINT) AS n_ok,
      |    CAST(sum(bad_n) AS BIGINT) AS n_bad
      |  FROM binned
      |), cum AS (
      |  SELECT bin,
      |    CAST(sum(ok_n) OVER (ORDER BY bin) AS BIGINT) AS c_ok,
      |    CAST(sum(bad_n) OVER (ORDER BY bin) AS BIGINT) AS c_bad
      |  FROM binned
      |)
      |SELECT n_ok AS n_correct, n_bad AS n_incorrect,
      |  abs((c_ok * 1000000) // n_ok - (c_bad * 1000000) // n_bad) AS ks_ppm,
      |  bin AS at_bin, (bin + 1) * $NbKsBinMicros AS at_margin_hi_micro
      |FROM cum CROSS JOIN tot
      |ORDER BY ks_ppm DESC, bin ASC
      |LIMIT 1""".stripMargin

  /** (lazy: [[nbScoredCtes]] initializes later in the file — the
    * [[minhashRecallSql]] precedent.)
    */
  lazy val nbKsSql: String =
    s"""WITH $nbScoredCtes, ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, c ASC) AS rn
      |  FROM scored
      |), labeled AS (
      |  SELECT b.doc_id,
      |    CASE WHEN b.c = b.true_source THEN 1 ELSE 0 END AS ok,
      |    b.score - s.score AS margin
      |  FROM ranked b JOIN ranked s
      |    ON b.doc_id = s.doc_id AND b.rn = 1 AND s.rn = 2
      |), tot AS (
      |  SELECT CAST(sum(ok) AS BIGINT) AS n_ok,
      |    CAST(sum(1 - ok) AS BIGINT) AS n_bad
      |  FROM labeled
      |), cum AS (
      |  SELECT margin,
      |    CAST(sum(ok) OVER (ORDER BY margin, doc_id) AS BIGINT) AS c_ok,
      |    CAST(sum(1 - ok) OVER (ORDER BY margin, doc_id) AS BIGINT) AS c_bad
      |  FROM labeled
      |)
      |SELECT n_ok AS n_correct, n_bad AS n_incorrect,
      |  abs((c_ok * 1000000) // n_ok - (c_bad * 1000000) // n_bad) AS ks_ppm,
      |  margin AS at_margin_micro
      |FROM cum CROSS JOIN tot
      |ORDER BY ks_ppm DESC, margin ASC
      |LIMIT 1""".stripMargin

  /** Cross-source unigram cross-entropy matrix — the Moore–Lewis
    * (2010) domain-similarity readout a data-selection pipeline runs
    * before mixing: entry (model m, eval e) is the average NLL of
    * source e's tokens under source m's Laplace-smoothed unigram LM,
    * in exact micro-nats. Low off-diagonal entries mark near-duplicate
    * SOURCES (candidates for dedup or down-weighting); the
    * Moore–Lewis selection score is the column difference against the
    * in-domain model, directly readable from the matrix.
    *
    * Fixed-point discipline: one ln per (source × vocabulary) row plus
    * one OOV constant per source (smoothing uses the GLOBAL vocab so
    * every model is normalized over the same event space); per-pair
    * sums are exact integers; the mean is one positive DIV per matrix
    * cell.
    *
    * Scale shape: ONE corpus shuffle (the (source, token) count table
    * — shared shape with [[sourceTokenKl]]); the matrix join is
    * (vocab × sources) rows, Heaps-law-bounded; output is |sources|².
    */
  def domainXent(spark: SparkSession, dir: String): DataFrame = {
    val st = documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // model tables AND eval counts both read it
    val v = st.select(col("tok")).distinct().agg(count(lit(1)).as("v"))
    val models = st.groupBy(col("source")).agg(sum(col("c")).as("n_m"))
      .crossJoin(broadcast(v))
      .select(col("source").as("m"), col("n_m"), col("v"),
        (-floor(lit(1e6) * log(lit(1.0) /
          (col("n_m") + col("v")).cast("double")))).cast("long")
          .as("oov_micro"))
    val ltab = st.join(models.select(col("m").as("source"), col("n_m"),
        col("v")), Seq("source"))
      .select(col("source").as("m"), col("tok"),
        (-floor(lit(1e6) * log((col("c") + 1).cast("double") /
          (col("n_m") + col("v")).cast("double")))).cast("long")
          .as("l_micro"))
    st.select(col("source").as("e"), col("tok"), col("c"))
      .crossJoin(broadcast(models.select(col("m"), col("oov_micro"))))
      // unhinted for the same reason as nbScoreDocs: the model table
      // is vocabulary-sized and must be allowed to shuffle at scale
      .join(ltab, Seq("m", "tok"), "left")
      // decimal carrier (round 11): c·l_micro is a token-count ×
      // ~3·10⁷ micro-nat product — per-row it brushes i64 at
      // c ≈ 3·10¹¹ and the (model, eval) sum crosses it at ~10¹²
      // corpus tokens; DIV on the decimal sum still returns the exact
      // BIGINT mean
      .withColumn("nll", col("c").cast("decimal(20,0)") *
        coalesce(col("l_micro"), col("oov_micro")))
      .groupBy(col("m"), col("e"))
      .agg(sum(col("c")).as("n_tok"), sum(col("nll")).as("s"))
      .withColumn("xent_micro", expr("s DIV n_tok"))
      .select(col("m").as("model_source"), col("e").as("eval_source"),
        col("n_tok"), col("xent_micro"))
      .orderBy(col("model_source"), col("eval_source"))
  }

  val domainXentSql: String =
    """WITH st AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2
      |), vv AS (
      |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM st
      |), models AS (
      |  SELECT source AS m, CAST(sum(c) AS BIGINT) AS n_m, v,
      |    -CAST(floor(1e6 * ln(1.0 /
      |      CAST(CAST(sum(c) AS BIGINT) + v AS DOUBLE))) AS BIGINT)
      |      AS oov_micro
      |  FROM st CROSS JOIN vv GROUP BY source, v
      |), ltab AS (
      |  SELECT st.source AS m, st.tok,
      |    -CAST(floor(1e6 * ln(CAST(c + 1 AS DOUBLE) /
      |      CAST(n_m + v AS DOUBLE))) AS BIGINT) AS l_micro
      |  FROM st JOIN models ON models.m = st.source
      |)
      |SELECT mo.m AS model_source, ev.source AS eval_source,
      |  CAST(sum(ev.c) AS BIGINT) AS n_tok,
      |  CAST(sum(CAST(ev.c AS HUGEINT)
      |           * coalesce(lt.l_micro, mo.oov_micro))
      |    // CAST(sum(ev.c) AS HUGEINT) AS BIGINT) AS xent_micro
      |FROM st ev
      |CROSS JOIN models mo
      |LEFT JOIN ltab lt ON lt.m = mo.m AND lt.tok = ev.tok
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Per-source unigram KL divergence against the corpus mixture —
    * the data-mixing audit that says WHICH source's token
    * distribution strays from the blend it feeds (PSI/KS cover
    * numeric columns; this is the token-space analogue a training
    * mix needs). Contribution of token t in source s is
    * c_st · floor(1e6·(ln(c_st/N_s) − ln(c_t/N))) micro-nats —
    * the repo's fixed-point-ln discipline: the ONLY float op is one
    * ln per row of the (sources × vocabulary)-sized table (never the
    * corpus), floored once, so both engines sum identical integers
    * and the per-source total is associative and exact. The sum is
    * emitted unscaled (micro-nat · token units, no division — a
    * near-identical distribution's floor terms can leave the total
    * slightly negative, and a negative DIV diverges across engines).
    * i64 headroom (round-11 audit): the emitted total is a BIGINT by
    * output contract, good to ~10¹⁴ tokens at 10⁵-micro-nat average
    * drift — a source would need both web-corpus length AND severe
    * drift to leave it, at which point the drift verdict is obvious.
    * Each source also reports its highest-contribution token — the
    * single word most responsible for the drift.
    *
    * Scale shape: ONE corpus shuffle (the (source, token) count);
    * everything downstream — marginals, the ln table, the argmax —
    * lives on Heaps-law vocabulary-sized frames.
    */
  def sourceTokenKl(spark: SparkSession, dir: String): DataFrame = {
    val st = documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
      .localCheckpoint() // four consumers below, one corpus pass
    val bySrc = st.groupBy(col("source"))
      .agg(sum(col("c_st")).as("n_s"), count(lit(1)).as("n_types"))
    val byTok = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_ct"))
    val tot = st.agg(sum(col("c_st")).as("n_c"))
    val contrib = st
      .join(broadcast(byTok), Seq("tok"))
      .join(broadcast(bySrc.select(col("source"), col("n_s"))), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("contrib_micro", col("c_st") *
        floor(lit(1e6) *
          (log(col("c_st").cast("double") / col("n_s").cast("double")) -
           log(col("c_ct").cast("double") / col("n_c").cast("double"))))
          .cast("long"))
    val agg = contrib.groupBy(col("source"))
      .agg(sum(col("contrib_micro")).as("kl_micro_sum"))
    val top = contrib
      .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("contrib_micro").desc, col("tok").asc)))
      .filter(col("rn") === 1)
      .select(col("source"), col("tok").as("top_token"),
        col("contrib_micro").as("top_contrib_micro"))
    bySrc.join(agg, Seq("source")).join(top, Seq("source"))
      .select(col("source"), col("n_s").as("n_tok"), col("n_types"),
        col("kl_micro_sum"), col("top_token"), col("top_contrib_micro"))
      .orderBy(col("source"))
  }

  val sourceTokenKlSql: String =
    """WITH st AS (
      |  SELECT source, tok, count(*) AS c_st
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2
      |), s AS (
      |  SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
      |    count(*) AS n_types
      |  FROM st GROUP BY 1
      |), t AS (
      |  SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_ct FROM st GROUP BY 1
      |), n AS (
      |  SELECT CAST(sum(c_st) AS BIGINT) AS n_c FROM st
      |), contrib AS (
      |  SELECT st.source, st.tok,
      |    st.c_st * CAST(floor(1e6 * (
      |      ln(CAST(st.c_st AS DOUBLE) / CAST(s.n_s AS DOUBLE))
      |      - ln(CAST(t.c_ct AS DOUBLE) / CAST(n.n_c AS DOUBLE))))
      |      AS BIGINT) AS contrib_micro
      |  FROM st JOIN s USING (source) JOIN t USING (tok) CROSS JOIN n
      |), agg AS (
      |  SELECT source, CAST(sum(contrib_micro) AS BIGINT) AS kl_micro_sum
      |  FROM contrib GROUP BY 1
      |), top AS (
      |  SELECT source, tok AS top_token, contrib_micro AS top_contrib_micro
      |  FROM (SELECT *, row_number() OVER (PARTITION BY source
      |          ORDER BY contrib_micro DESC, tok ASC) AS rn
      |        FROM contrib)
      |  WHERE rn = 1
      |)
      |SELECT s.source, s.n_s AS n_tok, s.n_types, agg.kl_micro_sum,
      |  top.top_token, top.top_contrib_micro
      |FROM s JOIN agg USING (source) JOIN top USING (source)
      |ORDER BY source""".stripMargin

  /** Multinomial Naive Bayes source classifier — the shape of the
    * fastText/CCNet-style quality classifier every LLM curation
    * pipeline trains to score raw documents (here: predict `source`
    * from the token bag; train on even doc_ids, evaluate on odd).
    * Add-one smoothing over the train vocabulary; the model is the
    * (classes × vocabulary) log-likelihood table plus per-class
    * priors and OOV constants.
    *
    * Fixed-point discipline: the ONLY float op is one ln per row of
    * the class-conditional tables — (|classes| × vocab) +
    * 2·|classes| rows, never the corpus — floored once to micro-nats
    * (the [[sourceTokenKl]] recipe), so a document's class score is
    * an exact integer sum: Σ_w n_w·L_micro(w,c) + prior_micro(c).
    * Integer sums are associative → partial aggregation order (and a
    * DuckDB re-run) cannot flip an argmax; ties break on source asc.
    *
    * Scale shape: ONE corpus shuffle per split ((class, token) train
    * counts; (doc, token) test counts); the model tables are
    * vocabulary-sized (Heaps-law) and broadcast; scoring streams the
    * test split through a broadcast hash join; the per-document
    * argmax window holds |classes| rows per document, never the
    * corpus. Output is the |classes|² confusion matrix.
    */
  def naiveBayes(spark: SparkSession, dir: String): DataFrame = {
    nbScores(spark, dir)
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("c").asc)))
      .filter(col("rn") === 1)
      .groupBy(col("true_source"), col("c"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("true_source"), col("c").as("pred_source"), col("n_docs"))
      .orderBy(col("true_source"), col("pred_source"))
  }

  /** The trained NB model as three small frames:
    * classes (source, oov_micro, prior_micro), ltab (c, tok, l_micro).
    * Public so the STREAMING scorer ([[graft.streaming.Pipeline
    * .nbScoreStream]]) can broadcast the identical model the batch
    * evaluation trained — the train-offline / score-online split every
    * production classifier deployment has.
    */
  def nbModel(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // the LM family's hash split, NOT doc_id parity: the synthetic
    // corpus assigns source = f(doc_id mod |sources|), so a parity
    // split would put disjoint class sets in train and test and the
    // eval would be structurally incapable of a correct prediction
    val train = documents(spark, dir)
      .filter(isTrain)
      .select(col("source"), split(col("text"), " ").as("toks"))
    // (class, token) train counts — vocabulary-sized after the one
    // corpus shuffle; feeds the class totals, the vocab count and the
    // likelihood table
    val cwc = train
      .select(col("source"), explode(col("toks")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_wc"))
      .localCheckpoint()
    val vocab = cwc.select(col("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    val prior = train.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("n_train"))))
      .select(col("source"),
        floor(lit(1e6) * log(col("n_docs").cast("double") /
          col("n_train").cast("double"))).cast("long").as("prior_micro"))
    val classes = cwc.groupBy(col("source"))
      .agg(sum(col("c_wc")).as("n_c"))
      .crossJoin(broadcast(vocab))
      .withColumn("oov_micro",
        floor(lit(1e6) * log(lit(1.0) /
          (col("n_c") + col("v")).cast("double"))).cast("long"))
      .join(prior, Seq("source"))
    val ltab = cwc.join(classes.select(col("source"), col("n_c"), col("v")),
        Seq("source"))
      .select(col("source").as("c"), col("tok"),
        floor(lit(1e6) * log((col("c_wc") + 1).cast("double") /
          (col("n_c") + col("v")).cast("double"))).cast("long").as("l_micro"))
    (classes.select(col("source"), col("oov_micro"), col("prior_micro")),
      ltab)
  }

  /** Score a (doc_id, extra…, toks) frame against an NB model — the
    * ONE scoring recurrence shared by the batch eval queries and the
    * streaming scorer: per (doc, class), prior + Σ n_tok·L(tok, c)
    * with the per-class OOV fallback. Stateless except one
    * (doc, class)-keyed aggregation, so the identical plan runs over
    * a bounded OR a streaming frame.
    */
  private[graft] def nbScoreDocs(docs: DataFrame, classes: DataFrame,
                                 ltab: DataFrame,
                                 carry: Seq[String]): DataFrame = {
    val carryCols = carry.map(col)
    val tokTerms = docs
      .select((col("doc_id") +: carryCols) :+
        explode(col("toks")).as("tok"): _*)
      .crossJoin(broadcast(classes.select(col("source").as("c"),
        col("oov_micro"))))
      // NO broadcast hint on the likelihood table: it is
      // vocabulary × classes — small enough that AQE size-picks a
      // broadcast at these SFs, but Heaps-law-growing, so at corpus
      // scale the lookup must be free to become a shuffle join on
      // (class, token) rather than OOM the driver
      .join(ltab, Seq("c", "tok"), "left")
      .select((col("doc_id") +: carryCols) :+ col("c") :+
        coalesce(col("l_micro"), col("oov_micro")).as("term"): _*)
    val priorTerms = docs
      .select((col("doc_id") +: carryCols): _*)
      .crossJoin(broadcast(classes.select(col("source").as("c"),
        col("prior_micro").as("term"))))
    tokTerms.unionByName(priorTerms)
      .groupBy((col("doc_id") +: carryCols) :+ col("c"): _*)
      .agg(sum(col("term")).as("score"))
  }

  /** BATCH twin of [[nbScoreDocs]] with a (doc, token) COUNT
    * pre-aggregation before the ×|classes| expansion (round 11 —
    * found while chasing why the fused-prefix-sum q_nb_ks rebuild
    * barely moved the query: [[nbMargins]]' scoring dominates, and
    * its biggest intermediate was every token INSTANCE replicated per
    * class). Σ_instances L(tok) ≡ Σ_distinct n·L(tok) in exact
    * integer micro-nats, so scores are bit-identical (spec-pinned
    * against [[nbScoreDocs]]) — but the class blowup, the likelihood
    * probe and the final shuffle all shrink by the token-duplication
    * factor, and the pre-aggregation itself gets map-side combine on
    * the un-expanded exploded frame. This is exactly the `tc` CTE the
    * DuckDB oracle always ran.
    *
    * Kept separate from [[nbScoreDocs]] because streaming allows ONE
    * aggregation per query: the online scorer must fold token
    * instances directly into its (doc, class) state, while every
    * batch eval should pre-aggregate. Structured Streaming rejects
    * this two-agg plan at analysis, so the split cannot silently rot.
    */
  private[graft] def nbScoreDocsBatch(docs: DataFrame, classes: DataFrame,
                                      ltab: DataFrame,
                                      carry: Seq[String]): DataFrame = {
    val carryCols = carry.map(col)
    val tc = docs
      .select((col("doc_id") +: carryCols) :+
        explode(col("toks")).as("tok"): _*)
      .groupBy((col("doc_id") +: carryCols) :+ col("tok"): _*)
      .agg(count(lit(1)).as("_ntok"))
    val tokTerms = tc
      .crossJoin(broadcast(classes.select(col("source").as("c"),
        col("oov_micro"))))
      // unhinted for the same Heaps-law reason as [[nbScoreDocs]]
      .join(ltab, Seq("c", "tok"), "left")
      .select((col("doc_id") +: carryCols) :+ col("c") :+
        (col("_ntok") * coalesce(col("l_micro"), col("oov_micro")))
          .as("term"): _*)
    val priorTerms = docs
      .select((col("doc_id") +: carryCols): _*)
      .crossJoin(broadcast(classes.select(col("source").as("c"),
        col("prior_micro").as("term"))))
    tokTerms.unionByName(priorTerms)
      .groupBy((col("doc_id") +: carryCols) :+ col("c"): _*)
      .agg(sum(col("term")).as("score"))
  }

  /** The per-(test doc, class) integer score table behind
    * [[naiveBayes]] and [[nbCalibration]] — one definition so the
    * model the confusion matrix evaluates IS the model the
    * calibration curve audits.
    */
  private def nbScores(spark: SparkSession, dir: String): DataFrame = {
    val (classes, ltab) = nbModel(spark, dir)
    val test = documents(spark, dir)
      .filter(!isTrain)
      .select(col("doc_id"), col("source").as("true_source"),
        split(col("text"), " ").as("toks"))
    nbScoreDocsBatch(test, classes, ltab, Seq("true_source"))
      .select(col("doc_id"), col("true_source"), col("c"), col("score"))
  }

  /** CTE chain ending in `scored` (doc_id, true_source, c, score) —
    * the SQL twin of [[nbScores]], shared by both NB oracles.
    */
  private val nbScoredCtes: String =
    s"""docs AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks,
      |    ${graft.operators.Scale.hashBucketSql("doc_id")} < 80 AS is_train
      |  FROM documents
      |), cwc AS (
      |  SELECT source, tok, count(*) AS c_wc
      |  FROM (SELECT source, unnest(toks) AS tok FROM docs
      |        WHERE is_train)
      |  GROUP BY 1, 2
      |), vocab AS (
      |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cwc
      |), classes AS (
      |  SELECT source, CAST(sum(c_wc) AS BIGINT) AS n_c, v,
      |    CAST(floor(1e6 * ln(1.0 /
      |      CAST(CAST(sum(c_wc) AS BIGINT) + v AS DOUBLE))) AS BIGINT)
      |      AS oov_micro
      |  FROM cwc CROSS JOIN vocab GROUP BY source, v
      |), prior AS (
      |  SELECT source, CAST(floor(1e6 * ln(
      |      CAST(count(*) AS DOUBLE) /
      |      (SELECT CAST(count(*) AS DOUBLE) FROM docs WHERE is_train)))
      |    AS BIGINT) AS prior_micro
      |  FROM docs WHERE is_train GROUP BY 1
      |), ltab AS (
      |  SELECT cwc.source AS c, cwc.tok,
      |    CAST(floor(1e6 * ln(CAST(c_wc + 1 AS DOUBLE) /
      |      CAST(n_c + v AS DOUBLE))) AS BIGINT) AS l_micro
      |  FROM cwc JOIN classes USING (source)
      |), tc AS (
      |  SELECT doc_id, source AS true_source, tok, count(*) AS n
      |  FROM (SELECT doc_id, source, unnest(toks) AS tok FROM docs
      |        WHERE NOT is_train)
      |  GROUP BY 1, 2, 3
      |), scored AS (
      |  SELECT tc.doc_id, tc.true_source, cl.source AS c,
      |    CAST(sum(tc.n * coalesce(ltab.l_micro, cl.oov_micro)) AS BIGINT)
      |      + any_value(pr.prior_micro) AS score
      |  FROM tc
      |  CROSS JOIN classes cl
      |  LEFT JOIN ltab ON ltab.c = cl.source AND ltab.tok = tc.tok
      |  JOIN prior pr ON pr.source = cl.source
      |  GROUP BY 1, 2, 3
      |)""".stripMargin

  val naiveBayesSql: String =
    s"""WITH $nbScoredCtes, pred AS (
      |  SELECT true_source, c AS pred_source
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |          ORDER BY score DESC, c ASC) AS rn
      |        FROM scored)
      |  WHERE rn = 1
      |)
      |SELECT true_source, pred_source, count(*) AS n_docs
      |FROM pred
      |GROUP BY 1, 2
      |ORDER BY true_source, pred_source""".stripMargin

  /** Margin-bin width (micro-nats) and bin cap for [[nbCalibration]]. */
  val NbCalBinMicros = 200000L
  val NbCalMaxBin = 9L

  /** Reliability curve for the [[naiveBayes]] classifier: test docs
    * bucketed by decision margin (best minus second-best class score,
    * in exact micro-nats — the integer confidence proxy), with
    * per-bucket accuracy in ppm. The eval that tells a curation
    * pipeline whether its quality-classifier scores can be THRESHOLDED
    * (a well-calibrated margin ⇒ accuracy rises with the bucket) or
    * only ranked. All integers: margins are differences of exact
    * scores, buckets are one positive DIV (capped), accuracy a second.
    *
    * Scale shape: everything after [[nbScores]] runs on |classes|
    * rows per doc, then one bounded aggregate over ≤ 10 buckets.
    */
  def nbCalibration(spark: SparkSession, dir: String): DataFrame = {
    val ranked = nbScores(spark, dir)
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("c").asc)))
      .filter(col("rn") <= 2)
      .localCheckpoint() // feeds the best AND the runner-up branch
    val best = ranked.filter(col("rn") === 1)
      .select(col("doc_id"), col("true_source"), col("c").as("pred"),
        col("score").as("s1"))
    val second = ranked.filter(col("rn") === 2)
      .select(col("doc_id"), col("score").as("s2"))
    best.join(second, Seq("doc_id"))
      .withColumn("margin", col("s1") - col("s2"))
      .withColumn("bin",
        least(expr(s"margin DIV ${NbCalBinMicros}L"), lit(NbCalMaxBin)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === col("true_source"), 1L).otherwise(0L))
          .as("n_correct"),
        expr("sum(margin) DIV count(1)").as("avg_margin_micro"))
      .withColumn("acc_ppm", expr("(n_correct * 1000000L) DIV n_docs"))
      .orderBy(col("bin"))
  }

  val nbCalibrationSql: String =
    s"""WITH $nbScoredCtes, ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, c ASC) AS rn
      |  FROM scored
      |), j AS (
      |  SELECT b.doc_id, b.true_source, b.c AS pred, b.score - s.score AS margin
      |  FROM ranked b JOIN ranked s
      |    ON b.doc_id = s.doc_id AND b.rn = 1 AND s.rn = 2
      |), binned AS (
      |  SELECT least(margin // $NbCalBinMicros, $NbCalMaxBin) AS bin,
      |    margin, CASE WHEN pred = true_source THEN 1 ELSE 0 END AS ok
      |  FROM j
      |)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(ok) AS BIGINT) AS n_correct,
      |  CAST(sum(margin) AS BIGINT) // count(*) AS avg_margin_micro,
      |  (CAST(sum(ok) AS BIGINT) * 1000000) // count(*) AS acc_ppm
      |FROM binned
      |GROUP BY bin
      |ORDER BY bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_naive_bayes" -> (naiveBayes _),
    "q_nb_calibration" -> (nbCalibration _),
    "q_nb_ks" -> (nbKs _),
    "q_nb_ks_sketch" -> (nbKsSketch _),
    "q_containment_dup" -> ((s: SparkSession, d: String) => containmentDup(s, d)),
    "q_source_token_kl" -> (sourceTokenKl _),
    "q_domain_xent" -> (domainXent _),
    "q_set_cover" -> (setCoverSelect _),
    "q_chao2_richness" -> (chao2Richness _),
    "q_lm_kneser_ney" -> (lmKneserNey _),
    "q_leakage_safe_split" -> (leakageSafeSplit _),
    "q_minhash_recall" -> (minhashRecall _),
    "q_curriculum_stages" -> (curriculumStages _),
    "q_dedup_rate_curve" -> (dedupRateCurve _),
    "q_lang_overlap" -> (langOverlap _),
    "q_ngram_novelty" -> (ngramNovelty _),
    "q_dedup_bias_audit" -> (dedupBiasAudit _),
    "q_langid_trigram" -> (langIdTrigram _),
    "q_dedup_quality_reps" -> (dedupQualityReps _),
    "q_top_terms_shift" -> (topTermsShift _),
    "q_dsir_select" -> (dsirSelect _),
    "q_rake_keywords" -> ((s: SparkSession, d: String) => rakeKeywords(s, d)),
    "q_textrank" -> ((s: SparkSession, d: String) => textrank(s, d)),
    "q_phrase_search" -> ((s: SparkSession, d: String) => phraseSearch(s, d)),
    "q_vocab_oov" -> ((s: SparkSession, d: String) => vocabOov(s, d)),
    "q_corpus_curation" -> (corpusCuration _),
    "q_chunk_dedup" -> (chunkDedup _),
    "q_weighted_sample" -> (weightedSample _),
    "q_dedup_exact" -> (dedupExact _),
    "q_dup_spans" -> ((s: SparkSession, d: String) => dupSpans(s, d)),
    "q_token_stats" -> (tokenStats _),
    "q_token_bpe" -> (tokenBpe _),
    "q_bpe_train" -> ((s: SparkSession, d: String) => bpeTrain(s, d)),
    "q_bpe_encode" -> ((s: SparkSession, d: String) => bpeEncode(s, d)),
    "q_tfidf_top_terms" -> ((s: SparkSession, d: String) => tfidfTopTerms(s, d)),
    "q_bm25_topk" -> (bm25TopK _),
    "q_pmi_collocations" -> (pmiCollocations _),
    "q_text_quality" -> (textQuality _),
    "q_lang_id" -> (langId _),
    "q_lang_entropy" -> (langEntropy _),
    "q_doc_repetition" -> (docRepetition _),
    "q_approx_top_tokens" -> ((s: SparkSession, d: String) => approxTopTokens(s, d)),
    "q_near_dup_jaccard" -> ((s: SparkSession, d: String) => nearDupJaccard(s, d)),
    "q_dedup_clusters" -> (dedupClusters _),
    "q_minhash_lsh" -> ((s: SparkSession, d: String) => minHashLsh(s, d)),
    "q_source_leakage" -> ((s: SparkSession, d: String) => sourceLeakage(s, d)),
    "q_incr_dedup" -> ((s: SparkSession, d: String) => incrementalDedup(s, d)),
    "q_incr_dedup_pruned" -> ((s: SparkSession, d: String) => incrementalDedupPruned(s, d)),
    "q_incr_dedup_appended" -> ((s: SparkSession, d: String) => incrementalDedupAppended(s, d)),
    "q_incr_dedup_compacted" -> ((s: SparkSession, d: String) => incrementalDedupCompacted(s, d)),
    "q_simhash_dedup" -> ((s: SparkSession, d: String) => simHashDedup(s, d)),
    "q_doc_fingerprint" -> (docFingerprints _),
    "q_contamination" -> ((s: SparkSession, d: String) => contamination(s, d)),
    "q_lm_perplexity" -> (lmPerplexity _),
    "q_lm_bigram" -> (lmBigram _),
    "q_lm_interp" -> (lmInterp _),
    "q_source_quota" -> ((s: SparkSession, d: String) => sourceQuota(s, d)),
    "q_ngram_jaccard" -> ((s: SparkSession, d: String) => ngramJaccard(s, d))
  )

  /** SQL oracles for the DuckDB-expressible subset. MinHash, SimHash
    * and the winnowing fingerprints are built on the engine-portable
    * [[md5Hex]]/[[hexWord]] hash family, so every text operator here is fully
    * oracle-checked.
    */
  val oracles: Map[String, String] = Map(
    "q_naive_bayes" -> naiveBayesSql,
    "q_nb_calibration" -> nbCalibrationSql,
    "q_nb_ks" -> nbKsSql,
    "q_nb_ks_sketch" -> nbKsSketchSql,
    "q_containment_dup" -> containmentDupSql,
    "q_source_token_kl" -> sourceTokenKlSql,
    "q_domain_xent" -> domainXentSql,
    "q_set_cover" -> setCoverSelectSql,
    "q_chao2_richness" -> chao2RichnessSql,
    "q_lm_kneser_ney" -> lmKneserNeySql,
    "q_leakage_safe_split" -> leakageSafeSplitSql,
    "q_minhash_recall" -> minhashRecallSql,
    "q_curriculum_stages" -> curriculumStagesSql,
    "q_dedup_rate_curve" -> dedupRateCurveSql,
    "q_lang_overlap" -> langOverlapSql,
    "q_ngram_novelty" -> ngramNoveltySql,
    "q_dedup_bias_audit" -> dedupBiasAuditSql,
    "q_langid_trigram" -> langIdTrigramSql,
    "q_dedup_quality_reps" -> dedupQualityRepsSql,
    "q_top_terms_shift" -> topTermsShiftSql,
    "q_dsir_select" -> dsirSelectSql,
    "q_rake_keywords" -> rakeKeywordsSql,
    "q_textrank" -> textrankSql,
    "q_phrase_search" -> phraseSearchSql,
    "q_vocab_oov" -> vocabOovSql,
    "q_corpus_curation" -> corpusCurationSql,
    "q_chunk_dedup" -> chunkDedupSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_minhash_lsh" -> minHashLshSql,
    "q_source_leakage" -> sourceLeakageSql,
    "q_incr_dedup" -> incrementalDedupSql,
    // the pruned path must be physically different, semantically
    // identical — the SAME oracle gates both
    "q_incr_dedup_pruned" -> incrementalDedupSql,
    "q_incr_dedup_appended" -> incrementalDedupSql,
    "q_incr_dedup_compacted" -> incrementalDedupSql,
    "q_simhash_dedup" -> simHashDedupSql,
    "q_doc_fingerprint" -> docFingerprintsSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dup_spans" -> dupSpansSql,
    "q_token_stats" -> tokenStatsSql,
    "q_token_bpe" -> tokenBpeSql,
    "q_bpe_train" -> bpeTrainSql,
    "q_bpe_encode" -> bpeEncodeSql,
    "q_tfidf_top_terms" -> tfidfTopTermsSql,
    "q_bm25_topk" -> bm25TopKSql,
    "q_pmi_collocations" -> pmiCollocationsSql,
    "q_text_quality" -> textQualitySql,
    "q_lang_id" -> langIdSql,
    "q_lang_entropy" -> langEntropySql,
    "q_doc_repetition" -> docRepetitionSql,
    "q_approx_top_tokens" -> approxTopTokensSql,
    "q_near_dup_jaccard" -> nearDupJaccardSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_contamination" -> contaminationSql,
    "q_lm_perplexity" -> lmPerplexitySql,
    "q_lm_bigram" -> lmBigramSql,
    "q_lm_interp" -> lmInterpSql,
    "q_source_quota" -> sourceQuotaSql,
    "q_ngram_jaccard" -> ngramJaccardSql
  )
}
