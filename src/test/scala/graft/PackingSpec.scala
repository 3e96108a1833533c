package graft

import org.apache.spark.sql.functions._
import graft.analytics.Packing

class PackingSpec extends SparkSpec {

  test("seq packing conserves tokens and fills every non-final window exactly") {
    val packed = Packing.seqPack(spark, sf).collect()
    assert(packed.nonEmpty)
    val totalByLang = graft.ingest.Sources.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = packed.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      // token conservation: window fills partition the language stream
      assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalByLang(lang),
        s"$lang: packed tokens != corpus tokens")
      // window ids are dense 0..max
      val ids = rows.map(_.getAs[Long]("window_id")).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq, s"$lang: window gaps")
      // every window but the last is EXACTLY full
      val last = ids.max
      rows.filter(_.getAs[Long]("window_id") != last).foreach { r =>
        assert(r.getAs[Long]("n_tokens") == Packing.PackWindow,
          s"$lang window ${r.getAs[Long]("window_id")}: not full")
        assert(r.getAs[Double]("fill_frac") == 1.0)
      }
      // fragments never exceed doc count; window 0 has no fragments
      rows.foreach { r =>
        assert(r.getAs[Long]("n_frag") <= r.getAs[Long]("n_docs"))
      }
      assert(rows.find(_.getAs[Long]("window_id") == 0L)
        .get.getAs[Long]("n_frag") == 0L)
    }
  }

  test("seq packing prefix sum is sharded — no language serializes in one task") {
    import graft.ingest.Sources
    // 1. the physical plan partitions the prefix-sum window by
    // (lang, shard), not lang alone — the thing that was single-task
    val plan = Packing.seqPack(spark, sf).queryExecution.executedPlan.toString
    assert("hashpartitioning\\(lang#\\d+, shard#\\d+".r.findFirstIn(plan).isDefined,
      s"window exchange must hash by (lang, shard); plan:\n$plan")
    // 2. the fixture genuinely spreads every language over >1 shard,
    // so the assertion above isn't vacuously about a 1-shard layout
    val maxId = Sources.documents(spark, sf)
      .agg(max(col("doc_id"))).head.getLong(0)
    val r = maxId / Packing.PackShards + 1
    val shardsPerLang = Sources.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(countDistinct(expr(s"doc_id DIV $r")).as("n_shards"))
      .collect()
    shardsPerLang.foreach { row =>
      assert(row.getAs[Long]("n_shards") > 1,
        s"${row.getString(0)}: only one shard — spec fixture too small")
    }
  }

  test("sharded packing is bit-identical to the single-window prefix sum") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.ingest.Sources.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val W = Packing.PackWindow
    val expected = docs
      .withColumn("s", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("window_id", explode(
        sequence(expr(s"s DIV $W"), expr(s"(s + n_tok - 1) DIV $W"))))
      .withColumn("win_tokens",
        least(col("s") + col("n_tok"), (col("window_id") + 1) * W) -
          greatest(col("s"), col("window_id") * W))
      .groupBy(col("lang"), col("window_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s") < col("window_id") * W, 1L).otherwise(0L)).as("n_frag"),
        sum(col("win_tokens")).as("n_tokens"))
      .withColumn("fill_frac", round(col("n_tokens") / lit(W.toDouble), 6))
      .collect().map(_.toSeq).toSet
    val actual = Packing.seqPack(spark, sf).collect().map(_.toSeq).toSet
    assert(actual == expected, "sharded != single-window packing")
  }

  test("mixture weights: sum to 1, sqrt-temperature flattens vs proportional") {
    val rows = Packing.mixWeights(spark, sf).collect()
    assert(rows.length >= 2)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    val total = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    // alpha=1/2 up-weights small sources and down-weights large ones
    // relative to proportional sampling
    rows.foreach { r =>
      val prop = r.getAs[Long]("n_tokens") / total
      val w = r.getAs[Double]("weight")
      if (prop < 1.0 / rows.length) assert(w > prop * 0.999,
        s"${r.getString(0)}: small source not up-weighted ($w vs $prop)")
      // epochs recompute: weight * budget / tokens
      val epochs = w * Packing.MixTokenBudget / r.getAs[Long]("n_tokens")
      assert(math.abs(r.getAs[Double]("expected_epochs") - epochs) < 1e-3)
    }
    // weight is monotone in token count (sqrt is monotone)
    val sorted = rows.sortBy(_.getAs[Long]("n_tokens"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("weight") <= b.getAs[Double]("weight") + 1e-9)
    }
  }

  test("dataset card: one row of mutually consistent exact statistics") {
    val r = Packing.datasetCard(spark, sf).collect()
    assert(r.length == 1, "the card is one row by contract")
    val row = r.head
    val docs = graft.ingest.Sources.documents(spark, sf)
    assert(row.getAs[Long]("n_docs") == docs.count())
    assert(row.getAs[Long]("n_unique_texts") <= row.getAs[Long]("n_docs"))
    assert(row.getAs[Long]("n_langs") >= 1 && row.getAs[Long]("n_sources") >= 1)
    val ur = row.getAs[Double]("unique_rate")
    assert(ur > 0.0 && ur <= 1.0)
    // batch share must agree with the shared mod-5 marker exactly
    val nBatch = docs.filter(col("doc_id") % 5 === 4).count()
    assert(math.abs(row.getAs[Double]("batch_share") -
      BigDecimal(nBatch.toDouble / docs.count())
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // mean tokens consistent with the totals
    assert(math.abs(row.getAs[Double]("mean_doc_tokens") -
      BigDecimal(row.getAs[Long]("n_tokens").toDouble / row.getAs[Long]("n_docs"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("doc chunks tile every document with the configured overlap") {
    val chunks = Packing.docChunks(spark, sf).collect()
      .groupBy(_.getLong(0))
    val nTok = graft.ingest.Sources.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == nTok.keySet, "every doc must yield chunks")
    chunks.foreach { case (doc, rows) =>
      val sortedRows = rows.sortBy(_.getAs[Long]("chunk_id"))
      val n = nTok(doc)
      // starts advance by exactly the stride; first starts at 0
      sortedRows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") == i.toLong)
        assert(r.getAs[Long]("start_tok") == i * Packing.ChunkStride)
        assert(r.getAs[Long]("n_chunk_tokens") > 0)
        assert(r.getAs[Long]("start_tok") + r.getAs[Long]("n_chunk_tokens") <= n)
      }
      // the last chunk reaches the document end; coverage is complete
      val lastRow = sortedRows.last
      assert(lastRow.getAs[Long]("start_tok") +
        lastRow.getAs[Long]("n_chunk_tokens") == n,
        s"doc $doc: chunks do not reach the end")
      // no earlier truncated chunk: all but last are full size
      sortedRows.dropRight(1).foreach { r =>
        assert(r.getAs[Long]("n_chunk_tokens") == Packing.ChunkSize,
          s"doc $doc chunk ${r.getAs[Long]("chunk_id")}: truncated mid-doc")
      }
      // a doc shorter than one chunk yields exactly one chunk
      if (n <= Packing.ChunkSize) assert(sortedRows.length == 1)
    }
  }

  test("global shuffle: a lossless deterministic permutation into dense shards") {
    import org.apache.spark.sql.functions._
    val out = Packing.globalShuffle(spark, sf).collect()
    val nDocs = graft.ingest.Sources.documents(spark, sf).count()
    // lossless: every doc appears exactly once
    assert(out.length == nDocs)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
    // shards are in range and positions are dense 1..n per shard
    out.groupBy(_.getAs[Long]("shard")).foreach { case (s, rows) =>
      assert(s >= 0 && s < Packing.ShuffleShards)
      val pos = rows.map(_.getAs[Long]("pos")).sorted
      assert(pos.toSeq == (1L to rows.length).toSeq, s"shard $s positions not dense")
    }
    // deterministic: a re-run (fresh plan) produces the identical assignment
    val again = Packing.globalShuffle(spark, sf).collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toSeq ==
      again.map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toSeq)
    // shuffled: within a shard, doc_ids are not in sorted order (the
    // permutation actually permutes) — holds for any shard with > 20 docs
    val big = out.groupBy(_.getAs[Long]("shard")).values.filter(_.length > 20)
    assert(big.nonEmpty)
    assert(big.exists { rows =>
      val ids = rows.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id")).toSeq
      ids != ids.sorted
    }, "every shard kept insertion order — not a shuffle")
  }

  test("source gini: exact coefficient replay; bounds honored") {
    import graft.analytics.Packing
    val row = Packing.sourceGini(spark, sf).collect().head
    val bySource = graft.ingest.Sources.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val sorted = bySource.sortBy { case (src, t) => (t, src) }
    val n = sorted.length.toLong
    val tot = sorted.map(_._2).sum
    val sWeighted = sorted.zipWithIndex.map { case ((_, t), i) => (i + 1) * t }.sum
    val gini = (1000000L * (2 * sWeighted - (n + 1) * tot)) / (n * tot)
    assert(row.getAs[Long]("n_sources") == n)
    assert(row.getAs[Long]("total_tokens") == tot)
    assert(row.getAs[Long]("gini_micro") == gini, "gini does not replay")
    assert(row.getAs[Long]("top_share_ppm") ==
      1000000L * sorted.map(_._2).max / tot)
    // bounds: 0 <= gini < 1e6; top share >= 1/n
    assert(gini >= 0 && gini < 1000000L)
    assert(row.getAs[Long]("top_share_ppm") >= 1000000L / n)
  }

  test("temperature curve: tau=2 equals mixWeights' sqrt; flattening is monotone in tau") {
    import graft.analytics.Packing
    val out = Packing.mixTemperatureCurve(spark, sf).collect()
      .map(r => (r.getAs[Int]("tau_q"), r.getAs[String]("source"),
        r.getAs[Double]("weight"), r.getAs[Double]("max_weight")))
    val taus = out.map(_._1).distinct.sorted.toSeq
    assert(taus == Seq(1, 2, 3, 4))
    // weights sum to ~1 within each temperature
    taus.foreach { t =>
      val sum = out.filter(_._1 == t).map(_._3).sum
      assert(math.abs(sum - 1.0) < 1e-4, s"tau=$t weights sum $sum")
    }
    // flattening: the dominant source's share is non-decreasing in tau
    val maxW = taus.map(t => out.filter(_._1 == t).map(_._4).head).toSeq
    assert(maxW == maxW.sorted, s"max share not monotone in tau: $maxW")
    // tau=2 reproduces mixWeights' sqrt weighting
    val mw = Packing.mixWeights(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    out.filter(_._1 == 2).foreach { case (_, src, w, _) =>
      assert(math.abs(w - mw(src)) <= 1e-6, s"$src tau=2 != mixWeights")
    }
  }
}
