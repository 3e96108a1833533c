package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Weak-scaling harness: materialize a K× replica of the sf0.1 tables
  * into a scratch dir with DISJOINT key spaces per replica, then time
  * the heaviest operator families against it. Purpose: evidence that
  * the plans scale ~linearly in data volume at fixed parallelism —
  * the local stand-in for the 100× cluster question the design notes
  * argue analytically.
  *
  * Replica construction keeps the workload's character instead of
  * inflating it artificially:
  *  - lineitem/orders: keys shifted per replica (orderkey/partkey/
  *    custkey), so graph/affinity operators see K disjoint copies of
  *    the same co-purchase topology — textbook weak scaling.
  *  - documents: doc_id shifted AND the text word order transformed
  *    per replica (identity / reversed / rotated / sorted) — replicas
  *    are NOT near-duplicates of each other, so dedup candidate
  *    generation grows ~K×, not K²× (which exact copies would cause
  *    by design, swamping the scaling signal with found duplicates).
  *  - events/embeddings: ids shifted (embeddings keep their vectors —
  *    ANN scoring cost is what scales).
  */
object ScaleUp {

  def materialize(spark: SparkSession, srcDir: String, outDir: String,
                  k: Int): Unit = {
    // pure Column arithmetic (no UDFs, even in tooling): shifted keys
    // and per-replica word-order morphs
    def shift(c: org.apache.spark.sql.Column,
              rep: org.apache.spark.sql.Column) =
      c + rep.cast("long") * 100000000L
    // replica r rewrites every word w → md5(w ':' r) prefix: the
    // intra-replica similarity structure is ISOMORPHIC to the original
    // corpus (same word ⇒ same token, so every shingle/minhash
    // relationship is preserved shape-for-shape), while replicas share
    // zero vocabulary — so dedup candidate volume scales ~K×, not the
    // K²× that exact text copies would manufacture
    def morph(t: org.apache.spark.sql.Column,
              rep: org.apache.spark.sql.Column) =
      when(rep === 0, t).otherwise(
        array_join(transform(split(t, " "), w =>
          substring(md5(concat(w, lit(":"), rep.cast("string"))), 1, 8)),
          " "))
    def reps(df: DataFrame): DataFrame =
      df.crossJoin(
        spark.range(0, k).select(col("id").cast("int").as("rep")))
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    reps(li)
      .withColumn("l_orderkey", shift(col("l_orderkey"), col("rep")))
      .withColumn("l_partkey", shift(col("l_partkey"), col("rep")))
      .withColumn("l_suppkey", shift(col("l_suppkey"), col("rep")))
      .drop("rep")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    reps(ord)
      .withColumn("o_orderkey", shift(col("o_orderkey"), col("rep")))
      .withColumn("o_custkey", shift(col("o_custkey"), col("rep")))
      .drop("rep")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/orders.parquet")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    reps(docs)
      .withColumn("doc_id", shift(col("doc_id"), col("rep")))
      .withColumn("text", morph(col("text"), col("rep")))
      .drop("rep")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    reps(ev)
      .withColumn("event_id", shift(col("event_id"), col("rep")))
      .withColumn("user_id", shift(col("user_id"), col("rep")))
      .drop("rep")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")
    // embeddings: ids shifted AND lanes ROTATED per replica — a lane
    // permutation preserves every norm and every within-replica dot
    // (the workload's geometry is isomorphic), while cross-replica
    // pairs decorrelate. Plain copies would make every vector an
    // exact clone of its replicas: all kNN lists collapse onto the
    // clone groups, N_k variance hits zero, and the "scaled" ANN
    // measurements time a degenerate graph instead of a 4× corpus.
    // Rotation alone wraps at k = dim (replica dim would clone replica
    // 0), so each dim-sized rotation cycle also gets a per-lane SIGN
    // pattern from the bits of q = r / dim — a uniform within-replica
    // sign flip is an isometry too (signs cancel in every
    // within-replica dot, norms untouched), and distinct q give
    // distinct patterns, so replicas stay pairwise distinct for any
    // practical k (q < 2^31). q = 0 flips nothing: the first 64
    // replicas are bit-identical to the rotation-only scheme.
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dim = 64
    val rotated = (0 until k).map { r =>
      val q = r / dim
      val rot = array((0 until dim).map { i =>
        val src = element_at(col("embedding"), (i + r % dim) % dim + 1)
        if (((q >> (i % 31)) & 1) == 1) (-src) else src
      }: _*)
      emb
        .withColumn("vec_id", shift(col("vec_id"), lit(r)))
        .withColumn("embedding", if (r == 0) col("embedding") else rot)
    }.reduce(_ unionByName _)
    rotated
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
    // dimensions ride along unchanged — they are broadcast-side
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    }
  }

  /** args: [k] [outDir] [query...] — default K=4, heavy-family set. */
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val out = args.drop(1).headOption.getOrElse("/tmp/graft_scaled")
    val qs = if (args.length > 2) args.drop(2).toSeq else Seq(
      "q_part_pagerank", "q_pagerank_converged", "q_part_kcore",
      "q_part_communities", "q_part_triangles", "q_dedup_exact",
      "q_minhash_lsh", "q_ngram_jaccard", "q_tfidf_top_terms",
      "q_sessionize", "q_knn_bruteforce", "q_pricing_summary",
      "q_order_skyline", "q_bootstrap_ci",
      // round-7 additions: the new heavy families
      "q_leakage_safe_split", "q_minhash_recall", "q_hubness_audit",
      "q_mutual_knn", "q_incr_semantic", "q_hard_negatives_ivf",
      "q_dsir_select", "q_lm_kneser_ney", "q_phrase_search",
      // round-9/10 rebuilds: the distributed-rank consumers and the
      // KS pair — the queries whose scale shape changed most recently
      "q_price_deciles", "q_rfm_segmentation", "q_pareto_abc",
      "q_key_skew", "q_nb_ks", "q_nb_ks_sketch")
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    materialize(spark, src, out, k)
    // time each query on base then scaled, min of 2 (same cache
    // discipline as Bench). The action is a noop-sink WRITE, not
    // count(): count() lets Spark elide final sorts and some
    // projection work, understating per-query cost — the noop sink
    // materializes every output row, so base-vs-scaled ratios
    // reflect full query cost (round-6 advice).
    def time(dir: String, name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).map { _ =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    println(f"${"query"}%-24s ${"sf0.1"}%8s ${s"${k}x"}%8s  ratio")
    qs.foreach { q =>
      val base = time(src, q)
      val big = time(out, q)
      println(f"$q%-24s $base%8.2f $big%8.2f  ${big / base}%5.2f")
    }
    spark.stop()
  }
}
