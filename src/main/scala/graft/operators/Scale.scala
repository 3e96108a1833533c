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
    """SELECT split, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM (
      |  SELECT o_totalprice,
      |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid'
      |         ELSE 'test' END AS split
      |  FROM (SELECT o_totalprice,
      |          CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
      |               AS BIGINT) % 100 AS b
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
    """SELECT doc_id, lang, source
      |FROM (
      |  SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |         AS BIGINT) % 100 AS b,
      |    CASE WHEN lang = 'es' THEN 25.0 WHEN lang = 'en' THEN 50.0
      |         ELSE 10.0 END AS threshold
      |  FROM documents
      |)
      |WHERE b < threshold
      |ORDER BY doc_id""".stripMargin

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_revenue" -> (saltedRevenue _),
    "q_order_split" -> (orderSplit _),
    "q_stratified_sample" -> (stratifiedDocSample _)
  )

  val oracles: Map[String, String] = Map(
    "q_salted_revenue" -> saltedRevenueSql,
    "q_order_split" -> orderSplitSql,
    "q_stratified_sample" -> stratifiedDocSampleSql
  )
}
