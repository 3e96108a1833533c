package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Sources

/** Batch sinks (SURVEY.md §2.1 S3, S7/S8 stand-ins).
  *
  * The reference writes CSV from its prep job (reference:
  * kafka/sort_the_source.py:38) and intends a Delta-on-MinIO lake plus
  * a warehouse layer (reference: streaming/spark_processor.py:42,
  * Docker/docker-compose.yml:73-87); offline, the faithful stand-in is
  * parquet, and the piece that actually matters at 100 TB is the
  * partition layout: gold tables are partitioned by a low-cardinality
  * date key so downstream readers get partition PRUNING (only matching
  * directories are listed, verified in SinksSpec).
  */
object Sinks {

  /** Recursive local-filesystem delete with a null guard (listFiles
    * returns null on I/O error, not an empty array). Shared by the
    * verify main and the streaming upsert sink.
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }

  /** S3: header CSV, the reference prep job's output contract. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S7/S8 stand-in: date-partitioned parquet gold table. `dateCol`
    * must be a yyyy-MM-dd string or date — it becomes the directory
    * key. maxRecordsPerFile guards against single-partition giant
    * files at scale.
    */
  def writeGold(df: DataFrame, path: String, dateCol: String): Unit =
    df.withColumn("p_date", date_format(col(dateCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", 5000000)
      .partitionBy("p_date")
      .parquet(path)

  /** Small-file compaction: rewrite a parquet directory into files of
    * roughly `targetFileBytes` each. Streaming sinks and per-batch
    * upserts accrete small files; at 100 TB a scan's task count (and
    * the NameNode/liststatus pressure) is proportional to file count,
    * so periodic compaction is part of operating the gold tables.
    *
    * Sizing reads the INPUT's on-disk footprint (compressed) and
    * coalesce()s — a narrow, shuffle-free repack; the rewrite cost is
    * one read + one write of the partition being compacted. Content is
    * unchanged (row-identical, any order).
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // self-heal a crash inside a PRIOR compact's swap window: if the
    // live path is gone but the backup survives, the backup IS the
    // table — restore it before doing anything else. (For a
    // swap-window-free protocol use ManifestTable, which commits by
    // manifest rename and never moves the live directory.)
    val healPath = new org.apache.hadoop.fs.Path(path + "_precompact")
    if (!fs.exists(hPath) && fs.exists(healPath))
      require(fs.rename(healPath, hPath),
        s"compact: found orphaned backup $healPath but could not restore it")
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    val old = new org.apache.hadoop.fs.Path(path + "_precompact")
    // a leftover backup from a crashed prior run would make the first
    // rename nest/fail silently — clear it up front (the live table at
    // `path` is still the source of truth at this point)
    if (fs.exists(old)) require(fs.delete(old, true),
      s"cannot clear stale backup $old")
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // same swap discipline as the upsert sink: the directory flips
    // from old to new layout in two renames, never a partial mix.
    // Hadoop rename reports failure by RETURNING false — each step is
    // checked, and the backup is deleted only after a verified swap
    // (a false anywhere leaves either the original or the backup
    // intact on disk).
    require(fs.rename(hPath, old), s"compact: backup rename failed for $path")
    if (!fs.rename(tmp, hPath)) {
      val restored = fs.rename(old, hPath)
      throw new IllegalStateException(
        s"compact: swap rename failed for $path" +
          (if (restored) " (original restored)"
           else s" AND restore failed — original preserved at $old"))
    }
    require(fs.delete(old, true), s"compact: backup cleanup failed at $old")
  }

  /** S8 warehouse egress — the named entry point for the reference
    * architecture's PostgreSQL tail (imgs/overall-architecture.png:
    * processor → warehouse → Grafana). A thin, contract-enforcing
    * wrapper over `df.write.jdbc`:
    *
    *  - fails FAST on the driver node when no JDBC driver on the
    *    classpath accepts the url (this offline container ships
    *    none), instead of launching a distributed write that dies in
    *    every task with a ClassNotFoundException;
    *  - bounds write parallelism (`maxConnections` → numPartitions):
    *    every task holds one warehouse connection, and a 1000-
    *    partition frame must not open 1000 of them;
    *  - batches rows (`batchSize` → JDBC batch inserts), the knob
    *    that dominates egress throughput.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                user: String = "", password: String = "",
                batchSize: Int = 10000,
                maxConnections: Int = 8): Unit = {
    require(url.startsWith("jdbc:"), s"not a JDBC url: $url")
    require(batchSize > 0 && maxConnections > 0,
      s"writeJdbc: batchSize/maxConnections must be positive")
    try java.sql.DriverManager.getDriver(url)
    catch {
      case e: java.sql.SQLException =>
        throw new IllegalStateException(
          s"writeJdbc: no JDBC driver on the classpath accepts '$url' — " +
            "ship the driver jar (e.g. org.postgresql:postgresql) via " +
            "--jars/extraClassPath before pointing the warehouse sink " +
            "at a real database", e)
    }
    val props = new java.util.Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    props.setProperty("batchsize", batchSize.toString)
    props.setProperty("numPartitions", maxConnections.toString)
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }

  /** S-format breadth: prove the ORC and JSON-lines source/sink pairs
    * preserve content END-TO-END, hash-gated against the parquet
    * original. The query reads orders from parquet, writes ORC, reads
    * it back, writes JSON lines, reads THAT back with the original
    * schema (schema-on-read — inference would widen timestamps to
    * strings), and aggregates; DuckDB computes the same aggregate
    * straight from the parquet table, so any loss anywhere in either
    * round trip (type narrowing, timestamp timezone shear, double
    * formatting) breaks the hash. Money is summed in exact integer
    * cents so FP addition order cannot differ between engines.
    *
    * ORC ships in spark-sql (no extra jar); JSON doubles round-trip
    * exactly (Jackson shortest-representation printing). Avro is
    * documented NOT available offline — the spark-avro connector jar
    * is absent from /opt/spark/jars, only avro-core for shuffle
    * internals.
    *
    * At 100 TB this query's shape is the lake-migration job: one scan
    * of the source format, one write of the target, both streaming
    * through executors with no driver materialization; the aggregate
    * tail is the row-count/checksum reconciliation every migration
    * runs.
    */
  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt_").toFile
    // scratch cleanup in finally: a failure mid-chain (disk full, a
    // schema regression under debug) must not leak two extra copies of
    // the orders table into /tmp across repeated iterations
    try {
      val orcPath = new java.io.File(tmp, "orders_orc").toString
      val jsonPath = new java.io.File(tmp, "orders_json").toString
      val o = Sources.orders(spark, dir)
      o.write.mode(SaveMode.Overwrite).orc(orcPath)
      val fromOrc = spark.read.orc(orcPath)
      fromOrc.write.mode(SaveMode.Overwrite).json(jsonPath)
      val fromJson = spark.read.schema(o.schema).json(jsonPath)
      val out = fromJson
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
          min(year(col("o_orderdate"))).as("min_year"),
          max(year(col("o_orderdate"))).as("max_year"),
          countDistinct(col("o_orderstatus")).as("n_status"))
        .orderBy(col("o_orderpriority"))
      // materialize BEFORE the finally deletes the scratch dirs (the
      // plan is lazy)
      out.localCheckpoint(eager = true)
    } finally deleteRecursively(tmp)
  }

  val formatRoundtripSql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
      |  CAST(min(year(o_orderdate)) AS INT) AS min_year,
      |  CAST(max(year(o_orderdate)) AS INT) AS max_year,
      |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Schema-evolution read — the lakehouse reality that a long-lived
    * table's early files lack columns added later: a v1 slice (even
    * order keys, 3 columns) and a v2 slice (odd keys, + order_year)
    * are written as separate parquet file sets, then read back as ONE
    * table with mergeSchema — v1 rows surface the evolved column as
    * NULL, v2 rows keep it, and the aggregation downstream treats
    * both generations uniformly (n_legacy counts pre-evolution rows).
    * The oracle replays the same two-generation semantics straight
    * off the base table, proving the merged read loses nothing.
    * Scale note: mergeSchema reconciles FOOTERS (one small job over
    * file metadata), not data; the scan itself stays columnar with
    * missing columns materialized as nulls per row group.
    */
  def schemaMerge(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sme_").toFile
    try {
      val v1Path = new java.io.File(tmp, "gen=1").toString
      val v2Path = new java.io.File(tmp, "gen=2").toString
      val o = Sources.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate")).as("order_year"))
      o.filter(col("o_orderkey") % 2 === 0)
        .drop("order_year") // the pre-evolution schema
        .write.mode(SaveMode.Overwrite).parquet(v1Path)
      o.filter(col("o_orderkey") % 2 =!= 0)
        .write.mode(SaveMode.Overwrite).parquet(v2Path)
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(v1Path, v2Path)
      val out = merged
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("cents")).as("cents"),
          count(when(col("order_year").isNull, 1)).as("n_legacy"),
          max(col("order_year")).as("max_year"))
        .orderBy(col("o_orderpriority"))
      out.localCheckpoint(eager = true)
    } finally deleteRecursively(tmp)
  }

  val schemaMergeSql: String =
    """SELECT o_orderpriority, count(*) AS n_rows,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents,
      |  count(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS n_legacy,
      |  CAST(max(CASE WHEN o_orderkey % 2 <> 0
      |           THEN year(o_orderdate) END) AS INT) AS max_year
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Upsert (MERGE) without a table format: rows of `updates` replace
    * key-matching rows of `target`; everything else passes through.
    * Anti-join + union — the updates side is usually small, so Spark
    * broadcasts it and the target never shuffles. (With a
    * transactional table format this becomes MERGE INTO; the plan
    * shape is the same.) Both inputs must share a schema.
    */
  def upsert(target: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame =
    target.join(updates, keys, "left_anti").unionByName(updates)

  /** Oracle-checked query: double urgent orders' price via upsert (x2 stays exact in binary, so rounding cannot diverge between engines); DuckDB
    * recomputes with a CASE expression — equality proves the
    * anti-join/union merge semantics (every key exactly once, updated
    * rows win).
    */
  def upsertOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Sources.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val updates = o.filter(col("o_orderpriority") === "1-URGENT")
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
    upsert(o, updates, Seq("o_orderkey"))
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderkey"))
  }

  val upsertOrdersSql: String =
    """SELECT o_orderkey,
      |  round(CASE WHEN o_orderpriority = '1-URGENT'
      |             THEN o_totalprice * 2.0 ELSE o_totalprice END, 2) AS price
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Time travel over [[ManifestTable]] snapshots: commit the orders
    * fact as version 1, commit an urgent-doubled revision as version
    * 2, then read BOTH versions back by version number and diff them —
    * the audit/rollback query a lakehouse table format exists to
    * answer ("what changed between yesterday's snapshot and today's").
    * Old files stay readable because a commit only publishes a new
    * manifest (atomic rename); nothing is rewritten in place.
    *
    * Exactness: cents are exact integers and the doubling is a
    * power-of-two, so the oracle recomputes the identical diff from
    * the raw table with a CASE — proving version isolation, not just
    * row counts. Scale shape: version reads list the manifest (a
    * driver-side file-name read, corpus-independent) and scan only
    * the referenced parquet; the diff is one equi-join keyed on the
    * primary key.
    */
  def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tt_").toFile
    try {
      val path = new java.io.File(tmp, "orders_tt").toString
      val o = Sources.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = ManifestTable.replace(o, path)
      val v2 = ManifestTable.replace(
        o.withColumn("cents",
          when(col("o_orderpriority") === "1-URGENT", col("cents") * 2)
            .otherwise(col("cents"))), path)
      val a = ManifestTable.read(spark, path, Some(v1))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("cents").as("cents_v1"))
      val b = ManifestTable.read(spark, path, Some(v2))
        .select(col("o_orderkey"), col("cents").as("cents_v2"))
      val out = a.join(b, Seq("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents_v1")).as("cents_v1"),
          sum(col("cents_v2")).as("cents_v2"),
          sum(when(col("cents_v1") =!= col("cents_v2"), 1L).otherwise(0L))
            .as("n_changed"))
        .withColumn("delta_cents", col("cents_v2") - col("cents_v1"))
        .withColumn("n_versions",
          lit(ManifestTable.versions(spark, path).size.toLong))
        .orderBy(col("o_orderpriority"))
      out.localCheckpoint(eager = true)
    } finally deleteRecursively(tmp)
  }

  val timeTravelSql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents_v1,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |           THEN 2 * CAST(round(o_totalprice * 100) AS BIGINT)
      |           ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
      |    AS BIGINT) AS cents_v2,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |                 AND round(o_totalprice * 100) <> 0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |           THEN CAST(round(o_totalprice * 100) AS BIGINT)
      |           ELSE 0 END) AS BIGINT) AS delta_cents,
      |  2 AS n_versions
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_upsert_orders" -> (upsertOrders _),
    "q_time_travel" -> (timeTravel _),
    "q_format_roundtrip" -> (formatRoundtrip _),
    "q_schema_merge" -> (schemaMerge _)
  )

  val oracles: Map[String, String] = Map(
    "q_upsert_orders" -> upsertOrdersSql,
    "q_time_travel" -> timeTravelSql,
    "q_format_roundtrip" -> formatRoundtripSql,
    "q_schema_merge" -> schemaMergeSql
  )
}
