package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for every source the engine supports.
  *
  * Parquet is the primary analytical format (columnar scan, predicate
  * pushdown, column pruning — all verified via .explain in the test
  * suite). CSV covers the reference's batch path (reference:
  * kafka/sort_the_source.py:13); Kafka/rate cover the streaming path
  * (reference: streaming/spark_processor.py:28-33, kafka/producer.py:47).
  */
object Sources {

  /** Parquet scan of one harness table (S9). Filters/projections placed
    * on the result reach the scan (PushedFilters / ReadSchema).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The harness events table stores `ts` as parquet TIMESTAMP(NANOS),
    * which Spark 4 rejects outright. Read nanos as LongType (legacy
    * conf) and convert via integer division — nanos-since-epoch exceeds
    * 2^53, so double math would silently lose microseconds.
    *
    * The `nanosAsLong` conf is pinned at session construction in
    * graft.spark.Sessions, so nanos columns uniformly arrive as longs
    * regardless of read order. The set below is a fallback for sessions
    * built elsewhere (e.g. the driver's own session passed to
    * SparkEntry.entry); it is session-wide and intentionally never
    * restored — order-dependent conf flips are the failure mode this
    * design removes.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) harness data, arriving as nanos longs
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] with isAdjustedToUTC=false: Spark 4 infers NTZ.
        // Session tz is pinned UTC, so this cast keeps the stored micros
        // bit-exact — the same instant DuckDB's naive read produces.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** CSV scan with header + inferred schema (S1) — the reference's batch
    * input path (reference: kafka/sort_the_source.py:13).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON-lines scan — the bounded twin of the Kafka JSON wire format
    * (reference: kafka/producer.py:24): one JSON object per line,
    * schema supplied explicitly so no inference pass over the data.
    */
  def jsonLines(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan — columnar alternative to parquet, same pushdown and
    * pruning behavior through the native reader.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Kafka streaming source (S5) — identical options to the reference
    * (reference: streaming/spark_processor.py:28-33). Not exercised in
    * the offline harness (no broker); the streaming test suite swaps in
    * MemoryStream with the same downstream plan.
    */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
                  startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Rate-paced replay source (T8) — stand-in for the reference's
    * 1 msg/s producer loop (reference: kafka/producer.py:11,47).
    */
  def rateStream(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
}
