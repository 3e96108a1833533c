package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

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
}
