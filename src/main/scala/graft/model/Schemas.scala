package graft.model

import org.apache.spark.sql.types._

/** Canonical engine schemas.
  *
  * The sensor schema mirrors the StructType the reference streaming job
  * declares (reference: streaming/spark_processor.py:18-24). The wire
  * format is key-less JSON with ALL values as strings (reference:
  * kafka/producer.py:24,37,43), so parsing must coerce quoted numerics.
  */
object Schemas {

  /** Typed sensor event — reference streaming/spark_processor.py:18-24. */
  final case class SensorReading(
      sensor_id: String,
      timestamp: java.sql.Timestamp,
      ph_value: Option[Float],
      do_value: Option[Float],
      tds_value: Option[Float]
  )

  /** Explicit StructType, field-for-field with the reference schema. */
  val sensorSchema: StructType = StructType(Seq(
    StructField("sensor_id", StringType),
    StructField("timestamp", TimestampType),
    StructField("ph_value", FloatType),
    StructField("do_value", FloatType),
    StructField("tds_value", FloatType)
  ))

  /** Wire-side field names as the producer actually emits them
    * (reference: kafka/sorted_water_quality.csv:1, kafka/producer.py:37)
    * mapped to the canonical sensor schema (SURVEY.md §1.3).
    */
  val wireToCanonical: Seq[(String, String)] = Seq(
    "WaterbodyName" -> "sensor_id",
    "FullDate" -> "timestamp",
    "pH" -> "ph_value",
    "Dissolved Oxygen" -> "do_value",
    "Conductivity @25°C" -> "tds_value"
  )

  /** Wire schema: every field a string, as csv.DictReader produces
    * (reference: kafka/producer.py:37).
    */
  val wireSchema: StructType = StructType(
    wireToCanonical.map { case (wire, _) => StructField(wire, StringType) }
  )

  /** Star-schema + extension table names shipped by the test harness. */
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )
}
