package graft.ingest

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.ManifestTable

/** The manifest table as a STRUCTURED STREAMING SOURCE — the missing
  * half of the lakehouse lifecycle: [[graft.sinks.ManifestTable]]
  * tables are written by batch commits and streaming sinks
  * (foreachBatch upsert/append lanes); this DataSource-V2
  * `MicroBatchStream` lets DOWNSTREAM jobs subscribe to one, exactly
  * the role Delta's streaming source / change data feed plays
  * (reference: streaming/spark_processor.py:42 names Delta as the
  * lake intent).
  *
  * Offsets ARE manifest versions — the commit protocol already
  * totally orders the table's history, so the streaming offset needs
  * no second bookkeeping domain (the same identity Delta uses). A
  * micro-batch (from, to] emits the table's CHANGE FEED between the
  * two snapshots, mirroring [[graft.sinks.ManifestTable.changes]]
  * row for row:
  *
  *  - files added in the window → their rows, `_change_type=insert`,
  *    minus `to`'s deletion vectors on them;
  *  - files removed → their rows, `_change_type=delete`, minus
  *    `from`'s vectors (they were already logically gone);
  *  - vectors NEW in the window on files carried across it → exactly
  *    those positions, `_change_type=delete` (the line-level delta:
  *    old positions are never re-reported).
  *
  * The first batch (from = -1) is the initial load: the whole
  * snapshot as inserts. Planning is O(changed files) driver metadata
  * — carried files contribute NOTHING — and each changed FILE is one
  * input partition, so the read scales out with the delta, never the
  * table. Exactly-once falls out of immutability: a replayed batch
  * re-plans the same (from, to] against the same immutable manifests
  * and files. The retention contract is Delta's: [[graft.sinks
  * .ManifestTable.vacuum]] must keep enough versions to cover the
  * slowest subscriber's lag, or a restart fails loudly on the
  * missing manifest (never silently skips).
  *
  * Readers decode parquet via parquet-mr's Group API (the library
  * Spark itself ships) — a row-at-a-time path, fine for CHANGE
  * feeds, which are delta-sized by construction; the table's bulk
  * scans stay on Spark's vectorized reader. Supported column types:
  * the primitive set every graft table uses (long/int/double/float/
  * boolean/string/date/timestamp — both INT64-micros and legacy
  * INT96). Schema evolution composes: the feed carries the CURRENT
  * table schema and old files null-fill columns they predate, same
  * as the batch readers.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-table")
  *     .option("path", tablePath).load()
  * }}}
  */
class ManifestTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-table source: .option(\"path\", <manifest table path>) is required")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestStream.feedSchema(
      ManifestTable.read(SparkSession.active, pathOf(options)).schema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ManifestStreamTable(schema,
      pathOf(new CaseInsensitiveStringMap(properties)))
}

private[ingest] object ManifestStream {
  val ChangeCol = "_change_type"

  def feedSchema(table: StructType): StructType = {
    require(!table.fieldNames.contains(ChangeCol),
      s"graft-table source: the table already has a '$ChangeCol' column")
    table.add(ChangeCol, StringType, nullable = false)
  }
}

private[ingest] class ManifestStreamTable(schema: StructType, path: String)
    extends Table with SupportsRead {

  override def name(): String = s"graft-table($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def description(): String = name()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ManifestMicroBatchStream(path, schema)
      }
    }
}

/** Streaming offset = manifest version (-1 = before the table). */
private[ingest] case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** One changed file of the window. `skipPositions` (sorted) are
  * vector-deleted rows to OMIT; when `onlyPositions` is nonempty the
  * partition emits EXACTLY those positions instead (the vector-delta
  * delete slice). Both are driver-collected from vector sidecars,
  * bounded by the materialization policy that keeps vectors small.
  */
private[ingest] case class ManifestChangePartition(
    filePath: String, changeType: String,
    skipPositions: Array[Long], onlyPositions: Array[Long])
  extends InputPartition

private[ingest] class ManifestMicroBatchStream(path: String,
                                               schema: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  /** Trigger.AvailableNow: pin the end offset at trigger time so the
    * run drains exactly the versions that existed when it started,
    * then stops — concurrent commits land in the next run.
    */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(
      ManifestTable.latestVersion(spark, path).getOrElse(-1L))

  override def initialOffset(): Offset = VersionOffset(-1L)

  override def latestOffset(): Offset =
    VersionOffset(availableNowCap.getOrElse(
      ManifestTable.latestVersion(spark, path).getOrElse(-1L)))

  /** Admission control (the interface Trigger.AvailableNow rides):
    * no rate limiting — a window's versions are processed whole, so
    * the feed's net-file-diff semantics hold per batch.
    */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Positions deleted by the given `#dv` entries, grouped by target,
    * restricted to `targets`. Driver-collected: live vectors are
    * delta-sized by the materialize policy.
    */
  private def positionsByTarget(entries: Seq[(String, String, Long)],
                                targets: Set[String]): Map[String, Array[Long]] = {
    val relevant = entries.filter(e => targets.contains(e._2))
    if (relevant.isEmpty) Map.empty
    else {
      import org.apache.spark.sql.functions.col
      spark.read
        .parquet(relevant.map(_._1).distinct
          .map(n => s"$path/data/$n"): _*)
        .filter(col("_dv_file").isInCollection(relevant.map(_._2).distinct))
        .collect()
        .groupBy(_.getString(0))
        .view.mapValues(_.map(_.getLong(1)).distinct.sorted).toMap
    }
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VersionOffset].v
    val to = end.asInstanceOf[VersionOffset].v
    if (to < 0 || from >= to) return Array.empty
    val fromFiles =
      if (from < 0) Set.empty[String]
      else ManifestTable.snapshotFiles(spark, path, Some(from)).toSet
    val toFiles = ManifestTable.snapshotFiles(spark, path, Some(to)).toSet
    val added = (toFiles -- fromFiles).toSeq.sorted
    val removed = (fromFiles -- toFiles).toSeq.sorted
    val toDv = ManifestTable.dvEntries(spark, path, Some(to))
    val fromDv =
      if (from < 0) Seq.empty[(String, String, Long)]
      else ManifestTable.dvEntries(spark, path, Some(from))
    val addSkip = positionsByTarget(toDv, added.toSet)
    val remSkip = positionsByTarget(fromDv, removed.toSet)
    // vector-delta deletes: lines new in the window on carried files
    val fromDvSet = fromDv.toSet
    val carried = fromFiles intersect toFiles
    val delta = toDv.filterNot(fromDvSet)
      .filter(e => carried.contains(e._2))
    val deltaPos = positionsByTarget(delta, delta.map(_._2).toSet)
    val empty = Array.empty[Long]
    val parts =
      added.map(n => ManifestChangePartition(s"$path/data/$n", "insert",
        addSkip.getOrElse(n, empty), empty)) ++
      removed.map(n => ManifestChangePartition(s"$path/data/$n", "delete",
        remSkip.getOrElse(n, empty), empty)) ++
      deltaPos.toSeq.sortBy(_._1).map { case (n, pos) =>
        ManifestChangePartition(s"$path/data/$n", "delete", empty, pos)
      }
    parts.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestChangeReaderFactory(schema)
}

private[ingest] class ManifestChangeReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestChangeReader(
      partition.asInstanceOf[ManifestChangePartition], schema)
}

/** Row-at-a-time parquet decode via parquet-mr Groups, tracking the
  * in-file position so deletion vectors apply by ordinal — the same
  * position `_metadata.row_index` exposes on the vectorized path.
  */
private[ingest] class ManifestChangeReader(p: ManifestChangePartition,
                                           schema: StructType)
    extends PartitionReader[InternalRow] {

  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private val reader: ParquetReader[Group] = ParquetReader
    .builder(new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(p.filePath))
    .withConf(new org.apache.hadoop.conf.Configuration())
    .build()

  private val dataFields = schema.fields.dropRight(1) // last = _change_type
  private val changeTag = UTF8String.fromString(p.changeType)
  private var pos = -1L
  private var current: Group = _

  private def accept(i: Long): Boolean =
    if (p.onlyPositions.nonEmpty)
      util.Arrays.binarySearch(p.onlyPositions, i) >= 0
    else util.Arrays.binarySearch(p.skipPositions, i) < 0

  override def next(): Boolean = {
    var g = reader.read()
    pos += 1
    while (g != null && !accept(pos)) { g = reader.read(); pos += 1 }
    current = g
    g != null
  }

  /** INT96 legacy timestamp: 8-byte little-endian nanos-of-day +
    * 4-byte little-endian julian day → epoch micros.
    */
  private def int96Micros(bytes: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }

  // OPTIMIZATION r14 (guide §1.2 step 2, per-task work): one partition
  // is one parquet file, so the file's MessageType — and with it every
  // field's index, its presence (schema evolution), the DataType
  // dispatch, and the INT96-vs-INT64 probe — is CONSTANT across the
  // partition's rows. The old get() re-resolved all of that per CELL
  // (two string-keyed schema lookups + a DataType match per value);
  // on the initial-snapshot load, where this reader decodes the whole
  // table, that was the dominant per-row cost. The decode plan hoists
  // it to once per file: an array of per-column closures, leaving per
  // cell only the null check and the primitive accessor.
  private var decoders: Array[Group => Any] = _

  private def buildDecoders(
      fileType: org.apache.parquet.schema.GroupType): Array[Group => Any] =
    dataFields.map { f =>
      // schema evolution: a file written before the column existed
      // simply lacks the field — null-fill, as the batch read does
      if (!fileType.containsField(f.name)) (_: Group) => null
      else {
        val fi = fileType.getFieldIndex(f.name)
        val read: Group => Any = f.dataType match {
          case LongType => (g: Group) => g.getLong(fi, 0)
          case IntegerType => (g: Group) => g.getInteger(fi, 0)
          case DoubleType => (g: Group) => g.getDouble(fi, 0)
          case FloatType => (g: Group) => g.getFloat(fi, 0)
          case BooleanType => (g: Group) => g.getBoolean(fi, 0)
          case StringType =>
            (g: Group) => UTF8String.fromBytes(g.getBinary(fi, 0).getBytes)
          case DateType => (g: Group) => g.getInteger(fi, 0)
          case TimestampType =>
            if (fileType.getType(fi).asPrimitiveType().getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96)
              (g: Group) => int96Micros(g.getInt96(fi, 0).getBytes)
            else (g: Group) => g.getLong(fi, 0) // INT64 micros annotation
          case dt => throw new UnsupportedOperationException(
            s"graft-table source: column '${f.name}' of type " +
              s"${dt.simpleString} is outside the supported primitive set")
        }
        (g: Group) => if (g.getFieldRepetitionCount(fi) == 0) null else read(g)
      }
    }

  override def get(): InternalRow = {
    val g = current
    if (decoders == null) decoders = buildDecoders(g.getType)
    val out = new Array[Any](schema.length)
    var i = 0
    while (i < decoders.length) {
      out(i) = decoders(i)(g)
      i += 1
    }
    out(schema.length - 1) = changeTag
    new GenericInternalRow(out)
  }

  override def close(): Unit = reader.close()
}
