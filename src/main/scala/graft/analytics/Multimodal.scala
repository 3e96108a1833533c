package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Sources

/** Multimodal column plumbing (builder mandate: image/audio/video as
  * opaque binary columns with typed metadata).
  *
  * The decode step is STUBBED — this container ships no codec
  * libraries, so [[decodeStub]] produces a deterministic fake feature
  * vector from the bytes. Everything AROUND the stub is real and
  * tested: the schema, the binaryFile source, the mapPartitions batch
  * shape (one iterator per partition — where a real implementation
  * amortizes codec/model setup), the partitioning strategy, and the
  * downstream aggregation plan.
  *
  * Scale notes (100 TB of media): records carry bytes, so the governing
  * knob is bytes-per-partition, not rows — repartitionForDecode targets
  * a byte budget; feature extraction is narrow (no shuffle); only the
  * small (media_id, features) projection ever shuffles.
  */
object Multimodal {

  /** Opaque media payload + typed metadata (binary column contract). */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int,          // image/video
      height: Int,         // image/video
      sample_rate: Int,    // audio
      duration_ms: Int)    // audio/video

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float])

  val FeatureDim = 16

  /** Deterministic stand-in for decode + feature extraction: a rolling
    * polynomial hash of the payload bytes folded into [[FeatureDim]]
    * float lanes in [-1, 1]. A real deployment swaps ONLY this
    * function for a codec + model call; the signature (bytes in, fixed
    * -width float vector out) is the real contract.
    */
  def decodeStub(content: Array[Byte], dim: Int = FeatureDim): Array[Float] = {
    val acc = new Array[Long](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) {
      h = h * 31 + (content(i) & 0xff)
      acc(i % dim) ^= h
      i += 1
    }
    acc.map(a => (a.toDouble / Long.MaxValue).toFloat)
  }

  /** "Resize" analog: average-pool a feature vector down to `outDim`
    * lanes — the deterministic twin of image downscaling.
    */
  def pool(features: Array[Float], outDim: Int): Array[Float] = {
    require(outDim > 0 && features.length % outDim == 0,
      s"pool: ${features.length} not divisible by $outDim")
    val stride = features.length / outDim
    Array.tabulate(outDim) { o =>
      var s = 0.0f
      var k = 0
      while (k < stride) { s += features(o * stride + k); k += 1 }
      s / stride
    }
  }

  /** "Frame sample" analog: every `stride`-th lane — the deterministic
    * twin of video frame sampling.
    */
  def frameSample(features: Array[Float], stride: Int): Array[Float] =
    Array.tabulate((features.length + stride - 1) / stride)(k => features(k * stride))

  /** Partition the payload dataset by a byte budget — the decode stage
    * is bytes-bound, not row-bound. One shuffle, after which extraction
    * is narrow.
    */
  def repartitionForDecode(ds: Dataset[MediaRecord],
                           totalBytes: Long,
                           targetBytesPerPartition: Long = 64L << 20): Dataset[MediaRecord] = {
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    ds.repartition(parts, col("media_id"))
  }

  /** Feature extraction with the real batch shape: mapPartitions gives
    * one iterator per partition so a real codec/model loads once per
    * partition, then streams records — the Scala analog of the
    * mapInPandas batch contract.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition setup would happen here (codec init, model load)
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.content.length,
          decodeStub(r.content))
      }
    }
  }

  /** Rows-only harness query: treat each document's UTF-8 bytes as an
    * opaque payload, run the full decode→feature→aggregate plumbing,
    * and roll up feature norms per source. Exercises the real plan
    * (binary cast, mapPartitions extraction, final aggregation) on
    * driver-shipped data.
    */
  def mediaFeatureRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // carry the grouping key THROUGH the extraction as the tuple's
    // second element — one scan, no re-join to recover `source`
    // (a second scan + shuffle join would be a full extra pass over
    // the corpus at scale)
    val media = Sources.documents(spark, dir)
      .select(
        struct(col("doc_id").as("media_id"), lit("image").as("kind"),
          col("text").cast("binary").as("content"),
          lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sample_rate"), lit(0).as("duration_ms")).as("_1"),
        col("source").as("_2"))
      .as[(MediaRecord, String)]
    val feats = media.mapPartitions { it =>
      // per-partition setup point (codec init, model load)
      it.map { case (r, source) =>
        (r.media_id, source, r.content.length, decodeStub(r.content))
      }
    }.toDF("media_id", "source", "n_bytes", "features")
      .withColumn("norm",
        sqrt(aggregate(transform(col("features"),
          x => x.cast("double") * x), lit(0.0), (a, v) => a + v)))
    feats
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        round(avg(col("n_bytes")), 2).as("avg_bytes"),
        round(avg(col("norm")), 6).as("avg_feat_norm"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> (mediaFeatureRollup _)
  )

  /** No oracle: the feature stub is hash-defined; spec-verified. */
  val oracles: Map[String, String] = Map.empty
}
