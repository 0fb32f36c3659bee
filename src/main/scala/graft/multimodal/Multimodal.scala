package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal-column plumbing: media treated as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED (no image/audio codecs in this environment):
  * `decodeStub` derives a deterministic fake feature vector from the raw
  * bytes. Everything around it — the schema, the binary column handling,
  * the partition-batched iterator shape, the feature-vector output type —
  * is the real Spark plumbing a production decode UDF would drop into
  * (swap `decodeStub` for an actual codec call; signature unchanged).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])

  /** Extracted features: fixed-width vector + the id it belongs to. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

  val FeatureDim = 8

  /** Build the media table from `documents`: payload = UTF-8 bytes of the
    * text (a stand-in binary column; in production this is the image/audio
    * blob column of the source parquet). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      lit("application/octet-stream").as("mime"),
      octet_length(col("text")).cast(LongType).as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: deterministic fake features from raw bytes (per-8th
    * byte-bucket mass). A real implementation would decode the payload
    * (image decode / audio resample / video frame-sample) and emit real
    * features; only this function changes. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (payload != null && payload.length > 0) {
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) % FeatureDim) += 1.0f
        i += 1
      }
      var j = 0
      while (j < FeatureDim) { hist(j) /= payload.length; j += 1 }
    }
    hist
  }

  /** Partition-batched feature extraction: one iterator pass per partition
    * (the shape a heavyweight codec needs — per-partition init of the
    * decoder, streaming batches, no per-row setup cost). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("n_bytes"), col("payload")).as[MediaRow2]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (stub: nothing)
        rows.map(r => MediaFeatures(r.media_id, r.n_bytes, decodeStub(r.payload)))
      }
  }

  /** Row shape for the typed mapPartitions (payload last, no mime). */
  case class MediaRow2(media_id: Long, n_bytes: Long, payload: Array[Byte])

  /** Query surface: metadata + content hash of the binary payload —
    * deterministic, oracle-checkable proof the binary column round-trips. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("media_id"),
      col("n_bytes"),
      md5(col("payload")).as("content_md5"))
      .orderBy(col("media_id"))

  /** Feature extraction as a query: deterministic stub features, first 4
    * dims rounded — exercises the full binary → mapPartitions → typed
    * output pipeline. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val f = extractFeatures(mediaTable(spark, dir))
    f.toDF().select(
      col("media_id"), col("n_bytes"),
      round(element_at(col("features"), 1).cast(DoubleType), 4).as("f0"),
      round(element_at(col("features"), 2).cast(DoubleType), 4).as("f1"),
      round(element_at(col("features"), 3).cast(DoubleType), 4).as("f2"),
      round(element_at(col("features"), 4).cast(DoubleType), 4).as("f3"))
      .orderBy(col("media_id"))
  }

  /** q71 — media "resize": payload → smaller payload plus updated
    * metadata, the byte-domain stand-in for image downscaling (a codec
    * would decode, scale, re-encode; the stub keeps every `factor`-th
    * byte — deterministic, so the WHOLE transform including the new
    * content hash is oracle-checked). The plumbing a real resize needs is
    * all here: binary→binary map, metadata recomputation from the new
    * payload, original-vs-resized accounting. */
  def resize(spark: SparkSession, dir: String, factor: Int = 4): DataFrame =
    mediaTable(spark, dir)
      .where(col("n_bytes") > 0)
      .select(
        col("media_id"),
        col("n_bytes").as("orig_bytes"),
        // decode → char-domain downsample → re-encode (ASCII payloads,
        // so char positions == byte positions; a codec swaps this step)
        decode(col("payload"), "UTF-8").as("txt"))
      .select(
        col("media_id"), col("orig_bytes"),
        encode(expr(
          s"""array_join(transform(
             |  sequence(0, int(floor((length(txt) - 1) / $factor))),
             |  i -> substring(txt, i * $factor + 1, 1)), '')""".stripMargin),
          "UTF-8").as("small"))
      .select(
        col("media_id"), col("orig_bytes"),
        octet_length(col("small")).cast(LongType).as("small_bytes"),
        md5(col("small")).as("small_md5"))
      .orderBy(col("media_id"))

  /** q69 — frame sampling over the binary payload: every `every`-th
    * fixed-size chunk ("frame") of each blob becomes its own row — the
    * video-frame-sample shape (decode would replace the md5 with a codec
    * call; the row explosion, byte-slicing, and per-frame identity are
    * the real plumbing). Declarative slice: transform over the sampled
    * frame indices + substring on the BINARY column — one Generate, no
    * UDF. Deterministic byte math → DuckDB oracle (payloads are ASCII, so
    * the oracle's string substring sees the same bytes). */
  def frameSample(spark: SparkSession, dir: String,
                  frameBytes: Int = 32, every: Int = 4): DataFrame = {
    val stride = frameBytes * every
    mediaTable(spark, dir)
      .where(col("n_bytes") > 0)
      .select(col("media_id"), posexplode(expr(
        s"""transform(sequence(0, int(floor((n_bytes - 1) / $stride))),
           |          i -> substring(payload, i * $stride + 1, $frameBytes))"""
          .stripMargin)))
      .select(
        col("media_id"),
        (col("pos") * every).cast(IntegerType).as("frame_idx"),
        octet_length(col("col")).cast(IntegerType).as("frame_len"),
        md5(col("col")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))
  }
}
