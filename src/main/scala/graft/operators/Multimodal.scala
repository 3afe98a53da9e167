package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column carriage (SURVEY.md §2.11 E5; BASELINE north star):
  * image/audio/video payloads ride through the engine as opaque `binary`
  * columns with a typed metadata struct — the reference's `image` URL column
  * (pet_scraper.py:279, 294-296) generalized to in-band payloads.
  *
  * The DECODE step is a stub by design: the real image/audio libraries are
  * not in this environment, so [[fakeDecode]] is a deterministic placeholder
  * while everything Spark-side — schema, batch iteration, partitioning, the
  * executor-side mapPartitions plumbing — is real and tested. Swap
  * [[fakeDecode]] for a JNI/FFI decoder and nothing else changes.
  *
  * Scale posture (100 TB): payloads never pass through the driver; feature
  * extraction is `mapPartitions` (one decoder init per partition, streamed
  * row iteration — the Scala analog of a batched `mapInPandas` decode); all
  * scalar byte-level features are codegen'd built-ins.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),       // e.g. "png", "wav"
    StructField("n_bytes", LongType)))

  /** Attach a payload column (binary) + metadata struct derived from a string
    * column — the ingestion boundary where fetched bytes enter the table.
    * Real pipelines put fetched media here; tests derive bytes from text so
    * the plumbing is exercised end-to-end without a fetcher.
    */
  def attachPayload(df: DataFrame, src: String, mediaType: String, format: String): DataFrame =
    df
      .withColumn("payload", encode(coalesce(col(src), lit("")), "UTF-8"))
      .withColumn("meta", struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  /** Feature schema produced by the (stubbed) decoder. */
  val FeatureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", LongType)))

  /** STUB — deterministic fake decoder. A real build replaces this body with
    * the native decode (libjpeg/ffmpeg/…); signature and call sites stay.
    * Derives pseudo-dimensions and a checksum from the bytes so tests have
    * stable expectations.
    */
  private[graft] def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    val n = if (payload == null) 0 else payload.length
    val checksum = {
      var acc = 1125899906842597L // large prime seed
      var i = 0
      while (i < n) { acc = acc * 31 + payload(i); i += 1 }
      acc
    }
    (n % 1024 + 1, n % 768 + 1, checksum)
  }

  /** Executor-side feature extraction over payload batches: one decoder
    * "session" per partition (where a real decoder would init its native
    * context once), then streamed row-at-a-time decode — the mapPartitions
    * shape that keeps memory flat regardless of partition size.
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("features", FeatureType))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // real decoder: init native context here, close on iterator end
      rows.map { row =>
        val (w, h, c) = fakeDecode(row.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(row.toSeq :+ Row(w, h, c))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Frame/sample selection for time-series media: keep every `stride`-th
    * unit per document — expressed as a pure column op (posexplode + modulo)
    * so Catalyst sees through it; no decoder involvement.
    */
  def sampleUnits(df: DataFrame, unitsCol: String, stride: Int): DataFrame =
    df
      .select(col("*"), posexplode(col(unitsCol)).as(Seq("unit_idx", "unit")))
      .filter(col("unit_idx") % stride === 0)
      .drop(unitsCol)
}
