package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * bytes. Everything around the stub — the schema, the typed Dataset
  * boundary, the mapPartitions batch shape, the partitioning story — is the
  * real Spark plumbing a production decode (JNI/ONNX/ffmpeg per executor)
  * would plug into: swap `fakeDecode` for the real library call and nothing
  * else changes.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (width/height/etc are fake in the stub). */
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, byte_sum: Long, width: Int, height: Int)

  /** A deterministic stand-in for a media-decode call. Marked STUB: real
    * decode would parse the payload with an image/audio codec here. */
  private def fakeDecode(r: MediaRow): MediaFeatures = {
    var s = 0L
    var i = 0
    while (i < r.payload.length) { s += (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(r.media_id, r.kind, r.payload.length, s,
      width = (s % 1920).toInt, height = (s % 1080).toInt)
  }

  /** Batch feature extraction: one decoder init per partition (the
    * expensive part for real codecs), streaming rows through it. Executors
    * each handle their partitions independently — scales with the cluster. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = HeavyCodec.init() once per partition
      rows.map(fakeDecode)
    }
  }

  /** Frame sampling for video-like payloads: explode n deterministic frame
    * offsets per row; each frame keeps a byte-slice hash so downstream
    * dedup/similarity can run on frames like any other column. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val stride = math.max(1, r.payload.length / nFrames)
      (0 until nFrames).iterator.map { f =>
        val off = f * stride
        val end = math.min(r.payload.length, off + stride)
        // payloads shorter than nFrames leave trailing frames EMPTY
        // (offset past the payload, zero bytes, seed hash) — matching the
        // frameSlices twin's empty-substring behavior, never a negative
        // byte count
        var h = 1125899906842597L // deterministic FNV-ish slice hash (stub)
        var i = off
        while (i < end) { h = h * 31 + (r.payload(i) & 0xff); i += 1 }
        (r.media_id, f, off, math.max(0, end - off), h)
      }
    }.toDF("media_id", "frame_idx", "offset", "n_bytes", "frame_hash")
  }

  /** Aspect-preserving resize planning over extracted features: fit each
    * (width, height) into a maxW x maxH box with integer permille math
    * (deterministic, no floating point). Never upscales. A production
    * pipeline runs the actual pixel resample inside the per-partition
    * codec (extractFeatures' mapPartitions); the planned dimensions and
    * the column shape are exactly what it consumes. */
  def resizePlan(feats: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame = {
    val w = col("width")
    val h = col("height")
    // integer permille scale: floor of exact small-int division (values
    // stay far below 2^53, so floor(a/b) == a div b, deterministically)
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      floor(a / b).cast("long")
    val scale = least(lit(1000L),
      when(w > 0, idiv(lit(maxW.toLong) * 1000L, w)).otherwise(lit(1000L)),
      when(h > 0, idiv(lit(maxH.toLong) * 1000L, h)).otherwise(lit(1000L)))
    feats.toDF().select(col("media_id"), col("kind"), w, h,
        scale.as("scale_permille"))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("scale_permille"),
        idiv(w * col("scale_permille"), lit(1000L)).cast("int").as("out_width"),
        idiv(h * col("scale_permille"), lit(1000L)).cast("int").as("out_height"))
  }

  /** Column-level frame sampling over text payloads — the engine-checkable
    * twin of [[sampleFrames]]: same offset/stride math, but the slice
    * fingerprint is the md5-based 60-bit hash (cross-engine) instead of
    * the JVM rolling hash, and slicing is character-based so any engine
    * computes identical frames. Pure column expressions: stays in
    * whole-stage codegen, one explode per document. */
  def frameSlices(docs: DataFrame, nFrames: Int = 4): DataFrame = {
    val stride = greatest(lit(1),
      expr(s"length(text) div $nFrames").cast("int"))
    docs.select(col("doc_id").as("media_id"), col("text"),
        stride.as("stride"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * col("stride")).as("offset"),
        col("text").substr(col("frame_idx") * col("stride") + 1,
          col("stride")).as("slice"))
      .select(col("media_id"), col("frame_idx"), col("offset"),
        length(col("slice")).as("n_chars"),
        TextKit.md5Long(col("slice")).as("frame_hash"))
  }

  /** Build a media table from the documents fixture: text bytes stand in
    * for payloads. Demonstrates the schema + partitioning (hash by id so
    * payload batches spread evenly regardless of size skew). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame,
      partitions: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        concat(lit("img/"), col("source")).as("kind"),
        col("text").cast("binary").as("payload"))
      .repartition(partitions, col("media_id"))
      .as[MediaRow]
  }
}
