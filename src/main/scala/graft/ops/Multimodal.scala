package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata. The Spark-side machinery —
  * schema, typed Datasets, partition-wise batch decode — is real; the
  * codec itself is a STUB (`fakeDecode`): this container has no
  * image/audio libraries, so the decoder derives deterministic fake
  * dimensions from the payload bytes. Swap `fakeDecode` for a real
  * JNI/FFmpeg/ImageIO call (or a Pandas UDF via `mapInPandas` on the
  * PySpark side) without touching anything else.
  *
  * Scale notes: decode runs via `mapPartitions` so each task
  * amortizes codec init across its whole partition (the same batch
  * shape `mapInPandas` gives Python); payloads never pass through a
  * shuffle — metadata extraction happens before any wide operation, and
  * downstream ops carry only the small typed meta columns.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      format: String)

  /** STUB decoder — deterministic fake dimensions from byte length.
    * Replace with a real codec; the signature (whole-partition iterator
    * → iterator) is the production shape.
    */
  def fakeDecode(r: MediaRecord): MediaMeta = {
    val n = r.payload.length.toLong
    val (w, h, frames, fmt) = r.media_type match {
      case "image" => (64 + n % 577, 64 + (n * 31) % 577, 1L, "png")
      case "audio" => (0L, 0L, 1L, "wav")
      case _       => (64 + n % 577, 64 + (n * 31) % 577, n / 100 + 1, "mp4")
    }
    MediaMeta(r.doc_id, r.media_type, n, w, h, frames, fmt)
  }

  /** Partition-wise decode: one decoder "instance" per partition. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs init here, once per partition, then stream the batch
      it.map(fakeDecode)
    }
  }

  /** Build a media table from the documents table: payload = UTF-8
    * bytes of the text (the stand-in for real image/audio/video bytes),
    * media type assigned deterministically by doc id.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB feature extractor: a deterministic 8-dim float "embedding"
    * from the first payload bytes (scaled to [0,1]); the real system
    * plugs a vision/audio model here. Runs in the same partition-wise
    * shape as [[decodeMeta]].
    */
  def extractFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val f = (0 until 8).map { i =>
          if (i < r.payload.length) (r.payload(i) & 0xff) / 255.0f else 0.0f
        }.toArray
        (r.doc_id, f)
      }
    }.toDF("doc_id", "features")
  }

  /** STUB resize: recompute target dims preserving the fake aspect
    * ratio, capped at `maxSide` (pure metadata arithmetic — a real
    * implementation rescales pixels partition-wise).
    */
  def resizeMeta(meta: Dataset[MediaMeta], maxSide: Long): DataFrame = {
    import meta.sparkSession.implicits._
    meta.map { m =>
      val side = math.max(m.width, m.height)
      val (w2, h2) =
        if (side <= maxSide || side == 0) (m.width, m.height)
        else (m.width * maxSide / side, m.height * maxSide / side)
      (m.doc_id, m.media_type, m.width, m.height, w2, h2)
    }.toDF("doc_id", "media_type", "width", "height", "rs_width", "rs_height")
  }

  /** Frame sampling: every `step`-th frame index of each video. */
  def sampleFrames(meta: Dataset[MediaMeta], step: Int): DataFrame =
    meta.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong))).as("frame_idx"))
}
