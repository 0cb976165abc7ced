package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata. The Spark-side machinery —
  * schema, typed Datasets, partition-wise batch decode — is real, and
  * so is the decode for every codec the JDK itself carries:
  * [[realDecode]] sniffs magic bytes and reads PNG/JPEG/GIF/BMP
  * headers through `javax.imageio` and WAV through
  * `javax.sound.sampled` (both ship in the JDK — no external library
  * needed). Payloads that match no JDK codec (video containers, or the
  * synthetic text-byte stand-ins the test corpus uses) fall back to
  * [[fakeDecode]], the deterministic stub that keeps catalog oracles
  * reproducible. Swap in JNI/FFmpeg for the video leg without touching
  * anything else.
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

  /** REAL decode for JDK-supported codecs. Image formats go through
    * `ImageIO` (true pixel dimensions from the actual header); WAV goes
    * through `AudioSystem` (true frame count; width carries the sample
    * rate, height the channel count — the schema's two free dims).
    * Returns None when the payload matches no JDK codec or is corrupt —
    * the caller decides the fallback, so a truncated PNG degrades
    * loudly-typed instead of throwing mid-partition.
    */
  def realDecode(r: MediaRecord): Option[MediaMeta] = {
    val p = r.payload
    def magic(off: Int, bytes: Int*): Boolean =
      p.length >= off + bytes.length &&
        bytes.zipWithIndex.forall { case (b, i) => (p(off + i) & 0xff) == b }
    val sniffed: Option[String] =
      if (magic(0, 0x89, 'P', 'N', 'G')) Some("png")
      else if (magic(0, 0xff, 0xd8, 0xff)) Some("jpeg")
      else if (magic(0, 'G', 'I', 'F', '8')) Some("gif")
      else if (magic(0, 'B', 'M')) Some("bmp")
      else if (magic(0, 'R', 'I', 'F', 'F') && magic(8, 'W', 'A', 'V', 'E')) Some("wav")
      else None
    try sniffed.flatMap {
      case "wav" =>
        val aff = javax.sound.sampled.AudioSystem
          .getAudioFileFormat(new java.io.ByteArrayInputStream(p))
        Some(MediaMeta(r.doc_id, r.media_type, p.length.toLong,
          aff.getFormat.getSampleRate.toLong, aff.getFormat.getChannels.toLong,
          aff.getFrameLength.toLong, "wav"))
      case fmt =>
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
          .map(img => MediaMeta(r.doc_id, r.media_type, p.length.toLong,
            img.getWidth.toLong, img.getHeight.toLong, 1L, fmt))
    } catch { case _: Exception => None }
  }

  /** Real-first decode with the deterministic stub as fallback. */
  def decode(r: MediaRecord): MediaMeta = realDecode(r).getOrElse(fakeDecode(r))

  /** Partition-wise decode: one decoder "instance" per partition. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs init here, once per partition, then stream the batch
      it.map(decode)
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
