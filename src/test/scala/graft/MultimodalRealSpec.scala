package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRecord

/** REAL media decode through the JDK codecs: a PNG written by ImageIO
  * and a WAV written by AudioSystem round-trip through the partition-
  * wise decoder and come back with their TRUE dimensions; corrupt or
  * unknown payloads degrade to the deterministic stub instead of
  * throwing mid-partition.
  */
class MultimodalRealSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => img.setRGB(x, 0, x * 7919))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(frames: Int, sampleRate: Float, channels: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("JDK codecs decode real PNG and WAV payloads to true dimensions") {
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, "image", pngBytes(37, 11)),
      MediaRecord(2L, "audio", wavBytes(4410, 44100f, 2)),
      MediaRecord(3L, "image", "not a real codec payload".getBytes("UTF-8")),
      MediaRecord(4L, "image", pngBytes(5, 5).take(16)) // truncated PNG
    )
    val metas = Multimodal.decodeMeta(spark.createDataset(records))
      .collect().map(m => m.doc_id -> m).toMap

    val png = metas(1L)
    assert((png.width, png.height, png.n_frames, png.format) == (37L, 11L, 1L, "png"))

    val wav = metas(2L)
    assert((wav.width, wav.height, wav.n_frames, wav.format) == (44100L, 2L, 4410L, "wav"))

    // no JDK codec matches → deterministic stub, not an exception
    assert(metas(3L) == Multimodal.fakeDecode(records(2)))
    // corrupt header → loud-typed fallback, same rule
    assert(metas(4L) == Multimodal.fakeDecode(records(3)))
  }
}
