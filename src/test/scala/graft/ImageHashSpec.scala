package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ImageHash

/** Pinned-fixture properties of the perceptual image hash the DuckDB
  * oracle cannot express: the hash is computed from REAL decoded PNG
  * pixels (codec round-trip exact), two known-similar images (one
  * perturbed pixel) stay within the hamming gate AND share a band (so
  * the banded join actually finds them), and a known-distinct pair is
  * far outside it. Plus the resize leg: a 2× upscaled image box-averages
  * back to the identical signature.
  */
class ImageHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // monotone ramp: every adjacent comparison is "greater" → all 56 bits
  private val ramp: Array[Byte] = Array.tabulate(64)(k => (k * 4).toByte)

  private def bands(s: Long): Seq[Long] =
    (0 until ImageHash.Bands).map(i => (s >> (8 * i)) & 255L)

  test("dhash of the rendered PNG equals the hash of the raw samples") {
    // independent recompute straight from the byte pattern — the PNG
    // encode → ImageIO decode round trip must not move a single sample
    val s = ImageHash.dhash56(ImageHash.grayPng(ramp))
    var expect = 0L
    for (r <- 0 until 8; c <- 0 until 7) {
      val a = ramp(r * 8 + c) & 0xff
      val b = ramp(r * 8 + c + 1) & 0xff
      if (b > a) expect |= 1L << (r * 7 + c)
    }
    assert(s == expect)
    assert(s == (1L << 56) - 1, "monotone ramp must set all 56 bits")
  }

  test("a one-pixel perturbation stays inside the hamming gate and shares a band") {
    val perturbed = ramp.clone()
    // dip pixel (3,4): flips its two adjacent comparisons, nothing else
    perturbed(3 * 8 + 4) = 0
    val (a, b) = (ImageHash.dhash56(ImageHash.grayPng(ramp)),
      ImageHash.dhash56(ImageHash.grayPng(perturbed)))
    val ham = java.lang.Long.bitCount(a ^ b)
    assert(ham > 0, "perturbation must actually change the hash")
    assert(ham <= 6, s"one-pixel change must stay near-dup, hamming $ham")
    // the pigeonhole that makes the banded join lossless: ≤6 differing
    // bits over 7 bands leaves at least one band equal
    assert(bands(a).zip(bands(b)).exists { case (x, y) => x == y })
  }

  test("a distinct image is far outside the gate") {
    val reversed = ramp.reverse
    val (a, b) = (ImageHash.dhash56(ImageHash.grayPng(ramp)),
      ImageHash.dhash56(ImageHash.grayPng(reversed)))
    assert(java.lang.Long.bitCount(a ^ b) > 6)
  }

  test("area-average resize: a 2x upscale hashes identically") {
    // 16×16 RGB image, each 2×2 block a constant gray (v,v,v) — the
    // integer luma is exactly v, so the box average reproduces the 8×8
    // original and the signature must match bit for bit
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = ramp((y / 2) * 8 + (x / 2)) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    assert(ImageHash.dhash56(out.toByteArray) ==
      ImageHash.dhash56(ImageHash.grayPng(ramp)))
  }

  test("catalog query returns exact-dup image pairs at sf0.001") {
    val rows = SparkEntry.queries("q_image_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
    // brute-force recompute over the hashed signatures: the banded plan
    // must return EXACTLY the hamming ≤ 6 pair set
    val sig = ImageHash.dhashes(spark,
        graft.core.Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = (for {
      (ida, sa) <- sig; (idb, sb) <- sig
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (ida, idb)).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    rows.foreach(r => assert(r.getLong(2) <= 6))
  }
}
