package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing over REAL decoded pixels — the
  * content-grain complement to the metadata-only multimodal dedup
  * (`catalog/MultimodalMeta`): two images that differ by a few pixels
  * hash within a small hamming distance, so near-dup detection runs as
  * a banded equi-join on hash bands (the `functions/SimHash60` /
  * Manku-style blocking), never an all-pairs pixel compare.
  *
  * The hash is a gradient hash (dHash): normalize to an 8×8 grayscale
  * raster (area-average downscale for larger inputs — a real resize,
  * not metadata arithmetic), then emit one bit per horizontally
  * adjacent pixel pair, bit(r,c) = gray(r,c+1) > gray(r,c) — 8 rows ×
  * 7 comparisons = a 56-bit signature. 56 bits (not the canonical 64)
  * keeps the sign bit of a 64-bit long clear, so band extraction and
  * XOR/bit_count hamming are identical on every engine without
  * unsigned-shift gymnastics (same reasoning as the 60-bit simhash).
  *
  * The decode is genuinely exercised: payloads are real PNG bytes and
  * every hash goes BufferedImage → raster samples. The test corpus
  * carries no image files, so [[imagesFromDocuments]] RENDERS a
  * deterministic 8×8 gray PNG per image-typed doc (pixel (r,c) = text
  * byte at (r·8+c) mod len — the corpus is pure ASCII, so the oracle
  * reproduces the exact sample values from codepoints); PNG grayscale
  * is lossless, so encode → decode → hash is bit-reproducible.
  *
  * Scale notes: hashing is a partition-local map (codec init amortized
  * per partition, payloads never shuffle — only the 8-byte signature
  * does); the near-dup join shuffles (band_idx, band_val, doc_id)
  * rows. Pigeonhole: hamming ≤ 6 over 7 disjoint 8-bit bands forces at
  * least one equal band, so the banded candidate set is LOSSLESS for
  * the ≤ 6 verify — exactly the q_simhash60_neardup argument.
  */
object ImageHash {

  val Side = 8
  val Bits: Int = Side * (Side - 1) // 56 per direction; 112 total
  val Bands = 7
  val BandBits = 16

  /** Render the deterministic 8×8 grayscale PNG for a doc's bytes:
    * sample (r,c) = b[(r·8+c) mod b.length]. Real codec output — the
    * bytes start with the PNG magic and round-trip through ImageIO.
    */
  def grayPng(b: Array[Byte]): Array[Byte] = {
    require(b.nonEmpty, "empty payload")
    val img = new BufferedImage(Side, Side, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var r = 0
    while (r < Side) {
      var c = 0
      while (c < Side) {
        raster.setSample(c, r, 0, b((r * Side + c) % b.length) & 0xff)
        c += 1
      }
      r += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** 8×8 gray raster from any decodable image: exact samples when the
    * input is already 8×8 grayscale; otherwise luma (ITU-R 601 integer
    * weights) + area-average box downscale — integer arithmetic only,
    * so the resize is deterministic across JVMs.
    */
  private[ops] def gray8x8(img: BufferedImage): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](Side * Side)
    if (w == Side && h == Side && img.getType == BufferedImage.TYPE_BYTE_GRAY) {
      val raster = img.getRaster
      var i = 0
      while (i < out.length) {
        out(i) = raster.getSample(i % Side, i / Side, 0)
        i += 1
      }
    } else {
      var r = 0
      while (r < Side) {
        val y0 = r * h / Side; val y1 = math.max((r + 1) * h / Side, y0 + 1)
        var c = 0
        while (c < Side) {
          val x0 = c * w / Side; val x1 = math.max((c + 1) * w / Side, x0 + 1)
          var sum = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              // integer luma: (299 R + 587 G + 114 B) / 1000
              sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
              n += 1; x += 1
            }
            y += 1
          }
          out(r * Side + c) = (sum / n).toInt
          c += 1
        }
        r += 1
      }
    }
    out
  }

  /** Decode image bytes and hash: 56-bit gradient signature, bit
    * (r·7+c) set iff gray(r,c+1) > gray(r,c). Throws on undecodable
    * bytes — callers feed real images by construction.
    */
  def dhash56(imageBytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(imageBytes))
    require(img != null, "undecodable image bytes")
    val g = gray8x8(img)
    var s = 0L
    var r = 0
    while (r < Side) {
      var c = 0
      while (c < Side - 1) {
        if (g(r * Side + c + 1) > g(r * Side + c))
          s |= 1L << (r * (Side - 1) + c)
        c += 1
      }
      r += 1
    }
    s
  }

  /** Decode image bytes and hash BOTH gradient directions: (horizontal,
    * vertical) 56-bit signatures — together the 112-bit signature the
    * banded join keys on. The vertical half sets bit (c·7+r) iff
    * gray(r+1,c) > gray(r,c). Added r17: with only the 56-bit
    * horizontal hash, 8-bit bands admit ~n²/256 candidates per band —
    * measured 1.31 BILLION candidate pairs at sf10 — while 112 bits
    * carry 7×16-bit bands (same pigeonhole losslessness for hamming
    * ≤ 6 over the FULL 112-bit distance) and cut the per-band
    * collision rate 256×.
    */
  def dhash112(imageBytes: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(imageBytes))
    require(img != null, "undecodable image bytes")
    val g = gray8x8(img)
    var h = 0L
    var v = 0L
    var r = 0
    while (r < Side) {
      var c = 0
      while (c < Side) {
        if (c < Side - 1 && g(r * Side + c + 1) > g(r * Side + c))
          h |= 1L << (r * (Side - 1) + c)
        if (r < Side - 1 && g((r + 1) * Side + c) > g(r * Side + c))
          v |= 1L << (c * (Side - 1) + r)
        c += 1
      }
      r += 1
    }
    (h, v)
  }

  /** Band `i` (0..6) of the 112-bit signature — see [[Bands112]]. */
  def bandVal(h: Long, v: Long, i: Int): Long = Bands112.bandVal(h, v, i)

  /** Image-typed docs (doc_id % 3 == 0, the `mediaFromDocuments`
    * convention) rendered to real PNG payloads, then decoded + hashed
    * partition-wise: out columns (doc_id, dhash_h, dhash_v). The
    * render+hash round trip runs inside one task — payload bytes never
    * shuffle.
    */
  def dhashes(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0 && length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ImageIO plugin lookup happens once per partition, then the
        // batch streams through encode → decode → hash.
        // ASCII guard: the DuckDB oracle samples by CODEPOINT with a
        // char-length modulus while this side samples by UTF-8 BYTE
        // with a byte-length modulus — identical only while every char
        // is one ASCII byte. A non-ASCII doc would diverge silently,
        // so fail loudly instead (a real image corpus feeds raw bytes
        // here and never hits this guard).
        it.map { case (id, b) =>
          var i = 0
          while (i < b.length) {
            if (b(i) < 0) throw new IllegalArgumentException(
              s"ImageHash.dhashes: non-ASCII byte 0x${(b(i) & 0xff).toHexString} " +
                s"at offset $i of doc $id - byte-indexed hash would diverge " +
                "from the codepoint-indexed oracle")
            i += 1
          }
          val (h, v) = dhash112(grayPng(b))
          (id, h, v)
        }
      }
      .toDF("doc_id", "dhash_h", "dhash_v")
  }
}
