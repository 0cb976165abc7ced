package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual video fingerprinting — the temporal complement to
  * [[ImageHash]] (spatial) and [[AudioHash]] (waveform), completing
  * content-grain near-dup across all three media legs: two clips that
  * differ in a short segment fingerprint within a small hamming
  * distance, so near-dup detection runs as a banded equi-join on
  * fingerprint bands, never an all-pairs frame compare.
  *
  * Decode is the ONE deliberately-stubbed step (the JDK ships no video
  * codec; swap FFmpeg/JNI here without touching anything else):
  * [[spanStats]] treats the payload bytes as the decoded clip's
  * per-frame luma stream, standing in for a real decoder's output.
  * Everything downstream of the stub is the real pipeline a true
  * decoder would feed:
  *
  *   - 57 equal TIME-SLICES partition the clip (slice of position p =
  *     p·57/len — the time-axis analogue of [[ImageHash]]'s area
  *     resize, so clips of any length compare on one grid), each
  *     reduced to (energy sum, width);
  *   - bit j compares slice MEANS by exact integer cross-multiply:
  *     e(j+1)·w(j) > e(j)·w(j+1) — comparing sums instead would let
  *     the slice-width pattern (a pure function of len mod 57)
  *     dominate the signature, making every pair of similar-length
  *     clips a spurious near-dup: measured on the synthetic corpus,
  *     sum-gradient bits give a quadratic ~0.2% all-pairs collision
  *     rate while mean-gradient bits isolate the true near-dups;
  *   - 56 bits, sign bit clear, integer arithmetic — exact on every
  *     engine; a single-segment edit perturbs one slice, hence at most
  *     its two adjacent gradient bits.
  *
  * Scale notes: carve + fingerprint run partition-local (payload bytes
  * never shuffle — only the 16-byte two-view fingerprint does); the
  * near-dup join shuffles (band_idx, band_val, doc_id) rows. Banding
  * is the shared [[Bands112]] 7×16-bit scheme over the 112-bit
  * signature ([[fingerprint112]]): pigeonhole keeps the banded
  * candidate set LOSSLESS for the 112-bit hamming ≤ 6 verify.
  */
object VideoHash {

  val GridPoints = 57
  val Bits: Int = GridPoints - 1 // 56 per view; 112 total

  /** STUB decode + time-slice reduce: (energy, width) per grid slice,
    * slice of byte p = p·57/len. A real implementation sums decoded
    * frame luma into the same 57 slices; the signature pipeline
    * downstream is unchanged. Slices of a short clip (len < 57) that
    * receive no byte read (0, 0).
    */
  def spanStats(b: Array[Byte]): (Array[Long], Array[Long]) = {
    require(b.nonEmpty, "empty payload")
    val e = new Array[Long](GridPoints)
    val w = new Array[Long](GridPoints)
    var p = 0
    while (p < b.length) {
      val f = (p.toLong * GridPoints / b.length).toInt
      e(f) += b(p) & 0xff
      w(f) += 1
      p += 1
    }
    (e, w)
  }

  /** 56-bit temporal mean-gradient fingerprint: bit j set iff slice
    * j+1's mean exceeds slice j's (exact cross-multiplied integers; an
    * empty slice never wins the strict compare).
    */
  def fingerprint56(stats: (Array[Long], Array[Long])): Long = {
    val (e, w) = stats
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (e(j + 1) * w(j) > e(j) * w(j + 1)) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Both gradient lags over the same slice stats: the lag-1 half is
    * [[fingerprint56]]; the lag-2 half compares slice j+2's mean
    * against slice j's (55 bits, j ≤ 54; its top bit stays 0) —
    * together the 112-bit signature the [[Bands112]] banded join keys
    * on. Lag-2 rather than a polyphase second view so a contiguous
    * one-slice edit still flips ≤ 4 of 112 bits (the
    * [[AudioHash.fingerprint112]] locality argument). Added r17: the
    * single 56-bit view's 8-bit bands admitted 1.11B candidate pairs
    * at sf10; 7×16-bit bands cut that ~40× while keeping pigeonhole
    * losslessness for the full 112-bit hamming ≤ 6.
    */
  def fingerprint112(b: Array[Byte]): (Long, Long) = {
    val (e, w) = spanStats(b)
    var h = 0L
    var v = 0L
    var j = 0
    while (j < Bits) {
      if (e(j + 1) * w(j) > e(j) * w(j + 1)) h |= 1L << j
      if (j < Bits - 1 && e(j + 2) * w(j) > e(j) * w(j + 2)) v |= 1L << j
      j += 1
    }
    (h, v)
  }

  /** Video-typed docs (doc_id % 3 == 2, the `mediaFromDocuments`
    * convention) carved + fingerprinted partition-wise: out columns
    * (doc_id, fp_h, fp_v). Payload bytes never shuffle.
    */
  def fingerprints(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 2 && length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ASCII guard (the ImageHash.dhashes rationale): the DuckDB
        // oracle reads codepoints with char positions while this side
        // reads UTF-8 bytes with byte positions — identical only while
        // every char is one ASCII byte; fail loudly, don't diverge.
        it.map { case (id, b) =>
          var i = 0
          while (i < b.length) {
            if (b(i) < 0) throw new IllegalArgumentException(
              s"VideoHash.fingerprints: non-ASCII byte 0x${(b(i) & 0xff).toHexString} " +
                s"at offset $i of doc $id - byte-indexed fingerprint would " +
                "diverge from the codepoint-indexed oracle")
            i += 1
          }
          val (h, v) = fingerprint112(b)
          (id, h, v)
        }
      }
      .toDF("doc_id", "fp_h", "fp_v")
  }
}
