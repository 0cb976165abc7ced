package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual audio fingerprinting over REAL decoded PCM — the audio
  * complement to [[ImageHash]], closing the last metadata-only modality
  * of the multimodal suite: two clips that differ by a few samples
  * fingerprint within a small hamming distance, so near-dup detection
  * runs as a banded equi-join on fingerprint bands, never an all-pairs
  * waveform compare.
  *
  * The fingerprint is a frame-energy gradient hash (the dHash idea on
  * the time axis, the shape Haitsma-Kalker-style audio fingerprints
  * use): the decoded stream is cut into 57 fixed frames of 8 samples,
  * each frame reduces to its sample SUM (integer — 8 unsigned bytes,
  * exact on every engine), and bit j is set iff frame j+1's sum exceeds
  * frame j's — 56 bits, keeping a 64-bit long's sign bit clear so band
  * extraction and XOR/bit_count hamming need no unsigned gymnastics
  * (the [[ImageHash]] / simhash60 reasoning). A one-sample perturbation
  * touches at most one frame sum, hence at most its two adjacent
  * gradient bits — the robustness the banded join exploits.
  *
  * The codec is genuinely exercised: payloads are real RIFF/WAVE files
  * (written through `AudioSystem`, complete with header and format
  * chunk) and every fingerprint decodes through
  * `AudioSystem.getAudioInputStream`. The test corpus carries no audio
  * files, so [[monoWav]] RENDERS a deterministic PCM clip per
  * audio-typed doc (sample k = text byte k mod len, 8-bit unsigned
  * mono — the corpus is pure ASCII, so the oracle reproduces the exact
  * sample values from codepoints); 8-bit PCM in a WAV container is
  * lossless, so encode → decode → fingerprint is bit-reproducible.
  *
  * Scale notes: render + decode + fingerprint run partition-local
  * (codec init amortized per partition; payload bytes never shuffle —
  * only the 16-byte fingerprint does), and the near-dup join shuffles
  * (band_idx, band_val, doc_id) rows. Banding is the shared
  * [[Bands112]] 7×16-bit scheme over the two-view 112-bit signature
  * ([[fingerprint112]]): pigeonhole keeps the banded candidate set
  * LOSSLESS for the 112-bit hamming ≤ 6 verify.
  */
object AudioHash {

  val FrameLen = 8
  val Frames = 57
  val Samples: Int = FrameLen * Frames // 456
  val Bits: Int = Frames - 1 // 56 per view; 112 total
  val SampleRateHz = 8000f

  /** Render the deterministic PCM clip for a doc's bytes as a REAL WAV
    * file: sample k = b(k mod b.length), 8-bit unsigned mono. The
    * output starts with the RIFF magic and round-trips through
    * `AudioSystem`.
    */
  def monoWav(b: Array[Byte]): Array[Byte] = {
    require(b.nonEmpty, "empty payload")
    val pcm = new Array[Byte](Samples)
    var k = 0
    while (k < Samples) { pcm(k) = b(k % b.length); k += 1 }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      SampleRateHz, 8, 1, 1, SampleRateHz, false)
    val in = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, Samples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV through the real codec and return its 8-bit unsigned
    * samples (0..255). Throws on undecodable bytes — callers feed real
    * WAV files by construction.
    */
  def pcmSamples(wavBytes: Array[Byte]): Array[Int] = {
    val stream = AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(wavBytes))
    try {
      require(stream.getFormat.getSampleSizeInBits == 8,
        s"expected 8-bit PCM, got ${stream.getFormat}")
      val raw = stream.readAllBytes()
      raw.map(_ & 0xff)
    } finally stream.close()
  }

  /** Decode audio bytes and fingerprint: 56-bit frame-energy gradient
    * signature, bit j set iff frameSum(j+1) > frameSum(j).
    */
  def fingerprint56(wavBytes: Array[Byte]): Long = {
    val s = pcmSamples(wavBytes)
    require(s.length >= Samples, s"short clip: ${s.length} < $Samples samples")
    val sums = new Array[Long](Frames)
    var k = 0
    while (k < Samples) { sums(k / FrameLen) += s(k); k += 1 }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (sums(j + 1) > sums(j)) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Decode audio bytes and fingerprint BOTH gradient lags: the lag-1
    * half is [[fingerprint56]]'s adjacent-frame gradient; the lag-2
    * half compares frame j+2 against frame j (55 bits, j ≤ 54; its top
    * bit stays 0). Together the 112-bit signature the [[Bands112]]
    * banded join keys on. Lag-2, not a polyphase second view: a
    * CONTIGUOUS edit touches ~edit/8 polyphase groups (every stride
    * group samples the whole clip) but only the edited frames here, so
    * a one-frame edit still flips ≤ 4 of 112 bits — the locality the
    * near-dup gate is built on. Added r17 with the [[Bands112]]
    * widening: the 56-bit hash's 8-bit bands admitted 747M candidate
    * pairs at sf10; 7×16-bit bands over 112 bits cut that to 22.3M
    * while keeping pigeonhole losslessness for the full hamming ≤ 6.
    */
  def fingerprint112(wavBytes: Array[Byte]): (Long, Long) = {
    val s = pcmSamples(wavBytes)
    require(s.length >= Samples, s"short clip: ${s.length} < $Samples samples")
    val sums = new Array[Long](Frames)
    var k = 0
    while (k < Samples) { sums(k / FrameLen) += s(k); k += 1 }
    var h = 0L
    var v = 0L
    var j = 0
    while (j < Bits) {
      if (sums(j + 1) > sums(j)) h |= 1L << j
      if (j < Bits - 1 && sums(j + 2) > sums(j)) v |= 1L << j
      j += 1
    }
    (h, v)
  }

  /** Audio-typed docs (doc_id % 3 == 1, the `mediaFromDocuments`
    * convention) rendered to real WAV payloads, then decoded + hashed
    * partition-wise: out columns (doc_id, fp_h, fp_v). The render+hash round
    * trip runs inside one task — payload bytes never shuffle.
    */
  def fingerprints(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 1 && length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec init once per partition, then the batch streams through
        // render → decode → fingerprint.
        // ASCII guard (the ImageHash.dhashes rationale): the DuckDB
        // oracle samples by CODEPOINT with a char-length modulus while
        // this side samples by UTF-8 BYTE with a byte-length modulus —
        // identical only while every char is one ASCII byte; fail
        // loudly rather than diverge silently.
        it.map { case (id, b) =>
          var i = 0
          while (i < b.length) {
            if (b(i) < 0) throw new IllegalArgumentException(
              s"AudioHash.fingerprints: non-ASCII byte 0x${(b(i) & 0xff).toHexString} " +
                s"at offset $i of doc $id - byte-indexed fingerprint would " +
                "diverge from the codepoint-indexed oracle")
            i += 1
          }
          val (h, v) = fingerprint112(monoWav(b))
          (id, h, v)
        }
      }
      .toDF("doc_id", "fp_h", "fp_v")
  }
}
