package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared 7×16-bit banding over a 112-bit signature carried as two
  * 56-bit longs (h, v) — the blocking scheme of all three media
  * near-dup operators ([[ImageHash]], [[AudioHash]], [[VideoHash]]).
  *
  * The two halves concatenate as h | v<<56 and slice at [16i, 16i+16):
  * bands 0-2 live in h, band 3 straddles (h's top byte + v's low
  * byte), bands 4-6 live in v — disjoint and covering, so a 112-bit
  * hamming ≤ 6 forces at least one equal band (pigeonhole over 7
  * bands) and the banded equi-join is LOSSLESS for the ≤ 6 verify.
  * 16-bit bands, not 8: with 56-bit signatures and 8-bit bands the
  * per-band collision rate is ~1/256 of all pairs — measured 0.7-1.3
  * BILLION candidate pairs per modality at sf10 — while 16-bit bands
  * cut it ~256× (image: 1.31B → 42.8M measured).
  */
object Bands112 {

  val Bands = 7
  val BandBits = 16

  /** Band `i` (0..6) of (h, v) as a 16-bit value — driver/test-side. */
  def bandVal(h: Long, v: Long, i: Int): Long =
    if (i <= 2) (h >> (16 * i)) & 0xffffL
    else if (i == 3) ((h >> 48) & 0xffL) | ((v & 0xffL) << 8)
    else (v >> (16 * (i - 4) + 8)) & 0xffffL

  /** The same seven band extractions as Columns, for the banded-join
    * posexplode — one expression per band over the two hash columns.
    */
  def bandCols(h: Column, v: Column): Seq[Column] =
    (0 until Bands).map { i =>
      if (i <= 2) shiftright(h, 16 * i).bitwiseAND(lit(65535L))
      else if (i == 3) shiftright(h, 48).bitwiseAND(lit(255L))
        .bitwiseOR(shiftleft(v.bitwiseAND(lit(255L)), 8))
      else shiftright(v, 16 * (i - 4) + 8).bitwiseAND(lit(65535L))
    }

  /** The matching DuckDB band-value CASE over columns `h`/`v` with the
    * band index column `bnd` — keeps the three oracles byte-identical
    * to [[bandVal]].
    */
  val bandSql: String =
    """CASE WHEN bnd <= 2 THEN (h >> (16 * bnd)) & 65535
      |              WHEN bnd = 3 THEN ((h >> 48) & 255) | ((v & 255) << 8)
      |              ELSE (v >> (16 * (bnd - 4) + 8)) & 65535 END""".stripMargin
}
