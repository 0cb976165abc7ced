package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for q_winnow_fingerprint's selection rule. A pure-Scala
  * reference winnow (same packed-combo arithmetic as the query: 36-bit
  * gram hash × 2^24 + (2^24−1 − pos), MIN per w-window = rightmost
  * minimal gram) is checked for the two guarantees the algorithm is
  * used for:
  *
  *  1. COVERAGE — every document with at least one gram keeps at least
  *     one fingerprint (the GREATEST(1, m−w+1) window clamp);
  *  2. THE WINNOWING GUARANTEE — two documents sharing a run of
  *     ≥ k+w−1 tokens share a fingerprint HASH. The shared run yields
  *     w consecutive identical gram hashes in both docs; rightmost-min
  *     over the same hash sequence picks the same RELATIVE offset in
  *     both (the absolute-position tie-break only orders equal hashes
  *     within one window, and equal sequences order identically), so
  *     the selected hash coincides even though absolute positions
  *     differ.
  *
  * Holds for ANY hash function, so the reference uses a simple string
  * hash rather than md5 — the property pins the selection logic, the
  * oracle pins the md5 bits.
  */
class WinnowingPropertySpec extends AnyFunSuite {

  private val K = 4 // gram width (tokens)
  private val W = 4 // window width (grams)

  /** Deterministic stand-in hash, truncated to 36 bits like the query. */
  private def hash36(s: String): Long = {
    var h = 1125899906842597L
    s.foreach(c => h = h * 31 + c)
    (h & Long.MaxValue) >>> 27 // 63 - 27 = 36 bits
  }

  private def grams(toks: Vector[String]): Vector[Long] =
    if (toks.size >= K) toks.sliding(K).map(g => hash36(g.mkString(" "))).toVector
    else Vector(hash36(toks.mkString(" ")))

  /** Reference winnow: selected fingerprint hashes of a token vector. */
  private def winnow(toks: Vector[String]): Set[Long] = {
    val g = grams(toks)
    val m = g.size
    val combos = g.zipWithIndex.map { case (h, i) =>
      h * 16777216L + (16777215L - (i + 1))
    }
    val lastStart = math.max(1, m - (W - 1))
    (1 to lastStart).map { i =>
      combos.slice(i - 1, math.min(i - 1 + W, m)).min
    }.toSet.map((c: Long) => c / 16777216L)
  }

  private val tokGen: Gen[String] = Gen.oneOf(
    "the", "a", "scan", "sort", "hash", "join", "key", "row", "value",
    "table", "part", "fast", "slow", "merge", "batch", "window", "agg")

  private val docGen: Gen[Vector[String]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, tokGen).map(_.toVector))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("every non-empty document keeps at least one fingerprint (property)") {
    samples(docGen, 300).foreach { doc =>
      assert(winnow(doc).nonEmpty, s"no fingerprint for $doc")
    }
  }

  test("docs sharing a >= k+w-1 token run share a fingerprint hash (property)") {
    val caseGen = for {
      a <- docGen
      b <- docGen
      run <- Gen.listOfN(K + W - 1, tokGen).map(_.toVector)
      ia <- Gen.chooseNum(0, a.size)
      ib <- Gen.chooseNum(0, b.size)
    } yield (a.patch(ia, run, 0), b.patch(ib, run, 0))
    samples(caseGen, 400).foreach { case (da, db) =>
      assert((winnow(da) & winnow(db)).nonEmpty,
        s"shared ${K + W - 1}-token run but disjoint fingerprints: $da | $db")
    }
  }

  test("selection keeps at most one gram per window start (density bound)") {
    samples(docGen, 300).foreach { doc =>
      val g = grams(doc)
      val nWindows = math.max(1, g.size - (W - 1))
      assert(winnow(doc).size <= nWindows)
    }
  }
}
