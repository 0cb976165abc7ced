package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for q_interval_overlap's candidate rule: HOUR-BUCKET
  * blocking loses no overlapping pair. The claim: if [s1,e1] and
  * [s2,e2] overlap (s1 ≤ e2 ∧ s2 ≤ e1), they share at least one hour
  * bucket from their exploded ranges [⌊s/H⌋..⌊e/H⌋] — any point t in
  * the intersection puts ⌊t/H⌋ in both ranges. The converse need not
  * hold (adjacent intervals in one bucket), which is why the query
  * re-verifies the exact predicate after the equi-join; the property
  * also pins that the verify step is the ONLY filter (no qualifying
  * pair is outside the candidate set).
  */
class IntervalOverlapPropertySpec extends AnyFunSuite {

  private val H = 3600000000L // hour in micros, as in the query

  private val intervalGen: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(0L, 100L * H)
    len <- Gen.chooseNum(0L, 25L * H) // spans longer than one bucket too
  } yield (s, s + len)

  private def buckets(iv: (Long, Long)): Seq[Long] =
    (iv._1 / H) to (iv._2 / H)

  private def samples(n: Int): Seq[((Long, Long), (Long, Long))] = {
    val g = Gen.zip(intervalGen, intervalGen)
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  }

  test("overlapping intervals always share an hour bucket (property)") {
    samples(2000).foreach { case (a, b) =>
      val overlaps = a._1 <= b._2 && b._1 <= a._2
      if (overlaps)
        assert((buckets(a).toSet & buckets(b).toSet).nonEmpty,
          s"overlapping $a $b share no bucket")
    }
  }

  test("candidate set is a strict superset somewhere (verify step is load-bearing)") {
    // at least one generated pair shares a bucket WITHOUT overlapping —
    // if this never happened the exact re-verify would be dead code
    val witnesses = samples(2000).count { case (a, b) =>
      val overlaps = a._1 <= b._2 && b._1 <= a._2
      !overlaps && (buckets(a).toSet & buckets(b).toSet).nonEmpty
    }
    assert(witnesses > 0)
  }
}
