package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for q_containment's candidate rule: ASYMMETRIC PREFIX
  * FILTERING loses no qualifying pair. For threshold t = 0.8, doc A's
  * prefix is its n − ⌈0.8n⌉ + 1 rarest shingles under the global
  * (df, shingle) order; the claim (SSJoin/PPJoin) is that any pair
  * with containment(A→B) ≥ 0.8 shares at least one of A's prefix
  * shingles — because if B missed ALL of them, the overlap could be at
  * most n − prefix_len = ⌈0.8n⌉ − 1 < ⌈0.8n⌉ ≤ inter. The catalog
  * query's exactness rests on this; the property checks it over random
  * corpora, pure Scala — independent of Spark and the oracle instance.
  */
class ContainmentPropertySpec extends AnyFunSuite {

  private val corpusGen: Gen[List[Set[Int]]] =
    Gen.listOfN(12, Gen.nonEmptyListOf(Gen.choose(0, 25)).map(_.toSet))

  private def samples(n: Int): Seq[List[Set[Int]]] =
    (0 until n).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def prefixLen(n: Int): Int = n - (4 * n + 4) / 5 + 1

  test("prefix filtering never drops a qualifying containment pair (property)") {
    samples(200).foreach { docs =>
      val df = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val prefixes = docs.map { d =>
        d.toList.sortBy(t => (df(t), t)).take(prefixLen(d.size)).toSet
      }
      for {
        (a, ia) <- docs.zipWithIndex
        (b, ib) <- docs.zipWithIndex
        if ia != ib
        inter = (a & b).size
        if inter * 5 >= a.size * 4 // qualifying: containment(A→B) ≥ 0.8
      } assert((prefixes(ia) & b).nonEmpty,
        s"qualifying pair ($ia→$ib) shares no prefix shingle: " +
          s"a=$a b=$b prefix=${prefixes(ia)}")
    }
  }

  test("integer prefix length equals n - ceil(0.8n) + 1 (property)") {
    // exact decimal ceil — float 0.8*n can land an ulp off an integer
    (1 to 10000).foreach { n =>
      val ceil08 = BigDecimal("0.8").*(n)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toInt
      assert(prefixLen(n) == n - ceil08 + 1, s"n=$n")
    }
  }
}
