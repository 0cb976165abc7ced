package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantileSketch

/** The storable GK sketch's contract: serialization is lossless, and a
  * merge of split-half sketches answers quantiles within the ε rank
  * guarantee of the exact answer (seeded scalacheck, mirroring the
  * codec properties).
  */
class QuantileSketchSpec extends AnyFunSuite {

  private val eps = 0.01

  private def rankOk(sorted: Array[Double], est: Double, p: Double,
      slack: Double): Boolean = {
    val n = sorted.length
    val lo = sorted.count(_ < est)
    val hi = sorted.count(_ <= est)
    hi >= p * n - slack * n && lo <= p * n + slack * n
  }

  test("serialize/deserialize preserves the sketch's answers") {
    var qs = QuantileSketch.empty(eps)
    (1 to 5000).foreach(i => qs = qs.insert(i.toDouble))
    val back = QuantileSketch.deserialize(QuantileSketch.serialize(qs))
    Seq(0.1, 0.5, 0.99).foreach { p =>
      assert(back.compress().query(p) == qs.compress().query(p))
    }
  }

  test("merged split-half sketches stay within the rank guarantee (property)") {
    val valGen = Gen.chooseNum(-1e6, 1e6)
    (0 until 10).foreach { seed =>
      val xs = Gen.listOfN(4000, valGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get.toArray
      val (a, b) = xs.splitAt(xs.length / 3) // uneven halves on purpose
      var qa = QuantileSketch.empty(eps)
      a.foreach(x => qa = qa.insert(x))
      var qb = QuantileSketch.empty(eps)
      b.foreach(x => qb = qb.insert(x))
      // through the storage round-trip, like the rollup read path
      val merged = QuantileSketch
        .deserialize(QuantileSketch.serialize(qa)).compress()
        .merge(QuantileSketch.deserialize(QuantileSketch.serialize(qb)).compress())
      val sorted = xs.sorted
      Seq(0.1, 0.5, 0.9, 0.99).foreach { p =>
        val est = merged.compress().query(p).get
        assert(rankOk(sorted, est, p, 3 * eps),
          s"seed=$seed p=$p est=$est out of rank bound")
      }
    }
  }
}
