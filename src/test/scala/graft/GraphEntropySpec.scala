package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity pins for the round-3 analytics: fixed-point PageRank and
  * token entropy, run on the smallest driver fixture.
  */
class GraphEntropySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fixed-point pagerank: mass bounded, floor respected, degree ordering") {
    val r = graft.catalog.Graph.pagerank.build(spark, dir).collect()
    assert(r.nonEmpty)
    val ranks = r.map(_.getAs[Long]("rank_u"))
    // damped floor: every node keeps at least (1-d) of the unit mass
    assert(ranks.forall(_ >= 150000L))
    // integer truncation only ever LOSES mass vs the float recursion:
    // total stays at or below the initial n × 1e6
    assert(ranks.sum <= r.length * 1000000L)
    // suppliers (odd ids) are ~15× fewer than customers here, so the
    // top-ranked node must be a supplier hub
    val top = r.maxBy(_.getAs[Long]("rank_u")).getAs[Long]("node")
    assert(top % 2 == 1)
  }

  test("two-star CC equals pointer-jumping CC") {
    val pj = graft.catalog.Curation.dedupClusters.build(spark, dir)
      .collect().map(_.toSeq).toSeq
    val ts = graft.catalog.Curation.dedupClustersTwoStar.build(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(ts == pj)
  }

  test("token entropy: bounds and exact value on a uniform document") {
    val rows = graft.catalog.TextAnalysis.tokenEntropy.build(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val h = row.getAs[Double]("entropy")
      val nd = row.getAs[Long]("n_distinct")
      val hn = row.getAs[Double]("norm_entropy")
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 1e-6,
        s"entropy $h outside [0, ln($nd)]")
      assert(hn >= 0.0 && hn <= 1.0 + 1e-6)
      assert(math.abs(row.getAs[Double]("ppl") - math.exp(h)) <= math.exp(h) * 1e-4)
    }
    // a doc of k distinct tokens, all once → entropy exactly ln(k)
    val uniform = rows.filter(r => r.getAs[Long]("n_tokens") == r.getAs[Long]("n_distinct"))
    uniform.foreach { r =>
      val expected = math.log(r.getAs[Long]("n_distinct").toDouble)
      assert(math.abs(r.getAs[Double]("entropy") - expected) < 1e-5)
    }
  }
}
