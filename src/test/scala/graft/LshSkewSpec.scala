package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Frequent-bucket skew guard for the LSH band join
  * ([[Text.cappedBandEdges]], catalog `q_minhash_pairs_capped`).
  *
  * Fixture: a viral document duplicated 300× (one band bucket of 300 —
  * the plain self-join would emit 300·299/2 ≈ 45k pairs from a single
  * key) alongside small duplicate clusters that stay under the cap.
  * Pins: (1) hot buckets emit O(B) star edges, never the quadratic
  * join; (2) connectivity of the viral cluster survives for the
  * downstream connected-components consumer; (3) pairs from sub-cap
  * buckets are retained EXACTLY — no lost pairs below the cap; (4) with
  * a cap no bucket reaches, the guard is a bit-exact no-op vs the
  * plain all-pairs join.
  */
class LshSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Cap = 8

  /** (doc_id, band_idx, band_hash) relation from (doc_id, text) rows —
    * the exact shape the catalog query feeds the guard.
    */
  private def banded(docs: Seq[(Long, String)]): DataFrame = {
    val sig = Text.minhashSigDF(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 8)
    sig.select(col("doc_id"), array(Text.lshBandCols(2, 8): _*).as("bands"))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
  }

  /** The unguarded quadratic join — test-only oracle. */
  private def plainPairs(b: DataFrame): Set[(Long, Long)] =
    b.as("a").join(b.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .as[(Long, Long)].collect().toSet

  private def edges(b: DataFrame, cap: Int): Set[(Long, Long)] =
    Text.cappedBandEdges(b, "doc_id", cap).as[(Long, Long)].collect().toSet

  // 300 byte-identical viral copies + 6 distinct docs forming three
  // 2-doc near-dup clusters + 8 unique docs.
  private val viralIds = (1000L until 1300L)
  private val fixture: Seq[(Long, String)] =
    viralIds.map(i => i -> "breaking news everyone is sharing this exact viral post today") ++
      Seq(
        1L -> "the quick brown fox jumps over the lazy dog near the river bank",
        2L -> "the quick brown fox jumps over the lazy dog near the river bank",
        3L -> "machine learning systems require careful evaluation of training data quality",
        4L -> "machine learning systems require careful evaluation of training data quality",
        5L -> "distributed query engines shuffle data between executors on wide dependencies",
        6L -> "distributed query engines shuffle data between executors on wide dependencies") ++
      (7L to 14L).map(i => i -> s"unique filler document number $i with deliberately unrelated content words")

  test("hot bucket emits O(B) star edges, not the quadratic join") {
    val b = banded(fixture)
    val out = edges(b, Cap)
    val viralEdges = out.filter { case (a, c) => viralIds.contains(a) || viralIds.contains(c) }
    // star pattern: every viral copy connects to the representative
    // (min id 1000) once — 299 edges, not 44 850 pairs.
    assert(viralEdges == viralIds.drop(1).map(i => (1000L, i)).toSet)
  }

  test("viral cluster stays connected through the guard") {
    val out = edges(banded(fixture), Cap)
    // union-find over the emitted edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    out.foreach { case (a, c) => parent(find(a)) = find(c) }
    assert(viralIds.map(find).toSet.size == 1)
  }

  test("no lost pairs below the cap: sub-cap pairs retained exactly") {
    val b = banded(fixture).persist()
    try {
      val out = edges(b, Cap)
      // every pair the plain join derives from a sub-cap bucket must
      // survive the guard verbatim
      val small = b.join(
        b.groupBy("band_idx", "band_hash").agg(count(lit(1)).as("n"))
          .filter(col("n") <= Cap),
        Seq("band_idx", "band_hash"))
      assert(plainPairs(small).subsetOf(out))
      // and the three 2-doc clusters specifically
      assert(Set((1L, 2L), (3L, 4L), (5L, 6L)).subsetOf(out))
    } finally b.unpersist()
  }

  test("cap above the max bucket is a bit-exact no-op") {
    val calm = fixture.filterNot { case (id, _) => viralIds.contains(id) }
    val b = banded(calm).persist()
    try assert(edges(b, cap = 1 << 20) == plainPairs(b))
    finally b.unpersist()
  }

  test("catalog cap exercises both branches at test scale") {
    // the catalog pins cap=2 so the sf0.01 oracle runs the star branch
    // too; this fixture's small clusters sit at bucket size 2 ≤ cap
    val calm = (1L to 6L).map(i => fixture.find(_._1 == i).get)
    val b = banded(calm).persist()
    try assert(edges(b, graft.catalog.TextAnalysis.BandBucketCap) == plainPairs(b))
    finally b.unpersist()
  }
}
