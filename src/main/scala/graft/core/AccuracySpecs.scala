package graft.core

/** Registry of the catalog's rows-only queries (no DuckDB-expressible
  * oracle) and, for each, the ScalaTest spec that pins its accuracy
  * against an exact computation. `PropertySpec` asserts the catalog's
  * rows-only set equals this registry's key set, so adding a rows-only
  * query without registering (and writing) its accuracy spec — or
  * leaving a stale entry behind after a query gains a hash oracle —
  * fails the build instead of silently weakening the gate.
  */
object AccuracySpecs {

  /** rows-only query name -> `Suite:exact test name` pinning it.
    * Entries are machine-checked: `PropertySpec` instantiates the suite
    * by reflection and asserts the named test exists, so a renamed or
    * deleted accuracy test fails the build instead of leaving a dangling
    * pointer.
    */
  val registry: Map[String, String] = Map(
    "q_approx_distinct" ->
      "ScaleTechniquesSpec:HLL approx distinct within 5% of exact; CMS estimate upper-bounds exact",
    "q_approx_distinct_rsd5" ->
      "ScaleTechniquesSpec:HLL approx distinct within 5% of exact; CMS estimate upper-bounds exact",
    "q_heavy_hitters" ->
      "ScaleTechniquesSpec:HLL approx distinct within 5% of exact; CMS estimate upper-bounds exact",
    "q_approx_quantiles" ->
      "GraphEntropySpec:approx quantiles track exact nearest-rank percentiles")

  /** A quality floor for an approximate retrieval query: `spec` points
    * at the ScalaTest that measures it (`Suite:test name`, validated by
    * reflection in PropertySpec exactly like [[registry]]), `metric`
    * names what's measured, `floor` is the asserted minimum.
    */
  final case class QualityFloor(spec: String, metric: String, floor: Double)

  /** ANN-family quality floors. The hash oracles on these queries prove
    * DETERMINISM (DuckDB re-derives the same bucketed algorithm), not
    * retrieval QUALITY — an IVF that returned garbage-but-deterministic
    * neighbors would still hash green. These floors pin quality against
    * the exact brute-force top-k at sf0.01 (200 vectors, 20 queries;
    * every algorithm is deterministic so the measured values are
    * constants of the catalog + testdata: ivf 0.20, probe2 0.45,
    * kmeans 0.25, binary-quant 0.533 — floors sit ~25% under those to
    * survive a testdata regeneration). `q_ann_lsh`'s top-3 recall on
    * THIS corpus is 0.00 — random 64-d embeddings give top-3 neighbors
    * at cosine ≈ 0.5 (~60°), and 8 shared hyperplane bits at 60° happen
    * with probability ≈ (1 − 60/180)^8 ≈ 4% — so a recall floor would
    * be vacuous; instead its floor pins the property that makes the
    * hash an LSH at all: co-bucket pairs must enrich for cosine
    * (measured co-bucket mean 0.058−0.059 vs corpus mean ≈ 0.0004 at
    * BOTH sf0.01 and sf0.1). `q_ann_topk_refine` is exempt by
    * construction: its candidate stage is the exact brute-force top-20,
    * so top-10 recall is identically 1 (PropertySpec pins the exemption
    * list so a new q_ann_* query can't ship floorless by accident).
    */
  val annFloors: Map[String, QualityFloor] = {
    val recallSpec =
      "AnnRecallSpec:ANN variants clear their registered recall@3 floors vs exact top-3"
    Map(
      "q_ann_ivf" -> QualityFloor(recallSpec, "mean recall@3", 0.15),
      "q_ann_ivf_probe2" -> QualityFloor(recallSpec, "mean recall@3", 0.35),
      "q_ann_ivf_kmeans" -> QualityFloor(recallSpec, "mean recall@3", 0.18),
      "q_ann_binary_quant" -> QualityFloor(recallSpec, "mean recall@3", 0.40),
      "q_ann_lsh" -> QualityFloor(
        "AnnRecallSpec:LSH co-bucket pairs enrich for cosine over the corpus mean",
        "co-bucket mean cosine minus corpus mean cosine", 0.03))
  }

  /** q_ann_* queries exempt from [[annFloors]] because they are exact
    * by construction (see scaladoc above).
    */
  val annExact: Set[String] = Set("q_ann_topk_refine")
}
