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
}
