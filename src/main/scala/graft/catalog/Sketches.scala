package graft.catalog

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Sketch-based approximate aggregates — HyperLogLog distinct counts and
  * count-min-sketch heavy hitters. Sketch internals are engine-specific,
  * so these are rows-only checks (no DuckDB oracle); correctness is
  * bounded-error by construction and pinned by `SketchSpec` against the
  * exact answers.
  *
  * Scale rationale: at 100 TB an exact COUNT(DISTINCT) shuffles every
  * distinct key; the HLL sketch is a few KB per group, merged map-side.
  */
object Sketches {

  val approxDistinct: QueryDef = QueryDef.rowsOnly("q_approx_distinct") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        approx_count_distinct(col("event_id"), 0.01).as("approx_events"))
      .orderBy("event_type")
  }

  val heavyHitters: QueryDef = QueryDef.rowsOnly("q_heavy_hitters") { (s, dir) =>
    // count-min sketch over user ids; surface the estimated counts of
    // the true top users (estimates upper-bound the exact counts)
    val cms = Tables.events(s, dir)
      .select(count_min_sketch(col("user_id"), lit(0.001), lit(0.99), lit(42)).as("sketch"))
    val top = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(5)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_estimate",
      exprs => graft.functions.CountMinEstimate(exprs(0), exprs(1)), "built-in")
    top.crossJoin(cms)
      .select(col("user_id"), col("exact_n"),
        call_function("graft_cms_estimate", col("sketch"), col("user_id"))
          .as("estimated_n"))
      .orderBy("user_id")
  }

  // t-digest-style approximate quantiles: percentile_approx with
  // accuracy 10000 — per group the sketch is O(accuracy) however many
  // rows stream through it, merged map-side like HLL. Rows-only (the
  // digest layout is engine-specific); `ScaleTechniquesSpec` pins the
  // estimates against exact nearest-rank percentiles.
  val approxQuantiles: QueryDef = QueryDef.rowsOnly("q_approx_quantiles") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))
      .orderBy("event_type")
  }

  // Full distributed k-means (3 Lloyd rounds over ops.KMeans.fit):
  // cluster cardinalities + within-cluster sum of squares. Rows-only —
  // an unrolled 3-round SQL oracle adds nothing over the per-round
  // parity q_ann_ivf_kmeans already proves — while `GraphEntropySpec`
  // pins the Lloyd invariant (WCSS non-increasing round over round).
  val kmeansFit: QueryDef = QueryDef.rowsOnly("q_kmeans_fit") { (s, dir) =>
    graft.ops.Vectors.register(s)
    val vecs = Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), graft.ops.Vectors.toDouble(col("embedding")).as("v"))
    val (asg, cents) = graft.ops.KMeans.fit(vecs, "vec_id", "v", k = 8, rounds = 3)
    asg.join(vecs, asg("id") === vecs("vec_id"))
      .join(cents, "cid")
      .select(col("cid"), col("id"),
        aggregate(zip_with(col("v"), col("cv"), (x, c) => (x - c) * (x - c)),
          lit(0.0), (a, x) => a + x).as("sq"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"), sum(col("sq")).as("wcss"))
      .orderBy("cid")
  }

  val all: Seq[QueryDef] = Seq(approxDistinct, heavyHitters, approxQuantiles, kmeansFit)
}
