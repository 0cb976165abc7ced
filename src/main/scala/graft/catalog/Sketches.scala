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

  val all: Seq[QueryDef] = Seq(approxDistinct, heavyHitters)
}
