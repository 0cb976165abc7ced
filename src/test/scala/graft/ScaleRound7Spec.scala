package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and metrics invariants for the round-7 scale operators —
  * properties the per-query DuckDB oracles cannot express: dynamic
  * partition pruning actually reaching the fact scan, and the
  * `observe()` metrics surface a production pipeline monitors with.
  */
class ScaleRound7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("q_dpp_prune's fact scan carries a dynamicpruning partition filter") {
    val df = SparkEntry.queries("q_dpp_prune")(spark, dir)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"no DynamicPruningSubquery on the fact scan:\n$planStr")
    // and the pruned result is a strict subset of the event types
    val rows = df.collect()
    assert(rows.nonEmpty, "dim cut selected no event type at sf0.01")
    assert(rows.length < 5,
      "dim cut selected ALL five types — pruning is vacuous at this SF")
  }

  test("observe() reports the same totals the query computes") {
    val obs = new org.apache.spark.sql.Observation("dq")
    val out = spark.read.parquet(s"$dir/events.parquet")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"),
        count(when(col("value") > 400, 1)).as("n_outliers"))
      .filter(col("event_type") === "purchase")
    val nPurchase = out.count() // the action that completes the observation
    val m = obs.get
    // observe() sees PRE-filter rows: the metrics cover the whole scan
    val direct = spark.read.parquet(s"$dir/events.parquet")
      .agg(count(lit(1)), sum(col("value").cast("decimal(18,2)")).cast("double"),
        count(when(col("value") > 400, 1)))
      .head()
    assert(m("n_rows") == direct.getLong(0))
    assert(m("sum_v") == direct.getDouble(1))
    assert(m("n_outliers") == direct.getLong(2))
    assert(nPurchase < direct.getLong(0))
  }
}
