package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ArrayDotProduct, ArraySqDist, RewriteHofDot, RollingHash31, SimHash60Expr}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available in any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic, or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * so `graft_dot` / `graft_rolling_hash` resolve in SQL text and via
  * `call_function` without per-session registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer rule: un-interpret the HOF dot-product pattern
    // (aggregate∘zip_with) into the codegen'd graft_dot — see
    // [[graft.functions.RewriteHofDot]]
    e.injectOptimizerRule(_ => RewriteHofDot)
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[ArraySqDist].getName, "graft_sqdist"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArraySqDist(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash31].getName, "graft_rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash31(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60Expr].getName, "graft_simhash60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash60Expr(exprs(0))))
    // the bloom join-pruning pair (see catalog.Scale.bloomPrune): the
    // internal sketch aggregate + membership probe, surfaced to SQL
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
  }
}
