package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the built-in higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x) }}}
  *
  * into the native [[ArrayDotProduct]] (`graft_dot`). The HOF chain is
  * the natural way a user writes a dot product, but it runs interpreted
  * (higher-order functions don't participate in whole-stage codegen)
  * and materializes the zipped array per row — the two shapes this
  * repo's own profiling caught as hot-path cliffs (PLANS.md "Perf
  * findings" #1; the blocked trajectory query's pair stream). The
  * rewrite is bit-exact: [[ArrayDotProduct]] folds dimensions in the
  * same left-to-right IEEE order and reproduces the HOF null semantics
  * (length mismatch or any null element → NULL; empty arrays → 0.0),
  * so swapping it in can never change a result, only un-interpret it.
  *
  * Matched conservatively: both inputs must be `array<double>`, the
  * zero literal exactly `0.0 :: double`, the zip lambda a bare
  * `x * y` over the two zip variables (either order), the merge lambda
  * a bare `acc + elem` over its two variables (either order — IEEE
  * addition of the same two operands is commutative bitwise), and the
  * finish lambda the identity. Anything else — `(x-y)*(x-y)` folds,
  * non-zero seeds, casts inside the lambda — is left untouched.
  *
  * Injected by [[graft.GraftExtensions]] (`injectOptimizerRule`), and
  * usable on a live session via
  * `spark.experimental.extraOptimizations ++= Seq(RewriteHofDot)`.
  * Completes the engine's Catalyst surface: native `Expression`s
  * (`graft_dot` et al.), a custom `LogicalPlan`+`SparkStrategy`
  * (`plans.AsOfJoin`), and this `Rule[LogicalPlan]`.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(
              Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(
            Add(aa: NamedLambdaVariable, ae: NamedLambdaVariable, _),
            Seq(la: NamedLambdaVariable, le: NamedLambdaVariable), _),
          LambdaFunction(fb: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
        // raw-bits match: -0.0 == 0.0 under IEEE, but an empty array
        // returns the seed, so rewriting a -0.0 seed would flip its
        // sign bit — only +0.0 preserves bit-exactness
        if java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
          Set(mx.exprId, my.exprId) == Set(zx.exprId, zy.exprId) &&
          Set(aa.exprId, ae.exprId) == Set(la.exprId, le.exprId) &&
          fb.exprId == fa.exprId &&
          isDoubleArray(a) && isDoubleArray(b) =>
        ArrayDotProduct(a, b)

      // the squared-distance sibling:
      //   aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0,
      //             (acc, e) -> acc + e)
      // → graft_sqdist. Both multiply operands must be the SAME
      // subtraction of the two zip variables; the orientation is free
      // because (x-y)² bit-equals (y-x)² under IEEE (exact negation,
      // sign cancelled by the square, ±0 squares to +0).
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(
              Multiply(
                Subtract(s1l: NamedLambdaVariable, s1r: NamedLambdaVariable, _),
                Subtract(s2l: NamedLambdaVariable, s2r: NamedLambdaVariable, _), _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(
            Add(aa: NamedLambdaVariable, ae: NamedLambdaVariable, _),
            Seq(la: NamedLambdaVariable, le: NamedLambdaVariable), _),
          LambdaFunction(fb: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
        if java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
          s1l.exprId == s2l.exprId && s1r.exprId == s2r.exprId &&
          s1l.exprId != s1r.exprId &&
          Set(s1l.exprId, s1r.exprId) == Set(zx.exprId, zy.exprId) &&
          Set(aa.exprId, ae.exprId) == Set(la.exprId, le.exprId) &&
          fb.exprId == fa.exprId &&
          isDoubleArray(a) && isDoubleArray(b) =>
        ArraySqDist(a, b)
    }
}
