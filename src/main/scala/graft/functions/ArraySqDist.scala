package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: sequential-fold SQUARED EUCLIDEAN
  * DISTANCE of two `array<double>` columns — the (x−y)² sibling of
  * [[ArrayDotProduct]].
  *
  * The equivalent built-in formulation
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0, (acc, e) -> acc + e)`
  * runs interpreted (HOFs don't codegen) and allocates the zipped array
  * per row; the r17 profile charged ~150 task-s of q_ann_ivfpq's
  * Lloyd/encode stages to exactly this chain. This expression generates
  * a tight primitive loop inside WholeStageCodegen and preserves the
  * exact left-to-right IEEE order — `(x-y)*(x-y)` is bitwise equal to
  * `(y-x)*(y-x)` (negation is exact; the square cancels the sign, and
  * ±0 squares to +0), so either subtraction orientation folds
  * identically, matching the HOF form and DuckDB's
  * `list_reduce(list_prepend(0.0, list_transform(...)))` oracle.
  * Null semantics mirror the HOF chain: length mismatch or any null
  * element → NULL; empty arrays → 0.0.
  */
case class ArraySqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sqdist"

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $l.getDouble($i) - $r.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySqDist =
    copy(left = newLeft, right = newRight)
}

object ArraySqDist {

  /** Register `graft_sqdist` (idempotent). */
  def register(spark: SparkSession): Unit =
    Registry.once(spark, "graft_sqdist")(
      exprs => ArraySqDist(exprs(0), exprs(1)))

  /** Column-API form; requires [[register]] on the running session. */
  def sqDist(a: Column, b: Column): Column = call_function("graft_sqdist", a, b)
}
