package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: sequential-fold dot product of two
  * `array<double>` columns.
  *
  * Exists for the hot path of similarity search: the equivalent
  * built-in formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * runs interpreted (higher-order functions don't participate in
  * whole-stage codegen) and allocates a zipped array per row. This
  * expression generates a tight primitive loop, keeps the surrounding
  * projection inside WholeStageCodegen, and preserves the exact
  * left-to-right IEEE addition order — so results are bit-identical to
  * the HOF formulation and to DuckDB's `list_dot_product` oracle.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
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

  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  // Null semantics match the HOF formulation (aggregate over zip_with)
  // and the DuckDB oracle: mismatched lengths or any null element → NULL
  // (never a silently-truncated or garbage sum).
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $l.getDouble($i) * $r.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {

  /** Register `graft_dot` in the session's function registry (idempotent)
    * so it is usable from both the Column API ([[dot]]) and SQL.
    */
  def register(spark: SparkSession): Unit =
    Registry.once(spark, "graft_dot")(
      exprs => ArrayDotProduct(exprs(0), exprs(1)))

  /** Column-API form; requires [[register]] on the running session. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
