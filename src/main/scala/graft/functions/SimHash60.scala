package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 60-bit SimHash of a token array in ONE
  * pass — for each token, the first 60 bits of its md5 vote ±1 on each
  * of 60 counters; the result sets bit b when counter b is positive.
  *
  * This is the whole-document alternative to the explode → 60 ±1 sums →
  * groupBy re-aggregation plan ([[graft.ops.Text.simhash16]]'s shape):
  * no generator, no shuffle, no 60-column aggregate buffer — a single
  * projection-local loop that whole-stage codegen inlines, so a 100 TB
  * corpus simhashes in the scan stage at zero exchange cost. The hash
  * convention (md5 hex prefix as a 60-bit integer) is the engine-wide
  * [[graft.ops.Text.hash60]] one, so the DuckDB oracle reproduces every
  * signature bit-for-bit.
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHash60.hashTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.SimHash60.hashTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}

object SimHash60 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 prefix of the token's UTF-8 bytes — identical to
    * `conv(substring(md5(tok), 1, 15), 16, 10)` / DuckDB
    * `('0x' || substr(md5(tok), 1, 15))::BIGINT`.
    */
  private def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4 // first 15 hex nibbles = top 60 bits of the first 8 bytes
  }

  /** Called from both interpreted eval and generated code. */
  def hashTokens(arr: ArrayData): Long = {
    val counters = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash60(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counters(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Register `graft_simhash60` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    Registry.once(spark, "graft_simhash60")(exprs => SimHash60Expr(exprs.head))

  /** Column-API form; requires [[register]] on the running session. */
  def simhash60(toks: Column): Column = call_function("graft_simhash60", toks)
}
