package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: the 60-bit hashes of every n-token
  * shingle of a token array in ONE projection-local pass.
  *
  * Semantically identical to
  * `transform(Text.wordShingles(toks, n), Text.hash60)` — each window
  * is the space-joined token run, hashed by the engine-wide md5-prefix
  * convention ([[graft.ops.Text.hash60]]), and a document shorter than
  * n tokens contributes its whole token string as one shingle — but the
  * built-in formulation runs INTERPRETED (array HOFs don't codegen) and
  * re-slices/concats per window. Profiled at sf0.1 this chain dominated
  * `q_dup_ngram_spans` (~5 s of a 10 s query); the native loop builds
  * each window string and hashes it inside one JVM call that
  * whole-stage codegen inlines into the scan stage. The DuckDB oracle
  * (`md5(array_to_string(toks[i:i+n-1], ' '))`) reproduces every hash
  * bit-for-bit, so swapping the formulations never moves an oracle.
  */
case class ShingleHash60Expr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hash60"

  override def nullSafeEval(input: Any): Any =
    ShingleHash60.hashShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.ShingleHash60.hashShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60Expr =
    copy(child = newChild)
}

object ShingleHash60 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 prefix — the [[graft.ops.Text.hash60]] convention. */
  private def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Space-join tokens [from, from+len) (skipping nulls, exactly like
    * `concat_ws`) and hash the UTF-8 bytes.
    */
  private def windowHash(arr: ArrayData, from: Int, len: Int): Long = {
    val sb = new java.lang.StringBuilder()
    var j = 0
    var first = true
    while (j < len) {
      if (!arr.isNullAt(from + j)) {
        if (!first) sb.append(' ')
        sb.append(arr.getUTF8String(from + j).toString)
        first = false
      }
      j += 1
    }
    hash60(sb.toString.getBytes("UTF-8"))
  }

  /** Called from both interpreted eval and generated code. */
  def hashShingles(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements()
    if (cnt < n) {
      new GenericArrayData(Array(windowHash(arr, 0, cnt)))
    } else {
      val out = new Array[Long](cnt - n + 1)
      var i = 0
      while (i <= cnt - n) {
        out(i) = windowHash(arr, i, n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Register `graft_shingle_hash60` (idempotent). The second argument
    * must be a foldable int literal — the shingle width.
    */
  def register(spark: SparkSession): Unit =
    Registry.once(spark, "graft_shingle_hash60")(
      exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_shingle_hash60 expects 2 arguments (tokens, shingle width), got ${exprs.length}")
        exprs(1) match {
          case Literal(v: Int, IntegerType) => ShingleHash60Expr(exprs.head, v)
          case other => throw new IllegalArgumentException(
            s"shingle width must be an int literal, got $other")
        }
      })

  /** Column-API form; requires [[register]] on the running session. */
  def shingleHash60(toks: Column, n: Int): Column =
    call_function("graft_shingle_hash60", toks, lit(n))

  /** 60-bit hashes of the DISTINCT shingle STRINGS, first-occurrence
    * order — dedupe happens on the window text BEFORE hashing, exactly
    * like the oracles' `list_distinct(shingles)` → md5 chain, so a
    * 60-bit collision between two distinct strings still contributes
    * two array entries (hash-then-dedupe would fold them). Same
    * projection-local one-pass discipline as [[hashShingles]].
    */
  def hashDistinctShingles(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements()
    val seen = new java.util.LinkedHashSet[String]()
    def window(from: Int, len: Int): String = {
      val sb = new java.lang.StringBuilder()
      var j = 0
      var first = true
      while (j < len) {
        if (!arr.isNullAt(from + j)) {
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(from + j).toString)
          first = false
        }
        j += 1
      }
      sb.toString
    }
    if (cnt < n) seen.add(window(0, cnt))
    else {
      var i = 0
      while (i <= cnt - n) { seen.add(window(i, n)); i += 1 }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = hash60(it.next().getBytes("UTF-8"))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Register `graft_shingle_hash60_distinct` (idempotent). */
  def registerDistinct(spark: SparkSession): Unit =
    Registry.once(spark, "graft_shingle_hash60_distinct")(
      exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_shingle_hash60_distinct expects 2 arguments, got ${exprs.length}")
        exprs(1) match {
          case Literal(v: Int, IntegerType) => ShingleHash60DistinctExpr(exprs.head, v)
          case other => throw new IllegalArgumentException(
            s"shingle width must be an int literal, got $other")
        }
      })

  /** Column-API form; requires [[registerDistinct]] on the session. */
  def shingleHash60Distinct(toks: Column, n: Int): Column =
    call_function("graft_shingle_hash60_distinct", toks, lit(n))
}

/** [[ShingleHash60Expr]]'s distinct twin — hashes of the distinct
  * shingle strings (see [[ShingleHash60.hashDistinctShingles]]).
  */
case class ShingleHash60DistinctExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hash60_distinct"

  override def nullSafeEval(input: Any): Any =
    ShingleHash60.hashDistinctShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.ShingleHash60.hashDistinctShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60DistinctExpr =
    copy(child = newChild)
}
