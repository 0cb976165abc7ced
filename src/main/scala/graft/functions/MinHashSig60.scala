package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: the full k-function MinHash signature of
  * a token array in ONE projection-local pass.
  *
  * Convention-identical to [[graft.ops.Text.minhashSigDF]]'s previous
  * explode → per-hash md5 → groupBy-min plan: hash function i of
  * shingle s is `hash60("i:" || s)` over the n-token space-joined
  * windows (whole token string as the single shingle when the document
  * is shorter than n), and the signature component is the minimum over
  * windows. The native form removes BOTH hot spots of that plan — the
  * interpreted `wordShingles` HOF (slice+concat per window) and the
  * generator + k-column min aggregation (one output row per window,
  * re-aggregated) — computing the k minima in a single JVM loop that
  * whole-stage codegen inlines into the scan stage. At 100 TB the
  * signature step becomes pure map-side projection work with no
  * generator blow-up; only the k·8-byte signatures move downstream.
  * DuckDB reproduces every component bit-for-bit (the catalog's sigSqls
  * CTEs), so all MinHash oracles are unchanged.
  */
case class MinHashSig60Expr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n >= 1 && k >= 1, "shingle width and hash count must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_sig60"

  override def nullSafeEval(input: Any): Any =
    MinHashSig60.sig(input.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.MinHashSig60.sig($c, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig60Expr =
    copy(child = newChild)
}

object MinHashSig60 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** hash60 of prefix ++ payload — `conv(substring(md5(..),1,15),16,10)`. */
  private def hash60(prefix: Array[Byte], payload: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    d.update(prefix)
    val dig = d.digest(payload)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Space-join tokens [from, from+len), skipping nulls like concat_ws. */
  private def windowBytes(arr: ArrayData, from: Int, len: Int): Array[Byte] = {
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
    sb.toString.getBytes("UTF-8")
  }

  /** Called from both interpreted eval and generated code. */
  def sig(arr: ArrayData, n: Int, k: Int): ArrayData = {
    val prefixes = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) { prefixes(i) = s"$i:".getBytes("UTF-8"); i += 1 }
    val mins = Array.fill(k)(Long.MaxValue)
    val cnt = arr.numElements()
    def fold(from: Int, len: Int): Unit = {
      val payload = windowBytes(arr, from, len)
      var f = 0
      while (f < k) {
        val h = hash60(prefixes(f), payload)
        if (h < mins(f)) mins(f) = h
        f += 1
      }
    }
    if (cnt < n) fold(0, cnt)
    else {
      var w = 0
      while (w <= cnt - n) { fold(w, n); w += 1 }
    }
    new GenericArrayData(mins)
  }

  /** Register `graft_minhash_sig60` (idempotent); args 2 and 3 must be
    * foldable int literals — shingle width and hash count.
    */
  def register(spark: SparkSession): Unit =
    Registry.once(spark, "graft_minhash_sig60")(
      exprs => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"graft_minhash_sig60 expects 3 arguments (tokens, shingle width, hash count), got ${exprs.length}")
        (exprs(1), exprs(2)) match {
          case (Literal(n: Int, IntegerType), Literal(k: Int, IntegerType)) =>
            MinHashSig60Expr(exprs.head, n, k)
          case other => throw new IllegalArgumentException(
            s"shingle width / hash count must be int literals, got $other")
        }
      })

  /** Column-API form; requires [[register]] on the running session. */
  def minhashSig60(toks: Column, n: Int, k: Int): Column =
    call_function("graft_minhash_sig60", toks, lit(n), lit(k))
}
