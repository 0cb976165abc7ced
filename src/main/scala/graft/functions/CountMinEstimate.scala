package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Estimate a key's frequency from a serialized count-min sketch (the
  * binary produced by Spark's `count_min_sketch` aggregate). Spark
  * ships the aggregate but no lookup function; this closes the loop.
  *
  * CodegenFallback is fine here: lookups run over a handful of probe
  * keys, never the 100 TB side. The deserialized sketch is memoized per
  * (identical) binary payload to avoid a parse per row.
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_cms_estimate"

  @transient private var cached: (Array[Byte], CountMinSketch) = _

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    if (cached == null || !java.util.Arrays.equals(cached._1, bytes)) {
      cached = (bytes,
        CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
    }
    cached._2
  }

  override def nullSafeEval(sketchBytes: Any, item: Any): Any =
    sketchFor(sketchBytes.asInstanceOf[Array[Byte]])
      .estimateCount(item.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}
