package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed user-defined aggregator: exact top-k strings by frequency
  * (row_number semantics: count desc, then value asc, exactly k rows).
  *
  * Buffer is the full count map — fine while the domain (vocabulary)
  * is bounded; at open-domain 100 TB scale the same API would hold a
  * CountMinSketch + bounded heap instead, trading exactness for O(k)
  * memory. The merge is associative/commutative, so Spark combines
  * partial maps map-side before the shuffle.
  */
final class TopKTokens[IN](k: Int, extract: IN => String)
    extends Aggregator[IN, Map[String, Long], Seq[TopKTokens.TokenCount]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], row: IN): Map[String, Long] = {
    val a = extract(row)
    b.updated(a, b.getOrElse(a, 0L) + 1L)
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) }

  override def finish(red: Map[String, Long]): Seq[TopKTokens.TokenCount] =
    red.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .map { case (t, c) => TopKTokens.TokenCount(t, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Seq[TopKTokens.TokenCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKTokens.TokenCount]]()
}

object TopKTokens {
  final case class TokenCount(token: String, cnt: Long)
}
