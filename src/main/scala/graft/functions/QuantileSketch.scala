package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketches over Spark's own Greenwald-Khanna
  * implementation (`catalyst.util.QuantileSummaries` — the machinery
  * behind `approxQuantile`/`percentile_approx`), surfaced as a STORABLE
  * sketch: [[QuantileSketchBuild]] folds doubles into a serialized
  * sketch column (the nightly job), [[QuantileSketchMerge]] unions
  * stored sketches and answers quantiles (the rollup read) — the
  * quantile companion to the HLL union rollup (`q_hll_merge_rollup`).
  *
  * GK guarantees rank error ≤ ε·n per sketch and merging preserves the
  * bound for same-ε sketches, so month-level quantiles from day
  * sketches carry the same accuracy contract as a direct pass — the
  * property that makes "keep sketches, never rescan" the 100 TB
  * strategy. Serialization is plain java (QuantileSummaries is
  * `Serializable`); a sketch at ε=0.01 is a few KB regardless of n.
  */
object QuantileSketch {

  def serialize(qs: QuantileSummaries): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.ObjectOutputStream(bos)
    o.writeObject(qs.compress())
    o.close()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries =
    new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[QuantileSummaries]

  def empty(relativeError: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)
}

/** Build phase: doubles → one serialized GK sketch per group. */
final class QuantileSketchBuild[IN](extract: IN => Double,
    relativeError: Double = 0.01)
    extends Aggregator[IN, QuantileSummaries, Array[Byte]] {

  override def zero: QuantileSummaries = QuantileSketch.empty(relativeError)

  override def reduce(b: QuantileSummaries, row: IN): QuantileSummaries =
    b.insert(extract(row))

  override def merge(x: QuantileSummaries, y: QuantileSummaries): QuantileSummaries =
    x.compress().merge(y.compress())

  override def finish(red: QuantileSummaries): Array[Byte] =
    QuantileSketch.serialize(red)

  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.javaSerialization[QuantileSummaries]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Rollup phase: stored sketch columns → quantile estimates at the
  * requested probabilities, without revisiting any raw row.
  */
final class QuantileSketchMerge[IN](extract: IN => Array[Byte],
    probs: Seq[Double], relativeError: Double = 0.01)
    extends Aggregator[IN, QuantileSummaries, Seq[Double]] {

  override def zero: QuantileSummaries = QuantileSketch.empty(relativeError)

  override def reduce(b: QuantileSummaries, row: IN): QuantileSummaries =
    b.compress().merge(QuantileSketch.deserialize(extract(row)))

  override def merge(x: QuantileSummaries, y: QuantileSummaries): QuantileSummaries =
    x.compress().merge(y.compress())

  override def finish(red: QuantileSummaries): Seq[Double] = {
    val c = red.compress()
    probs.map(p => c.query(p).getOrElse(Double.NaN))
  }

  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.javaSerialization[QuantileSummaries]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
