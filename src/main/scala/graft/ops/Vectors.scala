package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns.
  *
  * Dot products are a sequential left fold (`aggregate` over `zip_with`)
  * in double precision — bit-identical to the oracle's fold and
  * deterministic regardless of partitioning, because the fold happens
  * inside one row, not across rows. No UDFs, no shuffles.
  *
  * Scale path: brute-force top-k is the correctness baseline; the IVF
  * variant (`graft.catalog.SimilaritySearch`) prunes candidates by
  * nearest-centroid bucketing so the pairwise compare is bucket-local.
  */
object Vectors {

  /** Cast float embedding to double for stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — the native codegen'd expression
    * ([[graft.functions.ArrayDotProduct]]); call [[register]] on the
    * session first. Bit-identical to [[dotHof]].
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct.dot(a, b)

  /** Reference formulation via built-in higher-order functions; runs
    * interpreted (HOFs don't codegen) — kept for differential testing
    * against the native expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Make [[dot]] resolvable on this session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.ArrayDotProduct.register(spark)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity computed as dot / (sqrt(dot_aa) * sqrt(dot_bb)) —
    * the exact operand order the oracle uses.
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
