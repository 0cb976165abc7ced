package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.{ArrayDotProduct, ArraySqDist, RewriteHofDot}
import graft.ops.Vectors

/** The Rule[LogicalPlan] surface: the HOF dot-product pattern rewrites
  * to the native expression, bit-exactly, and ONLY that pattern.
  */
class RewriteHofDotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteHofDot
    try f finally spark.experimental.extraOptimizations = before
  }

  /** A literal Seq becomes a LocalRelation the optimizer folds eagerly,
    * so route fixtures through parquet like real input.
    */
  private def viaParquet(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "hofdot_").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private lazy val vecs = viaParquet(Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.5, -1.5, 2.5), Array(2.0, 0.25, -4.0))
  ).toDF("id", "a", "b"))

  test("aggregate-zip_with dot rewrites to graft_dot and matches bit-exactly") {
    // QueryExecution memoizes per DataFrame — build a fresh plan on
    // each side of the rule installation
    def build() = vecs.select(col("id"), Vectors.dotHof(col("a"), col("b")).as("d"))
    val plain = build().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    withRule {
      val df = build()
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.expressions.flatMap(_.collect {
        case d: ArrayDotProduct => d
      }).nonEmpty, s"rule did not fire:\n$optimized")
      val rewritten = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rewritten == plain) // bit-exact: same IEEE fold order
    }
  }

  test("null semantics survive the rewrite: length mismatch and null element") {
    withRule {
      val df = viaParquet(Seq(
        (1L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0)),
        (2L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 1.0)),
        (3L, Array.empty[java.lang.Double], Array.empty[java.lang.Double])
      ).toDF("id", "a", "b"))
        .select(col("id"),
          Vectors.dotHof(col("a").cast("array<double>"), col("b").cast("array<double>")).as("d"))
      val out = df.orderBy("id").collect()
      assert(out(0).isNullAt(1) && out(1).isNullAt(1))
      assert(out(2).getDouble(1) == 0.0)
    }
  }

  test("a -0.0 seed is NOT rewritten: empty arrays must return the seed bit-exactly") {
    withRule {
      def fold(seed: Double) = aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y), lit(seed), (acc, x) => acc + x)
      val df = viaParquet(Seq((1L, Array.empty[Double], Array.empty[Double]))
        .toDF("id", "a", "b"))
        .select(fold(-0.0).as("neg"), fold(0.0).as("pos"))
      // -0.0 == 0.0 under IEEE, so assert on raw bits
      assert(df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
        case d: ArrayDotProduct => d
      }).size == 1, "only the +0.0 seed may rewrite")
      val r = df.collect()(0)
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(-0.0))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) == 0L)
    }
  }

  test("the squared-difference fold rewrites to graft_sqdist, bit-exactly (r17)") {
    def build() = vecs.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val plain = build().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    withRule {
      val df = build()
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.expressions.flatMap(_.collect {
        case d: ArraySqDist => d
      }).nonEmpty, s"sqdist rule did not fire:\n$optimized")
      assert(optimized.expressions.flatMap(_.collect {
        case d: ArrayDotProduct => d
      }).isEmpty)
      val rewritten = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rewritten == plain) // bit-exact: same IEEE fold order
      assert(rewritten(1L) == 27.0)
    }
  }

  test("sqdist rewrite keeps HOF null semantics; mixed-operand folds stay untouched") {
    withRule {
      // null element and length mismatch -> NULL, like the HOF chain
      val nd = viaParquet(Seq(
        (1L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0)),
        (2L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 1.0)))
        .toDF("id", "a", "b"))
        .select(col("id"),
          aggregate(zip_with(col("a").cast("array<double>"),
              col("b").cast("array<double>"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x).as("d"))
        .orderBy("id").collect()
      assert(nd(0).isNullAt(1) && nd(1).isNullAt(1))
      // (x - y) * (y - x) is NOT a square — must not rewrite
      val other = vecs.select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (y - x)),
          lit(0.0), (acc, x) => acc + x).as("d"))
      assert(other.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
        case d: ArraySqDist => d
      }).isEmpty, "asymmetric product must not rewrite")
    }
  }
}
