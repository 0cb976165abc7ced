package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven column profiler — the first pass run against any new
  * table: per-column null count, exact distinct count, and numeric
  * range, computed in ONE scan.
  *
  * All per-column aggregates live in a single Aggregate node; the
  * multi-DISTINCT plan is Expand-based (the scan happens once, rows fan
  * out ×k for the k distinct aggregates). At 100 TB swap the exact NDV
  * for an HLL sketch (`approx_count_distinct`) — same plan shape minus
  * the Expand; exact NDV is the audit-grade default here because the
  * DuckDB oracle can check it bit-for-bit.
  *
  * Numeric columns range on their own axis (cast to double — exact
  * input values, nothing computed); timestamps and dates range on the
  * epoch-microseconds axis; every other type profiles null/NDV only.
  * Shared by the `q_column_profile` catalog query and [[graft.cli.ProfileMain]],
  * so the library surface and the CLI cannot drift.
  */
object Profiler {

  /** Per-column range axis, when the type has a meaningful order. */
  private def axis(f: StructField): Option[Column] = f.dataType match {
    case _: NumericType => Some(col(f.name).cast("double"))
    case _: TimestampType | _: TimestampNTZType | _: DateType =>
      // NTZ/date → instant under the session (UTC) clock, then epoch-us
      Some(unix_micros(col(f.name).cast("timestamp")).cast("double"))
    case _ => None
  }

  /** `(col_name, n_nulls, n_distinct, min_num, max_num)`, one row per
    * input column, ordered by name.
    */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "cannot profile a zero-column relation")
    val aggs = fields.flatMap { f =>
      Seq(
        sum(col(f.name).isNull.cast("long")).as(s"${f.name}__nulls"),
        countDistinct(col(f.name)).as(s"${f.name}__ndv")) ++
        axis(f).toSeq.flatMap(a =>
          Seq(min(a).as(s"${f.name}__min"), max(a).as(s"${f.name}__max")))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.map { f =>
      val (mn, mx) =
        if (axis(f).isEmpty)
          (lit(null).cast("double"), lit(null).cast("double"))
        else (col(s"${f.name}__min"), col(s"${f.name}__max"))
      struct(
        lit(f.name).as("col_name"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__ndv").as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }
}
