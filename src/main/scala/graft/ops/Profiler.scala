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
  *
  * "ANY parquet table" is taken literally: columns are renamed
  * positionally before aggregating, so names containing dots (struct-
  * access syntax in a column reference) and duplicate names both
  * profile cleanly, and the null count coalesces to 0 on a zero-row
  * table (SUM over no rows is NULL).
  */
object Profiler {

  /** Per-column range axis, when the type has a meaningful order. */
  private def axis(name: String, f: StructField): Option[Column] = f.dataType match {
    case _: NumericType => Some(col(name).cast("double"))
    case _: TimestampType | _: TimestampNTZType | _: DateType =>
      // NTZ/date → instant under the session (UTC) clock, then epoch-us
      Some(unix_micros(col(name).cast("timestamp")).cast("double"))
    case _ => None
  }

  /** `(col_name, n_nulls, n_distinct, min_num, max_num)`, one row per
    * input column, ordered by name (duplicate input names yield one row
    * each, in position order).
    */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "cannot profile a zero-column relation")
    // The Expand-based multi-DISTINCT fans every row out ×k INSIDE the
    // scan stage, so the profile inherits the SCAN's parallelism — a
    // one-file table ran the whole ×k expansion on one core (6.4 s
    // single-task at sf0.1). Par.widen is a no-op once splits ≥ cores,
    // so no extra full-data exchange appears at scale (guide §2.4).
    val safe = Par.widen(df).toDF(fields.indices.map(i => s"c_$i"): _*)
    val aggs = fields.indices.flatMap { i =>
      Seq(
        coalesce(sum(col(s"c_$i").isNull.cast("long")), lit(0L))
          .as(s"c_${i}__nulls"),
        countDistinct(col(s"c_$i")).as(s"c_${i}__ndv")) ++
        axis(s"c_$i", fields(i)).toSeq.flatMap(a =>
          Seq(min(a).as(s"c_${i}__min"), max(a).as(s"c_${i}__max")))
    }
    val wide = safe.agg(aggs.head, aggs.tail: _*)
    val rows = fields.indices.map { i =>
      val f = fields(i)
      val (mn, mx) =
        if (axis(s"c_$i", f).isEmpty)
          (lit(null).cast("double"), lit(null).cast("double"))
        else (col(s"c_${i}__min"), col(s"c_${i}__max"))
      struct(
        lit(f.name).as("col_name"),
        col(s"c_${i}__nulls").as("n_nulls"),
        col(s"c_${i}__ndv").as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }
}
