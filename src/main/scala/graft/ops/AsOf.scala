package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left-side event, the most recent right-side
  * event at-or-before it, per key.
  *
  * The reference's 5-way merge on exact timestamps is an as-of join
  * with zero tolerance (SURVEY.md §2.3); this is the tolerance-full
  * generalization. Spark has no native as-of operator, so it is
  * composed as the classic union + last(ignoreNulls) running window:
  * tag both sides, union, sort within key, carry the last right-side
  * value forward. ONE shuffle on (key), no range-explosion — the same
  * plan shape a dedicated as-of SparkPlan would produce, and the form
  * that scales: state per key is a single carried value, so a 100 TB
  * union sorts within partitions after a hash partition on key.
  */
object AsOf {

  /** @param left      probe side
    * @param right     reference side (values carried forward)
    * @param keyCols   equi-key columns present on both sides
    * @param timeCol   event-time column present on both sides
    * @param payload   right-side column to carry (as-of value)
    * @param outCol    name for the carried column on the left rows
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, payload: String, outCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(right.schema(payload).dataType))
    // null-time right rows are never "at or before" anything — drop them
    // here so the nulls-first window sort can't leak them into null-time
    // left rows (keeps semantics aligned with the native AsOfJoinExec)
    val r = right.filter(col(timeCol).isNotNull)
      .select(keyCols.map(col) :+ col(timeCol) :+ col(payload).as("__asof"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*).unionByName(l)
    // right rows sort before left rows at the same instant (__side 0 < 1):
    // an exact-tie right value IS visible to the left row (at-or-before)
    // third sort key makes equal-timestamp right rows deterministic
    // (carried value = max payload at that instant)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__asof").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol, last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__asof")
  }

  /** Forward as-of join: for every left-side event, the EARLIEST
    * right-side event at-or-after it, per key — the look-ahead twin of
    * [[joinAsOf]] ("what happened next"), same union + one-shuffle
    * window shape with the frame mirrored to (currentRow,
    * unboundedFollowing). Tie rules mirror too: a right row at exactly
    * the left row's instant IS visible (left sorts before right at the
    * same time via `__side` DESC), and equal-time right rows resolve to
    * the minimum payload (first in payload order).
    */
  def joinAsOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, payload: String, outCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(right.schema(payload).dataType))
    val r = right.filter(col(timeCol).isNotNull)
      .select(keyCols.map(col) :+ col(timeCol) :+ col(payload).as("__asof"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*).unionByName(l)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").desc, col("__asof").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn(outCol, first(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__asof")
  }
}
