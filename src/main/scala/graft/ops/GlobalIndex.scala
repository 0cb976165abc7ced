package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Total-order global row numbering that stays distributed.
  *
  * `row_number() OVER (ORDER BY ...)` declares an empty window partition,
  * so Spark funnels the ENTIRE table through one task — the classic
  * cliff between "works at sf0.1" and "dies at 100 TB". The scalable
  * shape is two phases:
  *
  *   1. `orderBy` — a range repartition (sampled bounds) + per-partition
  *      sort; partitions are globally ordered but work is spread across
  *      the cluster.
  *   2. `zipWithIndex` — one tiny job counts rows per partition, prefix
  *      sums give each partition its starting offset, then every
  *      partition labels its own rows locally.
  *
  * Total cost: the sort shuffle plus one count job — no single-task
  * bottleneck at any width. Ties must be broken by a unique column in
  * `sortCols`, otherwise the assignment at range-partition boundaries is
  * input-order dependent.
  */
object GlobalIndex {

  def withRowNumber(df: DataFrame, sortCols: Seq[Column], out: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** EXCLUSIVE global running total of long column `valueCol` in
    * `sortCols` order — the prefix-sum generalization of
    * [[withRowNumber]], same two-phase shape: range-sort, one light job
    * summing each partition, prefix offsets (one long per partition on
    * the driver), then every partition labels its own rows locally.
    * `SUM(...) OVER (ORDER BY ...)` would funnel the table through one
    * task; this never does, at any width. The result is independent of
    * the sampled range boundaries because prefix sums over a total
    * order are partition-agnostic.
    */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column], valueCol: String,
      out: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(idx))
      Iterator.single(i -> s)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val labeled = rdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val start = acc
        acc += r.getLong(idx)
        Row.fromSeq(r.toSeq :+ start)
      }
    }
    spark.createDataFrame(labeled, schema)
  }
}
