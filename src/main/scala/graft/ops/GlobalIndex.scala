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
}
