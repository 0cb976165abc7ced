package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism helper for CPU-bound projections.
  *
  * A projection chain (JSON parse, regex, hashing) executes inside the
  * SCAN stage, so it inherits the scan's split count. A small table
  * arriving as one parquet file is one split — the whole chain runs on
  * one core no matter how wide the cluster is (the r17 profile measured
  * q_json_path and the column profiler fully serialized at sf0.1).
  *
  * [[widen]] repartitions ONLY when the scan is narrower than the
  * cluster (`partitions < defaultParallelism`); on a big table whose
  * split count already meets or exceeds the core count it is a no-op,
  * so no extra full-data exchange ever appears at 100 TB — the
  * condition is the scale-adaptive knob (guide §2/§6), not a local
  * tuning constant.
  */
object Par {

  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
