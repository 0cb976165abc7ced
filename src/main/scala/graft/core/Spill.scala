package graft.core

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Materialize a result WITHOUT collecting it to the driver.
  *
  * Iterative catalog queries (connected components, PageRank, the
  * minhash self-joins) persist/localCheckpoint intermediates; those
  * cached blocks must be released before the query returns because the
  * bench runs the whole catalog in one session. Releasing them while the
  * result still references their lineage would force a recompute — so
  * the result is first written to a temporary parquet (a distributed
  * write: each partition writes its own file, nothing funnels through
  * the driver), the caches are dropped, and a fresh scan of the spill is
  * returned. At 100 TB the result of e.g. PageRank is one row per node —
  * cluster-sized — and this path never materializes it on any single
  * node, unlike a `collect()`.
  *
  * Row order is not preserved by the rescan; the driver's parity check
  * sorts rows before hashing (tools/check_parity.py:27), so ordering is
  * cosmetic for catalog results.
  */
object Spill {

  /** Write `result` to a temp parquet, run `release` (drop caches /
    * checkpoints the result was built from), return a scan of the spill.
    */
  def materialize(result: DataFrame)(release: => Unit): DataFrame = {
    val s = result.sparkSession
    val dir = Files.createTempDirectory("graft-spill-").toFile
    dir.deleteOnExit()
    result.write.mode("overwrite").parquet(dir.getAbsolutePath)
    release
    s.read.parquet(dir.getAbsolutePath)
  }
}
