package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pluggable index stores reproducing the reference's two Elasticsearch
  * sink semantics (SURVEY.md §2.8) against a local parquet store — the
  * zero-egress stand-in the sink trait was designed for (§7.1 step 4):
  *
  *  - K3 (`es.mapping.id=room`, `spark_streaming_kafka.py:41`):
  *    upsert-by-key, last write per key wins — the store never holds
  *    more than one doc per key.
  *  - K4 (`kafka_to_es.py:55-71`): append-only with dynamic per-key
  *    index routing (`room-{room}`); duplicates possible on retry
  *    (at-least-once), so replays are tolerated, not deduped.
  *  - K5 (`kafka_to_es.py:7-14`): health preflight before starting the
  *    stream.
  *
  * Scale notes: the upsert store does read-merge-overwrite per
  * micro-batch, which is correct but O(store) per batch — the
  * production path is an upsert-capable table format (Delta/Iceberg
  * MERGE) or the ES bulk API with doc ids; the micro-batch reduction
  * (latest-per-key BEFORE touching the store) is the part that carries
  * to 100 TB, since it shrinks each batch to ≤ |keys| rows map-side.
  */
trait IndexStore {
  def healthCheck(): Boolean
  def read(spark: SparkSession): DataFrame
}

/** K3: last-write-wins keyed store. `orderCol` breaks ordering within a
  * batch (event time, then a unique tiebreaker).
  */
final class UpsertParquetStore(root: String, keyCol: String, orderCols: Seq[String])
    extends IndexStore {

  private val dir = new java.io.File(root)

  override def healthCheck(): Boolean = { dir.mkdirs(); dir.canWrite }

  private def latestPerKey(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Micro-batch upsert: reduce the batch to latest-per-key, merge with
    * the store, keep the winner per key, overwrite atomically (write to
    * a versioned subdir, then flip a pointer file).
    */
  def upsert(batch: DataFrame, batchId: Long): Unit = synchronized {
    val spark = batch.sparkSession
    val reduced = latestPerKey(batch)
    val current = currentVersion()
    val merged = current match {
      case Some(v) =>
        val existing = spark.read.parquet(s"$root/v$v")
        latestPerKey(existing.unionByName(reduced))
      case None => reduced
    }
    val next = current.getOrElse(-1L) + 1
    merged.write.mode(SaveMode.Overwrite).parquet(s"$root/v$next")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/CURRENT"), next.toString)
    // GC superseded versions (keep the immediate predecessor so an
    // in-flight reader of the old CURRENT finishes cleanly)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .filter(_.getName.drop(1).toLongOption.exists(_ < next - 1))
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  private def currentVersion(): Option[Long] = {
    val p = java.nio.file.Paths.get(s"$root/CURRENT")
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim.toLong)
    else None
  }

  override def read(spark: SparkSession): DataFrame =
    currentVersion() match {
      case Some(v) => spark.read.parquet(s"$root/v$v")
      case None    => spark.emptyDataFrame
    }
}

/** K4: append-only store with dynamic index routing — each row lands in
  * `index=<prefix><key>/`. Hive-style partitioned parquet gives the
  * same "one index per key" layout the per-row `es.index(index=...)`
  * loop produced, but as bulk columnar writes.
  */
final class RoutedAppendStore(root: String) extends IndexStore {

  private val dir = new java.io.File(root)

  override def healthCheck(): Boolean = { dir.mkdirs(); dir.canWrite }

  def append(batch: DataFrame, indexCol: String): Unit =
    batch.withColumn("index", col(indexCol))
      .write.mode(SaveMode.Append).partitionBy("index").parquet(root)

  override def read(spark: SparkSession): DataFrame =
    spark.read.parquet(root)
}
