package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB state-store choice: the default HDFS-backed provider
  * keeps ALL streaming state in executor heap; RocksDB spills to local
  * disk and is the provider a real large-state deployment runs. The
  * engine's streaming operators must be provider-agnostic — same
  * results under both.
  *
  * A separate session is built here because the provider is fixed per
  * query from its first checkpoint.
  */
class StateStoreSpec extends AnyFunSuite {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The provider is a runtime conf read at each query's first
    * checkpoint — set it on the shared test session and restore after
    * (a fresh builder would just getOrCreate the same session).
    */
  private def withRocksSession[A](f: SparkSession => A): A = {
    val spark = TestSpark.spark
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try f(spark)
    finally prev.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
  }

  test("watermarked dedup + windowed agg produce identical results under RocksDB state store") {
    withRocksSession { spark =>
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
      val dir = "/root/testdata/sf0.001"

      // stateful op 1: watermarked streaming dedup of a duplicated feed
      def side = graft.streaming.Ingest.eventsStream(spark, dir)
        .select("event_id", "user_id", "event_type", "value", "ts")
      val deduped = graft.streaming.Ingest.runToMemory(
        side.unionByName(side)
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("event_id")
          .drop("ts"))
      val batch = graft.core.Tables.events(spark, dir)
      assert(deduped.count() == batch.count())

      // stateful op 2: windowed aggregation, complete mode
      val agg = graft.streaming.Ingest.runToMemory(
        graft.streaming.Ingest.eventsStream(spark, dir)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n")),
        mode = "complete")
      val aggBatch = batch
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      assert(agg.agg(sum("n")).head.getLong(0) == batch.count())
      assert(agg.count() == aggBatch.count())
    }
  }
}
