package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** T1 beyond AvailableNow: the reference's actual deployment mode is an
  * UNBOUNDED default-trigger job (`spark_streaming_kafka.py:37-44`) —
  * this spec runs the ingest chain on a ProcessingTime trigger against
  * a live directory, proves data arriving mid-run is picked up in later
  * micro-batches, and stops the query gracefully.
  */
class StreamContinuousSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def await(deadlineMs: Long = 60000)(cond: => Boolean): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < deadlineMs) Thread.sleep(100)
    cond
  }

  test("ProcessingTime trigger: >=2 micro-batches over a live source, graceful stop") {
    val dir = Files.createTempDirectory(Paths.get("target"), "cont_").toString
    val chk = Files.createTempDirectory(Paths.get("target"), "cont_chk_").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.mode("append").parquet(dir)

    val src = spark.readStream
      .schema("id BIGINT, s STRING")
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
      .withColumn("tag", concat(lit("row-"), col("s")))
    val q = src.writeStream
      .format("memory").queryName("cont_smoke").outputMode("append")
      .option("checkpointLocation", chk)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      assert(await()(spark.table("cont_smoke").count() == 3),
        "first batch never landed")
      // publish more data WHILE the query is running — a later trigger
      // must pick it up (the unbounded-job contract)
      Seq((4L, "d"), (5L, "e")).toDF("id", "s")
        .write.mode("append").parquet(dir)
      assert(await()(spark.table("cont_smoke").count() == 5),
        "second batch never landed")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 2,
        s"expected >=2 data micro-batches, saw $dataBatches")
      assert(spark.table("cont_smoke").select("tag").as[String].collect().toSet
        == Set("row-a", "row-b", "row-c", "row-d", "row-e"))
    } finally {
      q.stop()
      q.awaitTermination()
    }
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
  }
}
