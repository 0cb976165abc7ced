package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Ingest, Stateful}

/** Out-of-order sessionization across REAL micro-batches.
  *
  * The 1h watermark delay vs the 30m session gap means a later
  * micro-batch may legally carry events that (a) precede the currently
  * open session's start, (b) land inside an already-separate pending
  * session, or (c) BRIDGE two pending sessions into one. The
  * catalog oracle (q_stream_session_timers) only exercises a single
  * sorted batch; this spec drives SessionTimerProcessor through three
  * paced batches and checks the general merge rule.
  */
class SessionTimersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) =
    Files.createTempDirectory(Paths.get("target"), p).toString

  // (user_id, event_id, t_seconds) per batch; gap = 1800 s, wm delay 1 h
  private val batches: Seq[Seq[(Long, Long, Long)]] = Seq(
    // batch 0: user 1 opens a session; user 2 control event
    Seq((1L, 1L, 1000L), (1L, 2L, 2000L), (2L, 10L, 1000L)),
    // batch 1: e3 EXTENDS BACKWARD (1000-400 < 1800); e4 opens a second
    // pending session (5000-2000 >= 1800)
    Seq((1L, 3L, 400L), (1L, 4L, 5000L)),
    // batch 2: e5 BRIDGES the two pending sessions (3500-2000 < 1800 and
    // 5000-3500 < 1800); user 2 in-order tail; user 9 advances the
    // watermark to 100000-3600 so both finished sessions flush. User 9's
    // own session end (101800) stays above the final watermark and must
    // NOT emit.
    Seq((1L, 5L, 3500L), (2L, 11L, 1500L), (9L, 90L, 100000L)))

  test("out-of-order batches: backward extend, bridge, watermark flush") {
    val src = tmp("sess_src_")
    batches.zipWithIndex.foreach { case (rows, b) =>
      rows.toDF("user_id", "event_id", "t")
        .select(col("user_id"), col("event_id"),
          timestamp_seconds(col("t")).as("ts"))
        .coalesce(1).write.parquet(s"$src/batch_$b")
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*")
      val out = Ingest.runToMemory(Stateful.sessionsViaTimers(stream).toDF())
        .orderBy("user_id", "session_start")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(out == Seq(
        // user 1: one merged session [400, 5000+1800) with all 5 events
        (1L, 400L, 6800L, 5L),
        // user 2: plain in-order session [1000, 1500+1800)
        (2L, 1000L, 3300L, 2L)))
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
