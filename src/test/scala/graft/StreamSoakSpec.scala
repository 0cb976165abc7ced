package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Marks the long-run streaming soak; excluded from the default
  * `sbt test` run (build.sbt `Tests.Argument("-l", "graft.Soak")`).
  * Run it explicitly with:
  *   GRAFT_SOAK=1 sbt 'testOnly graft.StreamSoakSpec'
  * (GRAFT_SOAK=1 lifts build.sbt's `-l graft.Soak` exclusion, which
  * would otherwise cancel even an explicit `-n graft.Soak` run.)
  * Duration is GRAFT_SOAK_SECONDS (default 330 — ≥5 minutes of
  * micro-batches, the verdict-task spec).
  */
object Soak extends Tag("graft.Soak")

/** Long-run steady-state soak for the watermarked session-window
  * shape (q_stream_session_window's plan family): a feeder thread
  * paces event files onto a file source (~2 ticks/s, one user cohort
  * per 10 ticks so every cohort eventually goes SILENT — its sessions
  * close on the 30 s gap and, once the 60 s watermark passes their
  * end, evict from the state store). StreamContinuousSpec smoke-tests
  * that unbounded ProcessingTime triggers WORK; this spec measures the
  * property a long-lived deployment actually needs — state-store size
  * PLATEAUS once watermark eviction kicks in (state ≈ the active
  * cohort window, not the stream's history) — and records the two
  * steady-state numbers (rows/s end-to-end, p95 batch latency) that
  * PLANS.md tracks per round.
  */
class StreamSoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("session-window soak: state plateaus under watermark eviction; throughput and p95 recorded", Soak) {
    val soakSec = sys.env.get("GRAFT_SOAK_SECONDS").map(_.toInt).getOrElse(330)
    val dir = Files.createTempDirectory(Paths.get("target"), "soak_src_").toString
    val chk = Files.createTempDirectory(Paths.get("target"), "soak_chk_").toString

    // ---- feeder: 2 ticks/s, 500 rows/tick, cohort rotates every 10
    // ticks (cohort c = users 100c..100c+99, 5 events per user per
    // tick, event time = wall time) — a cohort falls silent after its
    // 10 ticks, so its sessions close and later evict
    @volatile var feeding = true
    @volatile var fed = 0L
    val feeder = new Thread(() => {
      var tick = 0L
      while (feeding) {
        val cohort = tick / 10
        val base = java.time.Instant.now()
        val rows = (0 until 100).flatMap { u =>
          (0 until 5).map { i =>
            (100L * cohort + u,
              java.sql.Timestamp.from(base.plusMillis(i * 50L)))
          }
        }
        import spark.implicits._
        rows.toDF("user_id", "ts")
          .coalesce(1)
          .write.mode("append").parquet(dir)
        fed += rows.size
        tick += 1
        Thread.sleep(500)
      }
    }, "soak-feeder")
    feeder.setDaemon(true)

    // ---- progress capture: recentProgress caps at 100 entries; a 5+
    // minute soak produces more, so accumulate via a listener
    final case class Snap(batchId: Long, inputRows: Long, stateRows: Long,
        execMs: Long)
    val snaps = new ConcurrentLinkedQueue[Snap]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val state = if (p.stateOperators.nonEmpty)
          p.stateOperators.map(_.numRowsTotal).sum else 0L
        val exec = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
        snaps.add(Snap(p.batchId, p.numInputRows, state, exec))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val q = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP")
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "8")
      .parquet(dir)
      .withWatermark("ts", "60 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    val t0 = System.nanoTime()
    feeder.start()
    try {
      Thread.sleep(soakSec * 1000L)
    } finally {
      feeding = false
      feeder.join(5000)
      // let the in-flight batch finish, then stop cleanly
      Thread.sleep(2000)
      q.stop()
      q.awaitTermination(30000)
      spark.streams.removeListener(listener)
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val all = snaps.asScala.toVector.sortBy(_.batchId)
    assert(all.size >= 50, s"soak produced only ${all.size} micro-batches")

    // ---- plateau: once eviction engages, state tracks the ACTIVE
    // cohort window, not stream age. Compare the mid-run band (25-75%)
    // with the final quarter: a leak grows state linearly with time,
    // so the final quarter's MAX would clear mid-band max by ~33% at
    // these proportions; a plateau holds it within noise.
    val n = all.size
    val mid = all.slice(n / 4, 3 * n / 4).map(_.stateRows)
    val tail = all.drop(3 * n / 4).map(_.stateRows)
    assert(mid.nonEmpty && tail.nonEmpty)
    val midMax = mid.max.toDouble
    val tailMax = tail.max.toDouble
    assert(midMax > 0, "state never populated — the soak did not run")
    assert(tailMax <= midMax * 1.15,
      f"state-store rows still growing at soak end: mid-run max $midMax%.0f " +
        f"vs final-quarter max $tailMax%.0f (leak: watermark eviction not keeping up)")

    // ---- the two PLANS.md numbers
    val totalRows = all.map(_.inputRows).sum
    val rowsPerSec = totalRows / elapsedSec
    val execs = all.map(_.execMs).sorted
    val p95 = execs((execs.size * 95) / 100 min (execs.size - 1))
    val report =
      f"""{"soak_sec":$elapsedSec%.0f,"micro_batches":${all.size},"rows_in":$totalRows,""" +
        f""""rows_per_sec":$rowsPerSec%.1f,"p95_batch_ms":$p95,""" +
        f""""state_rows_mid_max":${midMax.toLong},"state_rows_tail_max":${tailMax.toLong}}"""
    java.nio.file.Files.write(Paths.get("target", "soak_report.json"),
      report.getBytes("UTF-8"))
    info(report)
    assert(rowsPerSec > 100, f"soak throughput collapsed: $rowsPerSec%.1f rows/s")
  }

  /** The CAPACITY soak (round 14): the session-window soak above
    * proves watermark EVICTION (state plateaus at the active cohort —
    * 1600 rows), which says nothing about what happens when state is
    * supposed to grow large. This profile runs streaming
    * `dropDuplicates` — unbounded dedup state by design — on the
    * RocksDB state store with a feeder minting ~45k FRESH keys/s plus
    * a 10% re-emission of old keys (exercising the read path), so
    * state passes ≥1M rows within the first minute and keeps growing
    * for the whole run. The property measured: THROUGHPUT HOLDS as
    * state grows past any comfortable in-heap size — rows/s in the
    * final third of the run must stay within 2× of the first third
    * (RocksDB's LSM absorbs the growth; an in-memory provider would
    * degrade toward GC collapse). Also records p95 batch latency,
    * final state rows, and the on-disk size of the state store
    * checkpoint — appended to target/soak_report.json as a second
    * profile line.
    */
  test("high-cardinality dedup soak: RocksDB state passes 1M+ keys, throughput holds as state grows", Soak) {
    val soakSec = sys.env.get("GRAFT_SOAK_HIGHCARD_SECONDS").map(_.toInt).getOrElse(240)
    val dir = Files.createTempDirectory(Paths.get("target"), "soakhc_src_").toString
    val chk = Files.createTempDirectory(Paths.get("target"), "soakhc_chk_").toString

    // feeder: 2 ticks/s × 22,500 rows/tick = 45k rows/s; 90% fresh
    // monotone keys, 10% re-emissions sampled from the minted range
    @volatile var feeding = true
    val feeder = new Thread(() => {
      var next = 0L
      val rnd = new scala.util.Random(20260816L)
      while (feeding) {
        val fresh = (0 until 20250).map { i => next + i }
        val dups = (0 until 2250).map { _ =>
          if (next == 0) 0L else math.abs(rnd.nextLong()) % (next + 20250) }
        next += 20250
        import spark.implicits._
        (fresh ++ dups).toDF("key")
          .coalesce(1)
          .write.mode("append").parquet(dir)
        Thread.sleep(500)
      }
    }, "soakhc-feeder")
    feeder.setDaemon(true)

    final case class Snap(batchId: Long, inputRows: Long, stateRows: Long,
        execMs: Long)
    val snaps = new ConcurrentLinkedQueue[Snap]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val state = if (p.stateOperators.nonEmpty)
          p.stateOperators.map(_.numRowsTotal).sum else 0L
        val exec = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
        snaps.add(Snap(p.batchId, p.numInputRows, state, exec))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = spark.readStream
      .schema("key BIGINT")
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "8")
      .parquet(dir)
      .dropDuplicates("key")
      .writeStream
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    val t0 = System.nanoTime()
    feeder.start()
    try {
      Thread.sleep(soakSec * 1000L)
    } finally {
      feeding = false
      feeder.join(5000)
      Thread.sleep(2000)
      q.stop()
      q.awaitTermination(30000)
      spark.streams.removeListener(listener)
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val all = snaps.asScala.toVector.sortBy(_.batchId)
    assert(all.size >= 50, s"soak produced only ${all.size} micro-batches")

    val finalState = all.last.stateRows
    assert(finalState >= 1000000L,
      s"state never reached 1M keys ($finalState) — feeder or dedup broke")

    // throughput must HOLD as state grows: compare thirds (drop the
    // first 10% as warmup). Guard is one-sided and generous (2×):
    // the failure mode hunted is collapse, not noise.
    val warm = all.drop(all.size / 10)
    val third = warm.size / 3
    def rate(s: Vector[Snap]): Double =
      s.map(_.inputRows).sum.toDouble / math.max(1L, s.map(_.execMs).sum) * 1000
    val early = rate(warm.take(third))
    val late = rate(warm.drop(2 * third))
    assert(late >= early / 2,
      f"throughput decayed with state growth: $early%.0f -> $late%.0f rows/s " +
        f"at $finalState state rows")

    // on-disk state store footprint (checkpoint state/ subtree)
    def du(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
    val stateBytes = du(Paths.get(chk, "state"))

    val totalRows = all.map(_.inputRows).sum
    val rowsPerSec = totalRows / elapsedSec
    val execs = all.map(_.execMs).sorted
    val p95 = execs((execs.size * 95) / 100 min (execs.size - 1))
    val report =
      f"""{"profile":"highcard_dedup_rocksdb","soak_sec":$elapsedSec%.0f,""" +
        f""""micro_batches":${all.size},"rows_in":$totalRows,""" +
        f""""rows_per_sec":$rowsPerSec%.1f,"p95_batch_ms":$p95,""" +
        f""""state_rows_final":$finalState,"state_disk_bytes":$stateBytes,""" +
        f""""rows_per_sec_early_third":$early%.1f,"rows_per_sec_late_third":$late%.1f}"""
    // append as a second profile line next to the session-window soak
    java.nio.file.Files.write(Paths.get("target", "soak_report.json"),
      ("\n" + report + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    info(report)
  }
}
