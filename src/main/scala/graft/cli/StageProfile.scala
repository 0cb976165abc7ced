package graft.cli

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one catalog query: which stage dominates its
  * wall clock at a given scale factor. Drives the scale-curve
  * adjudications (BENCH_SCALE_*.json `_doc` entries): a superlinear
  * decade ratio is only actionable once the GROWING stage is named —
  * tokenize/explode volume, a shuffle, or a final sort have different
  * fixes.
  *
  * Usage: StageProfile <sfDir> <queryName> [passes]
  * Prints one JSON line per stage (submitted order) with wall ms,
  * summed task time, shuffle read/write bytes, records, then a
  * `top_stages` line sorted by task time.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProfile <sfDir> <queryName> [passes]")
    val Array(sfDir, name) = args.take(2)
    val passes = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Stage(id: Int, nameLine: String, wallMs: Long,
        taskMs: Long, shufReadMB: Double, shufWriteMB: Double,
        inRecords: Long, outRecords: Long)
    val stages = ArrayBuffer.empty[Stage]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += Stage(
            si.stageId,
            si.name.linesIterator.next(),
            (for { c <- si.completionTime; s <- si.submissionTime }
              yield c - s).getOrElse(-1L),
            m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    val fn = graft.SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      // same materialization as Bench: full plan through the noop sink
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async (listenerBus is private[spark]);
      // settle on a fixed-point of the observed stage count instead
      var seen = -1
      var now = stages.synchronized(stages.length)
      while (seen != now) {
        seen = now; Thread.sleep(200)
        now = stages.synchronized(stages.length)
      }
      val snap = stages.synchronized(stages.toVector)
      println(s"""{"pass":$p,"query":"$name","sf":"$sfDir","wall_sec":${f"$wall%.2f"},"n_stages":${snap.length}}""")
      snap.sortBy(-_.taskMs).take(12).foreach { s =>
        println(f"""  stage ${s.id}%4d task ${s.taskMs / 1000.0}%8.1fs wall ${s.wallMs / 1000.0}%7.1fs shufR ${s.shufReadMB}%8.1fMB shufW ${s.shufWriteMB}%8.1fMB inRec ${s.inRecords}%12d outRec ${s.outRecords}%12d  ${s.nameLine}%s""")
      }
      graft.core.Spill.cleanup()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
