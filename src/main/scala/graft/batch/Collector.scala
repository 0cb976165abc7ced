package graft.batch

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas

/** The reference's batch ETL (`data_collector.py`; SURVEY.md §3.1):
  * merge per-room KETI sensor CSVs, minute-floor, group-average.
  *
  * Two implementations with identical output:
  *
  *  - [[mergeRoomsPerDir]] — reference-faithful: iterate room folders
  *    (S1), read 5 headerless CSVs each (S2), 5-way inner join on exact
  *    timestamp (J1), tag the room (P3), union all rooms (O1). A
  *    malformed room folder is SKIPPED with a log line, not fatal —
  *    the reference's per-room error containment
  *    (`data_collector.py:42-43`).
  *  - [[mergeRoomsGlob]] — the 100 TB path: one globbed scan per metric
  *    across ALL rooms (glob `root/&#42;/co2.csv`), room derived from
  *    `input_file_name()`, then 4 joins on (room, timestamp). With
  *    thousands of rooms this is 5 scans + 4 shuffles total instead of
  *    5×N tiny scans and N driver-side plan constructions; AQE handles
  *    skewed rooms.
  *
  * Both end in [[groupAverage]] (A1): per (minute, room) mean of every
  * sensor column — partial aggregation map-side, one shuffle on the
  * group key.
  */
object Collector {

  private val metricFiles: Seq[(String, String)] = Seq(
    "co2" -> "co2.csv", "light" -> "light.csv", "temp" -> "temperature.csv",
    "humidity" -> "humidity.csv", "pir" -> "pir.csv")

  /** S2: one headerless 2-column sensor CSV with imposed schema. */
  private def readMetric(spark: SparkSession, path: String, metric: String): DataFrame =
    spark.read.schema(Schemas.rawSensorSchema(metric)).csv(path)

  /** One room's five sensor files joined on exact epoch-second (J1).
    * Sides of a single room are small → Spark broadcast-joins them; the
    * scale concern lives in [[mergeRoomsGlob]].
    */
  private def roomFrame(spark: SparkSession, roomDir: java.io.File): DataFrame = {
    val joined = metricFiles.map { case (m, f) =>
      val file = new java.io.File(roomDir, f)
      require(file.isFile, s"missing ${file.getName}")
      readMetric(spark, file.getPath, m)
    }.reduce(_.join(_, Seq("timestamp"), "inner"))
    joined.withColumn("room", lit(roomDir.getName))
  }

  /** S1 + J1 + P3 + O1 over a KETI-style directory tree. Returns the
    * un-aggregated merged readings (timestamp, co2..pir, room).
    */
  def mergeRoomsPerDir(spark: SparkSession, root: String): DataFrame = {
    val dirs = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).sortBy(_.getName)
    val frames = dirs.flatMap { d =>
      try Some(roomFrame(spark, d))
      catch {
        case e: Exception =>
          // reference behavior: log and skip the malformed room
          System.err.println(s"[collector] skipping room ${d.getName}: ${e.getMessage}")
          None
      }
    }
    require(frames.nonEmpty, s"no readable room folders under $root")
    frames.reduce(_ unionByName _)
  }

  /** Globbed variant: one scan per metric over every room at once. */
  def mergeRoomsGlob(spark: SparkSession, root: String): DataFrame = {
    val withRoom = metricFiles.map { case (m, f) =>
      readMetric(spark, s"$root/*/$f", m)
        .withColumn("room",
          regexp_extract(input_file_name(), "([^/]+)/[^/]+$", 1))
    }
    withRoom.reduce(_.join(_, Seq("room", "timestamp"), "inner"))
      .select("timestamp", "co2", "light", "temp", "humidity", "pir", "room")
  }

  /** F1/F2/F3 + A1: minute-floor the epoch-second timestamps and average
    * every sensor column per (minute, room) — `data_collector.py:29-38`.
    * Output schema matches `merged_sensor_data_grouped.csv`.
    */
  def groupAverage(merged: DataFrame): DataFrame = {
    val withTime = merged
      .withColumn("event_ts_min", date_trunc("minute", timestamp_seconds(col("timestamp"))))
      .withColumn("ts_min_bignt", unix_timestamp(col("event_ts_min")))
    withTime
      .groupBy("event_ts_min", "ts_min_bignt", "room")
      .agg(
        avg("timestamp").as("timestamp"),
        avg("co2").as("co2"), avg("light").as("light"), avg("temp").as("temp"),
        avg("humidity").as("humidity"), avg("pir").as("pir"))
  }

  /** The full ETL: tree scan → merge → group-average, per-dir mode. */
  def run(spark: SparkSession, root: String): DataFrame =
    groupAverage(mergeRoomsPerDir(spark, root))

  /** K1: CSV sink for the merged/grouped table (header, no index col). */
  def writeMergedCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
}
