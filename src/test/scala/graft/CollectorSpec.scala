package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

import graft.batch.Collector

/** Golden-file test for the batch ETL (SURVEY.md §5.2.1): KETI-style
  * fixture tree per FIXTURES.md §1 — aligned + non-aligned timestamps,
  * two rows in one minute, one malformed room folder.
  */
class CollectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val root = {
    val dir = Files.createTempDirectory(Paths.get("target"), "keti_").toString
    def write(room: String, file: String, rows: Seq[(Long, Double)]): Unit = {
      val d = Paths.get(dir, room)
      Files.createDirectories(d)
      Files.writeString(d.resolve(file),
        rows.map { case (t, v) => s"$t,$v" }.mkString("\n"))
    }
    // room 413: t1,t2 share minute 1377299040; t3 in 1377299100; t4 only in co2 (join drops)
    val (t1, t2, t3, t4) = (1377299041L, 1377299059L, 1377299101L, 1377299999L)
    write("413", "co2.csv", Seq(t1 -> 400.0, t2 -> 410.0, t3 -> 420.0, t4 -> 999.0))
    write("413", "light.csv", Seq(t1 -> 100.0, t2 -> 110.0, t3 -> 120.0))
    write("413", "temperature.csv", Seq(t1 -> 20.0, t2 -> 21.0, t3 -> 22.0))
    write("413", "humidity.csv", Seq(t1 -> 50.0, t2 -> 52.0, t3 -> 54.0))
    write("413", "pir.csv", Seq(t1 -> 0.0, t2 -> 1.0, t3 -> 2.0))
    // room 644: single aligned row
    write("644", "co2.csv", Seq(t1 -> 500.0))
    write("644", "light.csv", Seq(t1 -> 200.0))
    write("644", "temperature.csv", Seq(t1 -> 23.0))
    write("644", "humidity.csv", Seq(t1 -> 60.0))
    write("644", "pir.csv", Seq(t1 -> 0.0))
    // room 999: malformed (no pir.csv) → must be skipped, not fatal
    write("999", "co2.csv", Seq(t1 -> 1.0))
    write("999", "light.csv", Seq(t1 -> 1.0))
    write("999", "temperature.csv", Seq(t1 -> 1.0))
    write("999", "humidity.csv", Seq(t1 -> 1.0))
    dir
  }

  test("per-dir ETL: join alignment, minute grouping, error containment") {
    val out = Collector.run(spark, root)
      .orderBy("room", "ts_min_bignt")
      .collect()
    assert(out.map(_.getAs[String]("room")).toSeq == Seq("413", "413", "644"))
    val first = out(0)
    assert(first.getAs[Long]("ts_min_bignt") == 1377299040L)
    assert(first.getAs[Double]("co2") == 405.0)
    assert(first.getAs[Double]("light") == 105.0)
    assert(first.getAs[Double]("pir") == 0.5)
    assert(first.getAs[Double]("timestamp") == 1377299050.0)
    val second = out(1)
    assert(second.getAs[Long]("ts_min_bignt") == 1377299100L)
    assert(second.getAs[Double]("co2") == 420.0)
    val r644 = out(2)
    assert(r644.getAs[Double]("co2") == 500.0)
  }

  test("glob ETL produces the same result as per-dir ETL") {
    val perDir = Collector.run(spark, root)
    val glob = Collector.groupAverage(Collector.mergeRoomsGlob(spark, root))
    val a = perDir.orderBy("room", "ts_min_bignt").collect().toSeq
    val b = glob.orderBy("room", "ts_min_bignt").collect().toSeq
    assert(a == b)
  }

  test("K1 csv sink writes a headered file") {
    val out = Files.createTempDirectory(Paths.get("target"), "merged_").toString
    Collector.writeMergedCsv(Collector.run(spark, root), out)
    val part = new java.io.File(out).listFiles()
      .find(_.getName.endsWith(".csv")).get
    val header = scala.io.Source.fromFile(part).getLines().next()
    assert(header.startsWith("event_ts_min,ts_min_bignt,room,timestamp,co2"))
  }

  test("golden file: the reference's committed CSV is consistent under groupAverage") {
    // the reference's ONLY committed correctness artifact (SURVEY §5.1:
    // data_collector.py's output over the KETI dataset) — read as data,
    // pin its documented shape, and run the inverse consistency check:
    // every row re-derives its own minute keys through OUR A1/F1-F3
    // operator bit-exactly (mean over the single row it came from).
    import org.apache.spark.sql.functions._
    val path = "/root/reference/merged_sensor_data_grouped.csv"
    assume(new java.io.File(path).isFile, "reference artifact not present")
    val golden = spark.read
      .schema("event_ts_min STRING, ts_min_bignt LONG, room STRING, " +
        "timestamp DOUBLE, co2 DOUBLE, light DOUBLE, temp DOUBLE, " +
        "humidity DOUBLE, pir DOUBLE")
      .option("header", "true").csv(path)
    // documented shape: 34,890 rows, 51 rooms, 2013-08-23 → 2013-08-31
    assert(golden.count() == 34890)
    assert(golden.select("room").distinct().count() == 51)
    val span = golden.agg(min("event_ts_min"), max("event_ts_min")).collect()(0)
    assert(span.getString(0) == "2013-08-23 23:04:00")
    assert(span.getString(1) == "2013-08-31 18:23:00")
    // (minute, room) is a unique grain — EXCEPT one quirk the artifact
    // actually ships: room 776 at minute 1377486180 appears twice with
    // different means (the reference collector emitted the same group
    // in two runs/chunks). Pin the violation precisely so any other
    // grain breakage still fails.
    val dups = golden.groupBy("ts_min_bignt", "room").count()
      .filter(col("count") > 1).collect()
    assert(dups.length == 1 && dups(0).getLong(0) == 1377486180L &&
      dups(0).getString(1) == "776" && dups(0).getLong(2) == 2L,
      s"unexpected grain violations: ${dups.mkString(";")}")
    // the mean timestamp of each group lies inside its own minute bucket
    assert(golden.filter(col("timestamp") < col("ts_min_bignt") ||
      col("timestamp") >= col("ts_min_bignt") + 60).isEmpty)
    // inverse check: regroup the golden rows from their own grain; the
    // derived keys (event_ts_min string under UTC, ts_min_bignt) and the
    // single-row means must reproduce the artifact exactly on every
    // clean group (the one duplicated group regroups to its mean-of-
    // means and is excluded from the bit-exact comparison)
    val clean = golden.filter(!(col("ts_min_bignt") === 1377486180L &&
      col("room") === "776"))
    val regrouped = Collector
      .groupAverage(clean
        .select("timestamp", "co2", "light", "temp", "humidity", "pir", "room"))
      .withColumn("event_ts_min",
        date_format(col("event_ts_min"), "yyyy-MM-dd HH:mm:ss"))
      .select(golden.columns.map(col).toSeq: _*)
    assert(regrouped.exceptAll(clean).isEmpty &&
      clean.exceptAll(regrouped).isEmpty)
  }
}
