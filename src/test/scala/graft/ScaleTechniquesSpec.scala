package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale techniques PLANS.md promises, pinned by tests: salted
  * aggregation for skewed keys, bucketed co-located joins, sketch
  * accuracy, dead-letter decode.
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted two-phase aggregate equals direct aggregate on skewed keys") {
    // heavily skewed: one key holds 90% of rows
    val rows = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    val df = rows.toDF("key", "v").repartition(8)
    val direct = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
    // phase 1: aggregate on (key, salt) — spreads the hot key over 16
    // reducers; phase 2: merge partials per key
    val salted = df
      .withColumn("salt", pmod(hash(monotonically_increasing_id()), lit(16)))
      .groupBy("key", "salt").agg(sum("v").as("ps"), count(lit(1)).as("pn"))
      .groupBy("key").agg(sum("ps").as("s"), sum("pn").as("n"))
    val a = direct.orderBy("key").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val b = salted.orderBy("key").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("bucketed tables join without an exchange") {
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("id", "lv")
    val right = (1L to 1000L).map(i => (i, s"r$i")).toDF("id", "rv")
    left.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("bkt_right")
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no shuffle exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle in bucketed join plan:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("HLL approx distinct within 5% of exact; CMS estimate upper-bounds exact") {
    val dir = "/root/testdata/sf0.001"
    val approx = graft.catalog.Sketches.approxDistinct.build(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1, n * 0.05),
        s"$k: approx ${approx(k)} vs exact $n")
    }
    val cms = graft.catalog.Sketches.heavyHitters.build(spark, dir).collect()
    cms.foreach { r =>
      assert(r.getAs[Long]("estimated_n") >= r.getAs[Long]("exact_n"))
    }
  }

  test("dead-letter decode keeps corrupt payloads routable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[String]
    ms.addData(
      """{"event_id":1,"user_id":2,"event_type":"click","value":0.5,"props":"{}","ts_us":1704067200000000}""",
      "{}",  // valid JSON, all fields absent → NOT corrupt
      "garbage-not-json")
    val decoded = graft.streaming.Ingest.decodeJsonWireWithDlq(ms.toDF())
    val rows = graft.streaming.Ingest.runToMemory(decoded).collect()
    val (bad, ok) = rows.partition(r => !r.isNullAt(r.fieldIndex("_corrupt")))
    assert(ok.length == 2)
    assert(ok.exists(r => !r.isNullAt(r.fieldIndex("event_id")) &&
      r.getAs[Long]("event_id") == 1L))
    assert(ok.exists(r => r.isNullAt(r.fieldIndex("event_id"))))  // the {} row
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt") == "garbage-not-json")
  }
}
