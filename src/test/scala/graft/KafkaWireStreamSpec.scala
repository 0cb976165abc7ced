package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.kafka.{KafkaClusterClient, KafkaStubBroker, KafkaStubCluster, KafkaWireClient, KafkaWireSource}

/** The DSv2 streaming source over the Kafka wire
  * ([[graft.kafka.KafkaWireMicroBatchStream]], `format("kafka-wire")`):
  * connector-schema parity, offset-checkpoint exactly-once across two
  * produce waves, batch-read parity, and offset JSON canonicality.
  */
class KafkaWireStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def withBroker[A](numPartitions: Int = 3)(f: KafkaStubBroker => A): A = {
    val broker = new KafkaStubBroker(numPartitions)
    broker.start()
    try f(broker) finally broker.stop()
  }

  private def produce(broker: KafkaStubBroker, topic: String,
      ids: Range): Unit = {
    val c = new KafkaWireClient("127.0.0.1", broker.port)
    try {
      val nParts = c.metadata(Seq(topic)).head.partitions.size
      ids.groupBy(_ % nParts).foreach { case (part, ps) =>
        c.produce(topic, part,
          ps.map(i => (1000L + i, b(s"k$i"), b(s"""{"id":$i}"""))))
      }
    } finally c.close()
  }

  private def tmp(prefix: String): String = {
    val root = java.nio.file.Paths.get("target", "stores")
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.createTempDirectory(root, prefix).toString
  }

  /** Drain the stream AvailableNow through a recoverable foreachBatch
    * parquet sink (the memory sink refuses checkpoint recovery), return
    * the ids THIS call emitted.
    */
  private def drain(broker: KafkaStubBroker, topic: String,
      checkpoint: String): Seq[Int] = {
    val outDir = tmp("kw_out_")
    val q = spark.readStream.format("kafka-wire")
      .option("host", "127.0.0.1").option("port", broker.port.toString)
      .option("topic", topic)
      .load()
      .selectExpr("CAST(value AS STRING) AS v")
      .select(get_json_object(col("v"), "$.id").cast("int").as("id"))
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.write.mode("append").parquet(outDir))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val files = new java.io.File(outDir).listFiles()
    if (files == null || !files.exists(_.getName.endsWith(".parquet"))) Seq.empty
    else spark.read.parquet(outDir).collect().map(_.getInt(0)).toSeq.sorted
  }

  test("gzip on both wire directions: compression.type=gzip write, gzip-broker stream read") {
    val broker = new KafkaStubBroker(3, compressionType = "gzip")
    broker.start()
    try {
      import spark.implicits._
      // producer leg: the connector's compression.type option deflates
      // every produced batch (stock connector knob)
      (0 until 400).map(i => (s"k${i % 7}", s"""{"id":$i}"""))
        .toDF("key", "value")
        .write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "gz").option("compression.type", "gzip")
        .mode("append").save()
      // consumer leg: the broker recompresses fetch responses; the
      // streaming source inflates from the batch attribute bits alone
      val got = drain(broker, "gz", tmp("chk_gz_"))
      assert(got == (0 until 400))
    } finally broker.stop()
  }

  test("streaming read surfaces the standard Kafka connector schema") {
    withBroker() { broker =>
      produce(broker, "schema_t", 0 until 5)
      val df = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "schema_t").load()
      assert(df.schema == KafkaWireSource.Schema)
      assert(df.isStreaming)
    }
  }

  test("AvailableNow drains everything once, with kafka coordinates intact") {
    withBroker() { broker =>
      produce(broker, "drain_t", 0 until 100)
      val name = "kwc_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "drain_t").load()
        .selectExpr("CAST(key AS STRING) AS key", "partition", "offset", "topic")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", tmp("chk_kw_"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table(name).collect()
      assert(rows.length == 100)
      assert(rows.map(_.getString(0)).toSet == (0 until 100).map(i => s"k$i").toSet)
      assert(rows.map(_.getString(3)).toSet == Set("drain_t"))
      // offsets are dense per partition, starting at 0
      rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
        val offs = rs.map(_.getLong(2)).sorted
        assert(offs.head == 0L && offs.last == offs.length - 1L)
      }
    }
  }

  test("checkpoint resume is exactly-once across two produce waves") {
    withBroker() { broker =>
      val chk = tmp("chk_kw2_")
      produce(broker, "waves_t", 0 until 40)
      assert(drain(broker, "waves_t", chk) == (0 until 40))
      produce(broker, "waves_t", 40 until 70)
      // same checkpoint, fresh sink: only the new wave may appear
      assert(drain(broker, "waves_t", chk) == (40 until 70))
      // nothing new: an empty run, not a re-emission
      assert(drain(broker, "waves_t", chk).isEmpty)
    }
  }

  test("batch read plans the full range and matches the streamed rows") {
    withBroker() { broker =>
      produce(broker, "batch_t", 0 until 64)
      val df = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "batch_t").load()
      assert(df.schema == KafkaWireSource.Schema)
      assert(df.count() == 64)
      // one Spark partition per Kafka partition
      assert(df.rdd.getNumPartitions == 3)
      val ids = df.selectExpr("CAST(value AS STRING) AS v")
        .select(get_json_object(col("v"), "$.id").cast("int")).collect()
        .map(_.getInt(0)).sorted
      assert(ids.toSeq == (0 until 64))
    }
  }

  test("batch write round-trips through the broker with murmur2 placement") {
    withBroker() { broker =>
      import spark.implicits._
      val df = (0 until 50)
        .map(i => (s"user${i % 7}", s"""{"id":$i}""")).toDF("key", "value")
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "sink_b").mode("append").save()
      val c = new KafkaWireClient("127.0.0.1", broker.port)
      try {
        val byPart = (0 until 3).map(p => p -> c.fetchAll("sink_b", p)).toMap
        assert(byPart.values.map(_.size).sum == 50)
        // default-partitioner contract: a key's records all land on
        // murmur2(key) mod nParts — the per-key ordering the reference
        // producer relies on
        byPart.foreach { case (p, recs) =>
          recs.foreach { r =>
            assert(graft.kafka.KafkaCodec.partitionFor(r.key, 3) == p)
          }
        }
      } finally c.close()
    }
  }

  test("startingTimestamp resolves ListOffsets by time and skips older records") {
    withBroker() { broker =>
      val c = new KafkaWireClient("127.0.0.1", broker.port)
      try {
        c.metadata(Seq("timed"))
        // CreateTime-stamped records: 3 eras per partition
        (0 until 3).foreach { p =>
          c.produce("timed", p, Seq(
            (1000L, s"p$p-old".getBytes, "v".getBytes),
            (2000L, s"p$p-mid".getBytes, "v".getBytes),
            (3000L, s"p$p-new".getBytes, "v".getBytes)))
        }
        // protocol level: first-offset-with-ts>=t, log end when none
        assert(c.listOffset("timed", 0, 2000L) == 1L)
        assert(c.listOffset("timed", 0, 2001L) == 2L)
        assert(c.listOffset("timed", 0, 9999L) == 3L) // no match → log end
      } finally c.close()
      val rows = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "timed")
        .option("startingTimestamp", "2000")
        .load()
        .selectExpr("CAST(key AS STRING) AS k").collect().map(_.getString(0)).toSet
      assert(rows == (0 until 3).flatMap(p => Seq(s"p$p-mid", s"p$p-new")).toSet,
        s"expected mid+new eras only, got $rows")
      // the exclusive end twin: a [start, end) time window per partition
      val windowed = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "timed")
        .option("startingTimestamp", "2000")
        .option("endingTimestamp", "3000")
        .load()
        .selectExpr("CAST(key AS STRING) AS k")
        .collect().map(_.getString(0)).toSet
      assert(windowed == (0 until 3).map(p => s"p$p-mid").toSet,
        s"expected the mid era only, got $windowed")
      // mutual exclusion with startingOffsets is rejected loudly
      val e = intercept[Exception] {
        spark.read.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("topic", "timed")
          .option("startingTimestamp", "2000")
          .option("startingOffsets", "earliest")
          .load().collect()
      }
      assert(e.getMessage.contains("mutually exclusive"))
    }
  }

  test("an input timestamp column becomes CreateTime and drives timestamp reads") {
    withBroker() { broker =>
      import spark.implicits._
      val df = Seq(
        ("a", "v1", "2024-01-15 10:00:00"),
        ("b", "v2", "2024-01-15 11:00:00"),
        ("c", "v3", "2024-01-15 12:00:00"))
        .toDF("key", "value", "timestamp")
        .withColumn("timestamp",
          org.apache.spark.sql.functions.col("timestamp").cast("timestamp"))
        // single task: per-partition CreateTimes stay monotone, which
        // ListOffsets-by-time assumes (real Kafka scans for the FIRST
        // qualifying offset — out-of-order producer timestamps give it
        // the same surprises)
        .coalesce(1)
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "stamped").mode("append").save()
      // the wire round-trips the CreateTime into the reader's
      // timestamp column...
      val back = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "stamped").load()
        .selectExpr("CAST(key AS STRING) AS k", "timestamp")
      assert(back.selectExpr("min(unix_timestamp(timestamp))").head.getLong(0) ==
        java.time.Instant.parse("2024-01-15T10:00:00Z").getEpochSecond)
      // ...and a startingTimestamp read honors it across eras
      val late = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "stamped")
        .option("startingTimestamp",
          java.time.Instant.parse("2024-01-15T11:00:00Z").toEpochMilli.toString)
        .load()
        .selectExpr("CAST(key AS STRING) AS k")
        .collect().map(_.getString(0)).toSet
      assert(late == Set("b", "c"), s"got $late")
    }
  }

  test("batch write with enable.idempotence runs the KIP-98 handshake and lands rows once") {
    withBroker() { broker =>
      import spark.implicits._
      val before = broker.producersInitialized
      val df = (0 until 1200)
        .map(i => (s"user${i % 7}", s"""{"id":$i}""")).toDF("key", "value")
        .repartition(2)
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "sink_idem")
        .option("enable.idempotence", "true")
        .mode("append").save()
      // one producer session per write task
      assert(broker.producersInitialized - before == 2)
      val c = new KafkaWireClient("127.0.0.1", broker.port)
      try {
        // > 500 rows per task → multiple sequenced batches per
        // (pid, partition); all must have appended exactly once
        assert((0 until 3).map(p => c.fetchAll("sink_idem", p).size).sum == 1200)
      } finally c.close()
    }
  }

  test("writeStream format(kafka-wire) produces every micro-batch row once") {
    withBroker() { broker =>
      import spark.implicits._
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)](spark)
      src.addData((0 until 30).map(i => (s"k${i % 5}", s"v$i")): _*)
      val q = src.toDF().toDF("key", "value")
        .writeStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "sink_s")
        .option("checkpointLocation", tmp("chk_kws_"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val c = new KafkaWireClient("127.0.0.1", broker.port)
      try {
        val all = (0 until 3).flatMap(p => c.fetchAll("sink_s", p))
        assert(all.size == 30)
        assert(all.map(r => new String(r.value, StandardCharsets.UTF_8)).toSet ==
          (0 until 30).map(i => s"v$i").toSet)
      } finally c.close()
    }
  }

  test("null keys take sticky per-task placement without error") {
    withBroker() { broker =>
      import spark.implicits._
      val df = (0 until 20).map(i => (Option.empty[String], s"v$i"))
        .toDF("key", "value")
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "sink_n").mode("append").save()
      val c = new KafkaWireClient("127.0.0.1", broker.port)
      try {
        val all = (0 until 3).flatMap(p => c.fetchAll("sink_n", p))
        assert(all.size == 20)
        assert(all.forall(_.key == null))
      } finally c.close()
    }
  }

  test("maxOffsetsPerTrigger splits the backlog into capped micro-batches") {
    withBroker() { broker =>
      produce(broker, "cap_t", 0 until 90)
      val name = "kwcap_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "cap_t")
        .option("maxOffsetsPerTrigger", "25")
        .load()
        .selectExpr("CAST(value AS STRING) AS v")
        .select(get_json_object(col("v"), "$.id").cast("int").as("id"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", tmp("chk_kwcap_"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // exactly-once union across the capped batches
      val ids = spark.table(name).collect().map(_.getInt(0)).sorted.toSeq
      assert(ids == (0 until 90))
      // admission control really split the drain: ≥4 non-empty batches
      // (ceil(90/25)), none above the cap
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(sizes.length >= 4, s"expected >=4 capped batches, got ${sizes.toSeq}")
      assert(sizes.forall(_ <= 25), s"batch over cap: ${sizes.toSeq}")
    }
  }

  test("startingOffsets=latest skips the preloaded backlog") {
    withBroker() { broker =>
      val chk = tmp("chk_kwlate_")
      produce(broker, "late_t", 0 until 30)
      val outDir = tmp("kw_late_out_")
      def drainLatest(): Seq[Int] = {
        val q = spark.readStream.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("topic", "late_t")
          .option("startingOffsets", "latest")
          .load()
          .selectExpr("CAST(value AS STRING) AS v")
          .select(get_json_object(col("v"), "$.id").cast("int").as("id"))
          .writeStream
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.write.mode("append").parquet(outDir))
          .option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val files = new java.io.File(outDir).listFiles()
        if (files == null || !files.exists(_.getName.endsWith(".parquet"))) Seq.empty
        else spark.read.parquet(outDir).collect().map(_.getInt(0)).toSeq.sorted
      }
      // first run: initial offset = live high watermark → nothing
      assert(drainLatest().isEmpty)
      // the option only governs the FIRST offset; a resumed checkpoint
      // picks up everything after it
      produce(broker, "late_t", 30 until 45)
      assert(drainLatest() == (30 until 45))
    }
  }

  test("batch read honors startingOffsets/endingOffsets JSON ranges") {
    withBroker() { broker =>
      produce(broker, "range_t", 0 until 60)
      // skip the first record of partitions 0 and 1; partition 2 and the
      // missing end default to earliest/latest sentinels
      val df = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "range_t")
        .option("startingOffsets", """{"0":1,"1":1,"2":-2}""")
        .load()
      assert(df.count() == 58)
      val capped = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "range_t")
        .option("endingOffsets", """{"0":5,"1":5,"2":5}""")
        .load()
      assert(capped.count() == 15)
      assert(capped.selectExpr("max(offset)").collect()(0).getLong(0) == 4L)
    }
  }

  test("an explicit offset outside the log range fails the plan loudly") {
    withBroker() { broker =>
      produce(broker, "oob_t", 0 until 9)
      val ex = intercept[Exception] {
        spark.read.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("topic", "oob_t")
          .option("startingOffsets", """{"0":999}""")
          .load().count()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(ex).exists(_.getMessage != null) &&
        causes(ex).exists(c => c.getMessage != null && c.getMessage.contains("out of range")))
    }
  }

  /** Drain a SUBSCRIPTION (comma topic list) AvailableNow through a
    * recoverable foreachBatch parquet sink (the memory sink refuses
    * checkpoint recovery), returning the (topic, id) pairs THIS call
    * emitted — the multi-topic twin of [[drain]].
    */
  private def drainMulti(broker: KafkaStubBroker, subscribe: String,
      checkpoint: String, extra: Map[String, String] = Map.empty): Seq[(String, Int)] = {
    val outDir = tmp("kwm_out_")
    val base = spark.readStream.format("kafka-wire")
      .option("host", "127.0.0.1").option("port", broker.port.toString)
      .option("subscribe", subscribe)
    val q = extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .selectExpr("topic", "CAST(value AS STRING) AS v")
      .select(col("topic"), get_json_object(col("v"), "$.id").cast("int").as("id"))
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.write.mode("append").parquet(outDir))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val files = new java.io.File(outDir).listFiles()
    if (files == null || !files.exists(_.getName.endsWith(".parquet"))) Seq.empty
    else spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
  }

  test("subscribe: one stream drains a topic list, coordinates intact") {
    withBroker() { broker =>
      produce(broker, "ta", 0 until 30)
      produce(broker, "tb", 100 until 120)
      val got = drainMulti(broker, "ta,tb", tmp("chk_multi_"))
      assert(got.filter(_._1 == "ta").map(_._2).sorted == (0 until 30))
      assert(got.filter(_._1 == "tb").map(_._2).sorted == (100 until 120))
    }
  }

  test("subscribe: checkpoint resume is exactly-once per topic across waves") {
    withBroker() { broker =>
      val chk = tmp("chk_multi2_")
      produce(broker, "wa", 0 until 20)
      produce(broker, "wb", 100 until 110)
      assert(drainMulti(broker, "wa,wb", chk).size == 30)
      // wave 2 lands on ONE topic only; the other must stay silent
      produce(broker, "wb", 110 until 125)
      val second = drainMulti(broker, "wa,wb", chk)
      assert(second.map(_._2).sorted == (110 until 125))
      assert(second.forall(_._1 == "wb"))
    }
  }

  test("subscribe: maxOffsetsPerTrigger caps the COMBINED multi-topic batch") {
    withBroker() { broker =>
      produce(broker, "ca", 0 until 60)
      produce(broker, "cb", 100 until 140)
      // drains 100 records through <=25-record batches across BOTH
      // topics; the memory sink sees them all exactly once
      val got = drainMulti(broker, "ca,cb", tmp("chk_multi3_"),
        Map("maxOffsetsPerTrigger" -> "25"))
      assert(got.size == 100)
      assert(got.map(_._2).toSet == ((0 until 60) ++ (100 until 140)).toSet)
    }
  }

  test("subscribe: batch read takes nested per-topic offset JSON bounds") {
    withBroker() { broker =>
      produce(broker, "ba", 0 until 30)
      produce(broker, "bb", 0 until 30)
      val df = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("subscribe", "ba,bb")
        // ba: full range; bb: partition 0 only from offset 2 (others
        // default to earliest via the missing-partition -2 rule)
        .option("startingOffsets", """{"ba":{"0":-2,"1":-2,"2":-2},"bb":{"0":2}}""")
        .load()
      val full = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("subscribe", "ba,bb").load()
      assert(full.count() == 60)
      assert(df.count() == 58) // bb/p0 skipped its first two records
      // a flat map with a topic LIST is ambiguous and must fail loudly
      val ex = intercept[Exception] {
        spark.read.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("subscribe", "ba,bb")
          .option("startingOffsets", """{"0":1}""")
          .load().count()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("single subscribed")))
    }
  }

  test("subscribe: writes require exactly one topic") {
    withBroker() { broker =>
      import spark.implicits._
      val ex = intercept[Exception] {
        Seq(("k", "v")).toDF("key", "value")
          .write.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("topic", "wa,wb").mode("append").save()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("exactly one topic")))
    }
  }

  test("topic-column routing: a write with no topic option fans rows out per row") {
    withBroker() { broker =>
      import spark.implicits._
      (0 until 40)
        .map(i => (s"t${i % 2}", s"k$i", s"""{"id":$i}"""))
        .toDF("topic", "key", "value")
        .write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .mode("append").save()
      val back = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("subscribe", "t0,t1").load()
        .selectExpr("topic", "CAST(value AS STRING) AS v")
        .select(col("topic"), get_json_object(col("v"), "$.id").cast("int").as("id"))
        .collect().map(r => (r.getString(0), r.getInt(1)))
      assert(back.length == 40)
      // every row landed in ITS topic
      assert(back.forall { case (t, id) => t == s"t${id % 2}" })
      // the topic OPTION overrides the column (stock precedence)
      (100 until 105).map(i => (s"t${i % 2}", s"""{"id":$i}"""))
        .toDF("topic", "value")
        .write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "override_t").mode("append").save()
      val over = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "override_t").load()
      assert(over.count() == 5)
    }
  }

  test("topic-column routing: idempotent multi-topic write fences per (topic, partition)") {
    withBroker() { broker =>
      import spark.implicits._
      (0 until 30)
        .map(i => (s"i${i % 3}", s"k$i", s"""{"id":$i}"""))
        .toDF("topic", "key", "value")
        .repartition(2) // a task writes several topics, interleaved
        .write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("enable.idempotence", "true")
        .mode("append").save()
      val n = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("subscribe", "i0,i1,i2").load().count()
      assert(n == 30)
    }
  }

  test("subscribePattern: regex resolves against the broker topic list at plan time") {
    withBroker() { broker =>
      produce(broker, "logs_a", 0 until 10)
      produce(broker, "logs_b", 10 until 20)
      produce(broker, "metrics_c", 100 until 110)
      val df = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("subscribePattern", "logs_.*").load()
      val got = df.selectExpr("topic", "CAST(value AS STRING) AS v")
        .select(col("topic"), get_json_object(col("v"), "$.id").cast("int").as("id"))
        .collect().map(r => (r.getString(0), r.getInt(1)))
      assert(got.map(_._2).sorted.toSeq == (0 until 20))
      assert(got.map(_._1).toSet == Set("logs_a", "logs_b"))
      // zero matches fail loudly, not an empty silent plan
      val ex = intercept[Exception] {
        spark.read.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("subscribePattern", "nothing_.*").load().count()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("matches no topic")))
      // pattern + explicit list is ambiguous
      intercept[Exception] {
        spark.read.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("subscribe", "logs_a")
          .option("subscribePattern", "logs_.*").load()
      }
    }
  }

  test("minOffsetsPerTrigger holds small batches until the threshold accumulates") {
    withBroker() { broker =>
      produce(broker, "mint", 0 until 20)
      val batches = new java.util.concurrent.CopyOnWriteArrayList[Long]()
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "mint")
        .option("minOffsetsPerTrigger", "50")
        .option("maxTriggerDelay", "10m")
        .load()
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
          val n = b.count(); if (n > 0) batches.add(n): Unit
        })
        .option("checkpointLocation", tmp("chk_min_"))
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
        .start()
      try {
        // 20 < 50 and the delay is far away: the gate must hold
        Thread.sleep(2000)
        assert(batches.isEmpty, s"gate leaked a small batch: $batches")
        // crossing the threshold releases ONE batch with everything
        produce(broker, "mint", 20 until 60)
        val deadline = System.currentTimeMillis() + 15000
        while (batches.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(batches.size == 1 && batches.get(0) == 60L,
          s"expected one 60-row batch, got $batches")
      } finally q.stop()
    }
  }

  test("maxTriggerDelay releases a sub-threshold batch once it expires") {
    withBroker() { broker =>
      produce(broker, "mintd", 0 until 15)
      val batches = new java.util.concurrent.CopyOnWriteArrayList[Long]()
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "mintd")
        .option("minOffsetsPerTrigger", "1000")
        .option("maxTriggerDelay", "2s")
        .load()
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
          val n = b.count(); if (n > 0) batches.add(n): Unit
        })
        .option("checkpointLocation", tmp("chk_mind_"))
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
        .start()
      try {
        val deadline = System.currentTimeMillis() + 20000
        while (batches.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(batches.size == 1 && batches.get(0) == 15L,
          s"expected the delay escape to admit the 15 waiting rows, got $batches")
      } finally q.stop()
    }
  }

  test("minOffsetsPerTrigger window re-arms during idle (no stale-timer tiny batch)") {
    withBroker() { broker =>
      // topic exists, stream starts EMPTY and idles past maxTriggerDelay
      produce(broker, "mintr", 0 until 0)
      val c = new KafkaWireClient("127.0.0.1", broker.port)
      try c.metadata(Seq("mintr")) finally c.close()
      val batches = new java.util.concurrent.CopyOnWriteArrayList[Long]()
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "mintr")
        .option("minOffsetsPerTrigger", "1000")
        .option("maxTriggerDelay", "4s")
        .load()
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
          val n = b.count(); if (n > 0) batches.add(n): Unit
        })
        .option("checkpointLocation", tmp("chk_mintr_"))
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
        .start()
      try {
        Thread.sleep(6000) // idle well past the 4s delay
        produce(broker, "mintr", 0 until 5)
        // a stale, long-expired timer would admit these 5 immediately;
        // the re-armed window must hold them for a fresh delay period
        Thread.sleep(1500)
        assert(batches.isEmpty,
          s"idle-expired timer leaked an immediate tiny batch: $batches")
        // and the re-armed delay eventually releases them
        val deadline = System.currentTimeMillis() + 20000
        while (batches.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(batches.size == 1 && batches.get(0) == 5L,
          s"expected one 5-row delay-escape batch, got $batches")
      } finally q.stop()
    }
  }

  test("Trigger.AvailableNow ignores minOffsetsPerTrigger and drains") {
    withBroker() { broker =>
      produce(broker, "minan", 0 until 10)
      val outDir = tmp("minan_out_")
      val q = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "minan")
        .option("minOffsetsPerTrigger", "1000")
        .option("maxTriggerDelay", "10m")
        .load()
        .selectExpr("CAST(value AS STRING) AS v")
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(outDir))
        .option("checkpointLocation", tmp("chk_minan_"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(spark.read.parquet(outDir).count() == 10L)
    }
  }

  test("assign pins exact partitions for batch and streaming reads") {
    withBroker() { broker =>
      // deterministic placement: produce() keys records id -> id % 3
      produce(broker, "asg", 0 until 60)
      val df = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("assign", """{"asg": [0, 2]}""")
        .load()
      val parts = df.select("partition").distinct()
        .collect().map(_.getInt(0)).sorted
      assert(parts.toSeq == Seq(0, 2))
      val ids = df.selectExpr("CAST(value AS STRING) AS v")
        .select(get_json_object(col("v"), "$.id").cast("int"))
        .collect().map(_.getInt(0)).sorted
      assert(ids.toSeq == (0 until 60).filter(i => i % 3 == 0 || i % 3 == 2))
      // streaming: the checkpoint plans only the assigned partitions
      val got = {
        val outDir = tmp("asg_out_")
        val q = spark.readStream.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("assign", """{"asg": [1]}""")
          .load()
          .selectExpr("CAST(value AS STRING) AS v")
          .select(get_json_object(col("v"), "$.id").cast("int").as("id"))
          .writeStream
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.write.mode("append").parquet(outDir))
          .option("checkpointLocation", tmp("chk_asg_"))
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.read.parquet(outDir).collect().map(_.getInt(0)).sorted
      }
      assert(got.toSeq == (0 until 60).filter(_ % 3 == 1))
    }
  }

  test("assign validates partitions and excludes other subscription modes") {
    withBroker() { broker =>
      produce(broker, "asg2", 0 until 6)
      val e1 = intercept[Exception] {
        spark.read.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("assign", """{"asg2": [7]}""")
          .load().collect()
      }
      assert(e1.getMessage.contains("asg2/7 does not exist") ||
        Option(e1.getCause).exists(_.getMessage.contains("asg2/7 does not exist")))
      val e2 = intercept[IllegalArgumentException] {
        spark.read.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("topic", "asg2")
          .option("assign", """{"asg2": [0]}""")
          .load()
      }
      assert(e2.getMessage.contains("mutually exclusive"))
      val e3 = intercept[IllegalArgumentException] {
        spark.read.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("assign", "not json")
          .load()
      }
      assert(e3.getMessage.contains("malformed assign"))
    }
  }

  test("read_committed stream resumes from checkpoint across an ISR promotion: offsets respect the rebuilt LSO") {
    // The offset-vs-LSO interaction at promotion: a checkpointed
    // read_committed stream commits offsets computed against the OLD
    // leader's last-stable-offset (past a commit marker, an aborted
    // record, and its abort marker — all of which chased a LAGGING
    // follower's replication channel). After that follower is promoted,
    // its REBUILT transaction state must place the resumed stream at
    // the same stable boundary: nothing re-read, nothing skipped, the
    // aborted record still invisible, and a post-promotion transaction
    // delivered exactly once.
    val cluster = new KafkaStubCluster(nBrokers = 3, numPartitions = 3,
      replicationFactor = 3, asyncLagMs = Some(250))
    cluster.start()
    try {
      val deadPort = cluster.brokers(0).port
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("lso"))
        val chk = tmp("chk_lso_")
        val outDir = tmp("out_lso_")
        def drainCommitted(bootstrap: String): Unit = {
          val q = spark.readStream.format("kafka-wire")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", "lso")
            .option("kafka.isolation.level", "read_committed")
            .load()
            .selectExpr("CAST(value AS STRING) AS v")
            .select(get_json_object(col("v"), "$.id").cast("int").as("id"))
            .writeStream
            .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              b.write.mode("append").parquet(outDir))
            .option("checkpointLocation", chk)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        // wave 1, produced while follower 1 LAGS: a committed txn (ids
        // 1,2), then an aborted one (id 99) — rows and both markers all
        // ride the paused replication channel
        cluster.pauseReplication(1)
        val (pid, ep) = c.initProducerId("lso-a")
        c.addPartitionsToTxn("lso-a", pid, ep, "lso", Seq(0))
        c.produce("lso", 0, Seq((1L, b("k1"), b("""{"id":1}""")),
          (2L, b("k2"), b("""{"id":2}"""))), gzip = false, pid, ep, 0,
          transactionalId = "lso-a")
        c.endTxn("lso-a", pid, ep, commit = true)
        val (pid2, ep2) = c.initProducerId("lso-b")
        c.addPartitionsToTxn("lso-b", pid2, ep2, "lso", Seq(0))
        c.produce("lso", 0, Seq((3L, b("k3"), b("""{"id":99}"""))),
          gzip = false, pid2, ep2, 0, transactionalId = "lso-b")
        c.endTxn("lso-b", pid2, ep2, commit = false)
        drainCommitted(s"127.0.0.1:$deadPort")
        val wave1 = spark.read.parquet(outDir)
          .select("id").collect().map(_.getInt(0)).sorted.toSeq
        assert(wave1 == Seq(1, 2), s"wave 1 read_committed saw $wave1")
        // chase the backlog, then promote the previously-lagging follower
        cluster.resumeReplication(1)
        assert(cluster.awaitCaughtUp(1, 60000))
        cluster.failBroker(0)
        assert(cluster.leaderOf(0) == 1, "the chased follower must lead")
        // wave 2: a committed txn against the PROMOTED leader, whose
        // producer/txn state was rebuilt from its chased log
        val (pid3, ep3) = c.initProducerId("lso-c")
        c.addPartitionsToTxn("lso-c", pid3, ep3, "lso", Seq(0))
        c.produce("lso", 0, Seq((4L, b("k4"), b("""{"id":3}"""))),
          gzip = false, pid3, ep3, 0, transactionalId = "lso-c")
        c.endTxn("lso-c", pid3, ep3, commit = true)
        drainCommitted(
          s"127.0.0.1:$deadPort,127.0.0.1:${cluster.brokers(1).port}")
        val all = spark.read.parquet(outDir)
          .select("id").collect().map(_.getInt(0)).sorted.toSeq
        assert(all == Seq(1, 2, 3),
          s"resume across promotion broke offset/LSO alignment: $all")
      } finally c.close()
    } finally cluster.stop()
  }

  test("offset JSON round-trips canonically in the stock nested format") {
    val o: KafkaWireSource.TopicOffsets =
      Map(("t", 2) -> 17L, ("t", 0) -> 3L, ("a", 1) -> 0L)
    val json = KafkaWireSource.toJson(o)
    assert(json == """{"a":{"1":0},"t":{"0":3,"2":17}}""")
    assert(KafkaWireSource.fromJson(json, "t") == o)
    // legacy flat single-topic checkpoints attribute to the default topic
    assert(KafkaWireSource.fromJson("""{"0":3,"2":17}""", "t") ==
      Map(("t", 0) -> 3L, ("t", 2) -> 17L))
    assert(KafkaWireSource.fromJson("{}", "t") ==
      Map.empty[(String, Int), Long])
  }
}
