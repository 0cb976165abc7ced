package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kafka.KafkaStubBroker
import graft.streaming.{EsHttpStore, EsStub}

/** Opt-in real-service integration surface (COVERAGE.md §S5's "against
  * a real broker only the bootstrap address changes" claim, made
  * executable): each test resolves its endpoint from an environment
  * variable and falls back to the in-repo protocol stub when unset —
  *
  *   GRAFT_KAFKA_BOOTSTRAP=host:port   → a real Kafka broker
  *   GRAFT_ES_URL=http://host:9200     → a real Elasticsearch
  *
  * In this zero-egress sandbox the variables are unset, so the suite
  * runs green in stub mode over the same wire bytes; in an environment
  * with live services, exporting the variables points the IDENTICAL
  * flows — the DSv2 kafka-wire connector both directions and the ES
  * `_bulk` upsert store — at the real thing, with no code change.
  * Topic/index names are timestamped so runs against a shared live
  * service don't collide.
  *
  * Caveat for real brokers: the wire client speaks the non-flexible
  * protocol versions the stub advertises (Produce v3 / Fetch v4 /
  * ListOffsets v1 / Metadata v1 / InitProducerId v0 + txn APIs v0) —
  * all still accepted by brokers ≥ 2.x, and ApiVersions is checked
  * first so an incompatible broker fails loudly.
  */
class RealServiceIntegrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withKafka[A](f: (String, Int) => A): A =
    sys.env.get("GRAFT_KAFKA_BOOTSTRAP") match {
      case Some(hp) =>
        val Array(h, p) = hp.split(":")
        f(h, p.toInt)
      case None =>
        val b = new KafkaStubBroker(3)
        b.start()
        try f("127.0.0.1", b.port) finally b.stop()
    }

  private def withEs[A](f: String => A): A =
    sys.env.get("GRAFT_ES_URL") match {
      case Some(url) => f(url)
      case None =>
        val stub = new EsStub()
        stub.start()
        try f(stub.baseUrl) finally stub.stop()
    }

  private def unique(prefix: String): String =
    s"$prefix-${System.currentTimeMillis()}-${scala.util.Random.nextInt(1000)}"

  test("kafka round trip: DSv2 batch write, streaming AvailableNow read (stub or GRAFT_KAFKA_BOOTSTRAP)") {
    import spark.implicits._
    withKafka { (host, port) =>
      val topic = unique("graft-it")
      val input = (0 until 500).map(i => (s"k${i % 50}", s"payload-$i"))
      input.toDF("key", "value")
        .write.format("kafka-wire")
        .option("host", host).option("port", port.toString)
        .option("topic", topic).mode("append").save()

      val chk = java.nio.file.Files
        .createTempDirectory("graft_it_chk_").toString
      val q = spark.readStream.format("kafka-wire")
        .option("host", host).option("port", port.toString)
        .option("topic", topic)
        .load()
        .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
        .writeStream.format("memory").queryName("graft_it_sink")
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("graft_it_sink")
        .as[(String, String)].collect().toSet
      assert(got == input.toSet)
    }
  }

  test("kafka transactional publish is exactly-once under read_committed (stub or GRAFT_KAFKA_BOOTSTRAP)") {
    import spark.implicits._
    withKafka { (host, port) =>
      val topic = unique("graft-it-eos")
      val ex = new graft.kafka.KafkaWireExchange(host, port,
        transactionalId = Some(unique("graft-it-txn")))
      val wire = (0 until 300).map(i => (s"k$i", s"v$i")).toDF("key", "value")
      // attempt 1 killed after produce, attempt 2 commits (see
      // KafkaWireExchange.publish's transactional contract)
      ex.publish(wire, graft.replay.Replay.ReplayConfig(
        input = "", topic = topic, repeat = 2))
      val committed = ex.readCommitted(spark, topic)
      assert(committed.count() == 300L)
      assert(committed.select(col("key")).distinct().count() == 300L)
    }
  }

  test("elasticsearch _bulk upsert with external versioning (stub or GRAFT_ES_URL)") {
    import spark.implicits._
    withEs { url =>
      val index = unique("graft-it")
      val docSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "room STRING, temp DOUBLE, v BIGINT")
      val store = new EsHttpStore(url, index, "room", Seq("v"), "v", docSchema)
      assert(store.healthCheck(), s"ES at $url failed the preflight")
      store.upsert(Seq(("r1", 20.0, 1L), ("r2", 21.0, 1L))
        .toDF("room", "temp", "v"), 0L)
      // second batch: r1 updated (higher version), r2 stale (ignored)
      store.upsert(Seq(("r1", 25.0, 2L), ("r2", 99.0, 0L))
        .toDF("room", "temp", "v"), 1L)
      val state = store.read(spark)
        .select("room", "temp").as[(String, Double)].collect().toMap
      assert(state == Map("r1" -> 25.0, "r2" -> 21.0))
    }
  }
}
