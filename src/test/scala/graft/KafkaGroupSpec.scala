package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kafka.{KafkaStubBroker, KafkaWireClient}

/** Consumer-group OFFSET protocol on the wire pair (FindCoordinator /
  * OffsetCommit / OffsetFetch): coordinator discovery, simple-consumer
  * commits (generation -1 — the manual-assignment mode Spark's own
  * consumers run in), the -1 "no committed offset" sentinel, lag math,
  * the source's per-batch group commits under `kafka.group.id`, and the
  * checkpoint-free `startingOffsets=group` handover. The rebalance
  * protocol (JoinGroup/SyncGroup/Heartbeat) stays a non-goal — the
  * broker rejects membership generations exactly as a real one does for
  * a group with no active members.
  */
class KafkaGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def withBroker[A](numPartitions: Int = 3)(f: KafkaStubBroker => A): A = {
    val broker = new KafkaStubBroker(numPartitions)
    broker.start()
    try f(broker) finally broker.stop()
  }

  private def withClient[A](broker: KafkaStubBroker)(f: KafkaWireClient => A): A = {
    val c = new KafkaWireClient("127.0.0.1", broker.port)
    try f(c) finally c.close()
  }

  test("FindCoordinator: every group's coordinator is the single broker") {
    withBroker() { broker =>
      withClient(broker) { c =>
        val (nodeId, host, port) = c.findCoordinator("any-group")
        assert(nodeId == 0)
        assert(host == "127.0.0.1")
        assert(port == broker.port)
      }
    }
  }

  test("commit/fetch round trip: absent partitions omitted, re-commit overwrites") {
    withBroker(3) { broker =>
      withClient(broker) { c =>
        c.metadata(Seq("t"))
        // nothing committed yet: every partition absent
        assert(c.committedOffsets("g", "t", Seq(0, 1, 2)).isEmpty)
        c.commitOffsets("g", "t", Map(0 -> 5L, 2 -> 9L), metadata = "wave-1")
        assert(c.committedOffsets("g", "t", Seq(0, 1, 2)) == Map(0 -> 5L, 2 -> 9L))
        // groups are independent namespaces
        assert(c.committedOffsets("other", "t", Seq(0, 1, 2)).isEmpty)
        // re-commit overwrites (last commit wins, no merging)
        c.commitOffsets("g", "t", Map(0 -> 7L))
        assert(c.committedOffsets("g", "t", Seq(0, 1, 2)) == Map(0 -> 7L, 2 -> 9L))
        assert(broker.committedOffset("g", "t", 0).contains(7L))
      }
    }
  }

  test("member-protocol generation is rejected with ILLEGAL_GENERATION") {
    withBroker() { broker =>
      withClient(broker) { c =>
        c.metadata(Seq("t"))
        val e = intercept[IllegalArgumentException] {
          c.commitOffsets("g", "t", Map(0 -> 1L), generation = 3)
        }
        assert(e.getMessage.contains("22"), e.getMessage)
        // the rejected commit stored nothing
        assert(c.committedOffsets("g", "t", Seq(0)).isEmpty)
      }
    }
  }

  test("commit to an unknown partition fails per-partition, the rest commit") {
    withBroker(2) { broker =>
      withClient(broker) { c =>
        c.metadata(Seq("t"))
        intercept[IllegalArgumentException] {
          c.commitOffsets("g", "t", Map(0 -> 3L, 9 -> 1L))
        }
        // per-partition error contract: the valid partition's commit stood
        assert(c.committedOffsets("g", "t", Seq(0, 1)) == Map(0 -> 3L))
      }
    }
  }

  test("groupLag: committed-vs-log-end math with a zero floor") {
    withBroker(2) { broker =>
      withClient(broker) { c =>
        c.metadata(Seq("t"))
        (1 to 5).foreach(i => c.produce("t", 0, Seq((i.toLong, null, b(s"v$i")))))
        c.produce("t", 1, Seq((1L, null, b("w"))))
        c.commitOffsets("g", "t", Map(0 -> 2L)) // 3 behind on p0, nothing on p1
        assert(c.groupLag("g", "t", Seq(0, 1)) ==
          Seq((0, 2L, 5L, 3L), (1, 0L, 1L, 1L)))
        // committed at (or past) the end: lag floors at zero
        c.commitOffsets("g", "t", Map(0 -> 5L, 1 -> 1L))
        assert(c.groupLag("g", "t", Seq(0, 1)).forall(_._4 == 0L))
      }
    }
  }

  private def readStream(broker: KafkaStubBroker, topic: String,
      options: Map[String, String]): DataFrame = {
    val base = spark.readStream.format("kafka-wire")
      .option("host", "127.0.0.1").option("port", broker.port.toString)
      .option("topic", topic)
    options.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .select(col("value").cast("string").as("v"))
  }

  private def tmp(prefix: String): String = {
    val root = java.nio.file.Paths.get("target", "stores")
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.createTempDirectory(root, prefix).toString
  }

  /** AvailableNow drain through a recoverable foreachBatch parquet sink
    * (shared checkpoint across calls), returning the values THIS run
    * emitted.
    */
  private def drain(broker: KafkaStubBroker, topic: String, checkpoint: String,
      options: Map[String, String]): Seq[String] = {
    val outDir = tmp("grp_out_")
    val q = readStream(broker, topic, options)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.write.mode("append").parquet(outDir))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val files = new java.io.File(outDir).listFiles()
    if (files == null || !files.exists(_.getName.endsWith(".parquet"))) Seq.empty
    else spark.read.parquet(outDir).collect().map(_.getString(0)).toSeq.sorted
  }

  test("kafka.group.id: engine-durable batches commit to the group as the drain runs") {
    withBroker(2) { broker =>
      withClient(broker) { c =>
        c.metadata(Seq("t"))
        (1 to 10).foreach(i => c.produce("t", i % 2, Seq((i.toLong, null, b(s"v$i")))))
        val opts = Map("kafka.group.id" -> "mon", "maxOffsetsPerTrigger" -> "3")
        // the cap forces a multi-batch drain; the engine signals a
        // batch durable (source.commit) when it constructs the NEXT
        // one, so every batch but the LAST is committed to the group at
        // stop — the same one-batch lag a listener-based lag committer
        // observes, and the real group-commit contract (at-least-once)
        assert(drain(broker, "t", tmp("chk_mon_"), opts).size == 10)
        val committed = (0 to 1)
          .map(p => broker.committedOffset("mon", "t", p).getOrElse(0L)).sum
        assert(committed >= 7 && committed < 10,
          s"expected all-but-final-batch committed, got $committed")
      }
    }
  }

  test("startingOffsets=group: handover is at-least-once; key dedup restores exactly-once") {
    withBroker(2) { broker =>
      withClient(broker) { c =>
        c.metadata(Seq("t"))
        (1 to 6).foreach(i => c.produce("t", i % 2, Seq((i.toLong, null, b(s"a$i")))))
        val opts = Map("kafka.group.id" -> "handover",
          "startingOffsets" -> "group", "maxOffsetsPerTrigger" -> "2")
        // wave 1: no committed offsets yet -> earliest fallback
        val wave1 = drain(broker, "t", tmp("chk_h1_"), opts)
        assert(wave1.size == 6)
        (7 to 10).foreach(i => c.produce("t", i % 2, Seq((i.toLong, null, b(s"b$i")))))
        // wave 2: FRESH checkpoint — the group is the only resume state.
        // It must deliver every new record, may re-deliver at most the
        // final (uncommitted) batch of wave 1, and never re-reads the
        // committed prefix.
        val wave2 = drain(broker, "t", tmp("chk_h2_"), opts).toSet
        val fresh = (7 to 10).map(i => s"b$i").toSet
        assert(fresh.subsetOf(wave2), s"lost records: ${fresh -- wave2}")
        assert((wave2 -- fresh).size <= 2, s"re-read beyond the final batch: $wave2")
        // consumer-side key dedup (the standard idempotent-consumer
        // discipline) restores exactly-once end-to-end
        assert((wave1.toSet ++ wave2).size == 10)
      }
    }
  }

  test("startingOffsets=group without kafka.group.id fails the plan loudly") {
    withBroker() { broker =>
      val e = intercept[IllegalArgumentException] {
        readStream(broker, "t", Map("startingOffsets" -> "group"))
      }
      assert(e.getMessage.contains("kafka.group.id"))
    }
  }
}
