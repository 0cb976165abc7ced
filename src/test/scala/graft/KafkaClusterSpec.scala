package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.kafka.{KafkaClusterClient, KafkaCodec, KafkaStubCluster, KafkaWireClient}
import graft.kafka.KafkaCodec.Err

/** Multi-broker cluster semantics: partition leadership split across
  * brokers, NOT_LEADER / NOT_COORDINATOR from the wrong broker, leader
  * and coordinator routing in [[KafkaClusterClient]], cross-broker
  * transaction markers (coordinator→leader WriteTxnMarkers hop), and
  * the DSv2 connector planning each slice at its partition's leader —
  * the shape that makes produce/fetch bandwidth scale with brokers
  * instead of funneling through one endpoint.
  */
class KafkaClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def s(a: Array[Byte]): String = new String(a, StandardCharsets.UTF_8)

  private def withCluster[A](nBrokers: Int = 3, numPartitions: Int = 3)(
      f: KafkaStubCluster => A): A = {
    val c = new KafkaStubCluster(nBrokers, numPartitions)
    c.start()
    try f(c) finally c.stop()
  }

  private def withClusterClient[A](cluster: KafkaStubCluster)(
      f: KafkaClusterClient => A): A = {
    val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
    try f(c) finally c.close()
  }

  test("any broker serves full cluster metadata with split leadership") {
    withCluster() { cluster =>
      cluster.brokers.foreach { broker =>
        val c = new KafkaWireClient("127.0.0.1", broker.port)
        try {
          val m = c.metadataFull(Seq("t"))
          assert(m.brokers.map(_.nodeId).sorted == Seq(0, 1, 2))
          assert(m.brokers.map(_.port).toSet ==
            cluster.brokers.map(_.port).toSet)
          val leaders = m.topics.head.partitions.map(p => p.partition -> p.leader)
          assert(leaders.toMap == Map(0 -> 0, 1 -> 1, 2 -> 2))
        } finally c.close()
      }
    }
  }

  test("a non-leader answers data APIs with NOT_LEADER_FOR_PARTITION") {
    withCluster() { cluster =>
      // broker 0 leads partition 0; address partition 1 at broker 0
      val c = new KafkaWireClient("127.0.0.1", cluster.brokers(0).port)
      try {
        c.metadata(Seq("t"))
        val pe = intercept[IllegalArgumentException] {
          c.produce("t", 1, Seq((1L, null, b("x"))))
        }
        assert(pe.getMessage.contains(Err.NotLeaderForPartition.toString))
        assert(c.fetch("t", 1, 0L).errorCode == Err.NotLeaderForPartition)
        val le = intercept[IllegalArgumentException] {
          c.listOffset("t", 1, -1L)
        }
        assert(le.getMessage.contains(Err.NotLeaderForPartition.toString))
      } finally c.close()
    }
  }

  test("cluster client routes produce/fetch/offsets to each partition's leader") {
    withCluster() { cluster =>
      withClusterClient(cluster) { c =>
        c.metadata(Seq("t"))
        (0 until 3).foreach { p =>
          c.produce("t", p, Seq((1L, null, b(s"p$p-a")), (2L, null, b(s"p$p-b"))))
        }
        (0 until 3).foreach { p =>
          assert(c.fetchAll("t", p).map(r => s(r.value)) ==
            Seq(s"p$p-a", s"p$p-b"))
          assert(c.listOffset("t", p, -1L) == 2L)
        }
        // records physically live ONLY on the leader (bandwidth scales)
        cluster.brokers.foreach { broker =>
          (0 until 3).foreach { p =>
            val expected = if (cluster.leaderOf(p) == broker.brokerId) 2L else 0L
            assert(broker.highWatermark("t", p) == expected,
              s"broker ${broker.brokerId} partition $p")
          }
        }
      }
    }
  }

  test("group offsets live on the coordinator; wrong broker says NOT_COORDINATOR") {
    withCluster() { cluster =>
      val group = "lag-monitor"
      val coordId = cluster.coordinatorOf(group)
      val wrong = cluster.brokers((coordId + 1) % 3)
      val c = new KafkaWireClient("127.0.0.1", wrong.port)
      try {
        c.metadata(Seq("t"))
        // discovery from ANY broker names the right coordinator
        val (nodeId, _, port) = c.findCoordinator(group)
        assert(nodeId == coordId && port == cluster.brokers(coordId).port)
        // committing at the wrong broker is rejected
        val e = intercept[IllegalArgumentException] {
          c.commitOffsets(group, "t", Map(0 -> 1L))
        }
        assert(e.getMessage.contains(Err.NotCoordinator.toString))
      } finally c.close()
      withClusterClient(cluster) { cc =>
        cc.commitOffsets(group, "t", Map(0 -> 5L, 1 -> 3L))
        assert(cc.committedOffsets(group, "t", Seq(0, 1, 2)) ==
          Map(0 -> 5L, 1 -> 3L))
        assert(cluster.brokers(coordId).committedOffset(group, "t", 0)
          .contains(5L))
      }
    }
  }

  test("transaction markers cross brokers: coordinator writes to every leader") {
    withCluster() { cluster =>
      withClusterClient(cluster) { c =>
        c.metadata(Seq("t"))
        val txn = "xbroker"
        val (pid, epoch) = c.initProducerId(txn)
        c.addPartitionsToTxn(txn, pid, epoch, "t", Seq(0, 2))
        c.produce("t", 0, Seq((1L, null, b("a"))), gzip = false,
          pid, epoch, 0, transactionalId = txn)
        c.produce("t", 2, Seq((1L, null, b("c"))), gzip = false,
          pid, epoch, 0, transactionalId = txn)
        // open: committed reads see nothing on either leader
        assert(c.fetchAll("t", 0, readCommitted = true).isEmpty)
        assert(c.fetchAll("t", 2, readCommitted = true).isEmpty)
        c.endTxn(txn, pid, epoch, commit = true)
        // the coordinator wrote a marker on BOTH partition leaders
        assert(c.fetchAll("t", 0, readCommitted = true).map(r => s(r.value)) ==
          Seq("a"))
        assert(c.fetchAll("t", 2, readCommitted = true).map(r => s(r.value)) ==
          Seq("c"))
        assert(cluster.brokers(0).highWatermark("t", 0) == 2L) // data + marker
        assert(cluster.brokers(2).highWatermark("t", 2) == 2L)
      }
    }
  }

  test("DSv2 round trip over a 3-broker cluster: write and read route per leader") {
    withCluster() { cluster =>
      import spark.implicits._
      (0 until 60).map(i => (s"k$i", s"""{"id":$i}""")).toDF("key", "value")
        .write.format("kafka-wire")
        .option("host", "127.0.0.1")
        .option("port", cluster.bootstrapPort.toString)
        .option("topic", "dist").mode("append").save()
      // every broker holds exactly its led partition's bytes
      cluster.brokers.foreach { broker =>
        (0 until 3).foreach { p =>
          val owns = cluster.leaderOf(p) == broker.brokerId
          assert((broker.highWatermark("dist", p) > 0) == owns)
        }
      }
      val back = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1")
        .option("port", cluster.bootstrapPort.toString)
        .option("topic", "dist").load()
        .selectExpr("partition", "CAST(value AS STRING) AS v")
        .select(col("partition"),
          get_json_object(col("v"), "$.id").cast("int").as("id"))
        .collect()
      assert(back.length == 60)
      assert(back.map(_.getInt(1)).sorted.toSeq == (0 until 60))
      // murmur2 placement agrees with the leader split the readers used
      back.foreach { r =>
        val expected = KafkaCodec.partitionFor(b(s"k${r.getInt(1)}"), 3)
        assert(r.getInt(0) == expected)
      }
    }
  }
}
