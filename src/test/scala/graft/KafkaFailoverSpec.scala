package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.kafka.{KafkaClusterClient, KafkaStubCluster, KafkaWireClient}

/** Replication + leader failover on the multi-broker stub
  * ([[KafkaStubCluster]] with `replicationFactor` > 1) and the routing
  * client's recovery loop: acked appends mirror synchronously to
  * follower replicas (acks=all), [[KafkaStubCluster.failBroker]] kills
  * sockets and promotes the next alive replica with a bumped leader
  * epoch, and [[KafkaClusterClient]] re-routes on dead connections /
  * NOT_LEADER answers so acked records stay readable and producible
  * through a broker loss. Producer state replicates with the log, so
  * idempotent fencing keeps working under the promoted leader; group
  * offsets mirror across the coordinator's standby set.
  */
class KafkaFailoverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def str(a: Array[Byte]): String = new String(a, StandardCharsets.UTF_8)

  private def withCluster[A](nBrokers: Int = 3, numPartitions: Int = 3,
      rf: Int = 2)(f: KafkaStubCluster => A): A = {
    val c = new KafkaStubCluster(nBrokers, numPartitions,
      replicationFactor = rf)
    c.start()
    try f(c) finally c.stop()
  }

  private def tmp(prefix: String): String = {
    val root = java.nio.file.Paths.get("target", "stores")
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.createTempDirectory(root, prefix).toString
  }

  test("acks=all replication: followers hold every acked record, non-replicas none") {
    withCluster() { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("rep"))
        (0 until 3).foreach { p =>
          c.produce("rep", p, (0 until 10).map(i => (1L + i, b(s"k$i"), b(s"v$p-$i"))))
        }
        (0 until 3).foreach { p =>
          val replicas = cluster.replicasOf(p).toSet
          cluster.brokers.foreach { broker =>
            val expected = if (replicas(broker.brokerId)) 10L else 0L
            assert(broker.highWatermark("rep", p) == expected,
              s"broker ${broker.brokerId} partition $p")
          }
        }
      } finally c.close()
    }
  }

  test("leader failover: the same client re-routes, acked records survive, epoch bumps") {
    withCluster() { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.brokers(1).port)
      try {
        c.metadata(Seq("fo"))
        (0 until 3).foreach { p =>
          c.produce("fo", p, (0 until 5).map(i => (1L, null, b(s"a$p-$i"))))
        }
        assert(cluster.leaderOf(0) == 0 && cluster.leaderEpoch(0) == 0)
        cluster.failBroker(0)
        // partition 0's leadership moved to its follower (broker 1)
        assert(cluster.leaderOf(0) == 1)
        assert(cluster.leaderEpoch(0) == 1)
        assert(cluster.leaderOf(1) == 1 && cluster.leaderEpoch(1) == 0)
        // the SAME client instance: its socket to broker 0 is dead; the
        // next call must refresh metadata and land on the new leader
        val got = c.fetchAll("fo", 0).map(r => str(r.value))
        assert(got == (0 until 5).map(i => s"a0-$i"))
        // and the partition stays WRITABLE through the same client
        c.produce("fo", 0, Seq((2L, null, b("post-failover"))))
        assert(c.fetchAll("fo", 0).map(r => str(r.value)).last == "post-failover")
      } finally c.close()
    }
  }

  test("metadata after failover: dead broker gone, promoted leader, shrunken ISR") {
    withCluster() { cluster =>
      val warm = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try { warm.metadata(Seq("meta")) } finally warm.close()
      cluster.failBroker(0)
      val c = new KafkaWireClient("127.0.0.1", cluster.brokers(1).port)
      try {
        val m = c.metadataFull(Seq("meta"))
        assert(m.brokers.map(_.nodeId).sorted == Seq(1, 2))
        val leaders = m.topics.head.partitions.map(p => p.partition -> p.leader).toMap
        assert(leaders == Map(0 -> 1, 1 -> 1, 2 -> 2))
      } finally c.close()
    }
  }

  test("idempotent producer state survives failover: promoted leader re-acks the dup") {
    withCluster() { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.brokers(1).port)
      try {
        c.metadata(Seq("idem"))
        val (pid, epoch) = c.initProducerId()
        val records = (0 until 8).map(i => (1L + i, b(s"k$i"), b(s"v$i")))
        val base = c.produce("idem", 0, records, producerId = pid,
          producerEpoch = epoch, baseSequence = 0)
        cluster.failBroker(0) // partition 0's leader dies
        // the network-level retry of the SAME batch hits the promoted
        // leader, whose replicated producer state must fence it: same
        // base offset back, nothing appended
        val retryBase = c.produce("idem", 0, records, producerId = pid,
          producerEpoch = epoch, baseSequence = 0)
        assert(retryBase == base)
        assert(c.fetchAll("idem", 0).size == 8)
      } finally c.close()
    }
  }

  test("group offsets survive coordinator failover via the standby mirror") {
    withCluster() { cluster =>
      val group = "fo-group"
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("go"))
        c.commitOffsets(group, "go", Map(0 -> 42L, 1 -> 7L))
        val coord = cluster.coordinatorOf(group)
        cluster.failBroker(coord)
        assert(cluster.coordinatorOf(group) != coord)
        // the same client re-discovers the successor, which holds the
        // mirrored positions
        assert(c.committedOffsets(group, "go", Seq(0, 1, 2)) ==
          Map(0 -> 42L, 1 -> 7L))
      } finally c.close()
    }
  }

  test("transaction interrupted by coordinator death: successor aborts the dangling txn, restart commits") {
    withCluster() { cluster =>
      val txnId = "fo-txn"
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("tfo"))
        val coord = cluster.coordinatorOf(txnId)
        // produce the open transaction into a partition the coordinator
        // does NOT lead, so the kill hits ONLY coordination — the data
        // path staying healthy is what makes a stuck LSO the failure
        // mode a coordinator loss would otherwise leave behind
        val p = (0 until 3).find(pp => cluster.leaderOf(pp) != coord).get
        val (pid, epoch) = c.initProducerId(txnId)
        c.addPartitionsToTxn(txnId, pid, epoch, "tfo", Seq(p))
        c.produce("tfo", p,
          Seq((1L, b("k1"), b("doomed-1")), (2L, b("k2"), b("doomed-2"))),
          producerId = pid, producerEpoch = epoch, baseSequence = 0,
          transactionalId = txnId)
        // open txn: LSO pinned at its first offset, read_committed blind
        assert(c.lastStableOffset("tfo", p) == 0L)
        assert(c.fetchAll("tfo", p, readCommitted = true).isEmpty)

        cluster.failBroker(coord)
        assert(cluster.coordinatorOf(txnId) != coord)

        // producer restart: the SAME client re-discovers the successor,
        // whose mirrored txn state returns the same pid with a bumped
        // epoch and ABORTS the dangling transaction — LSO released
        // (2 data records + abort marker), records dead to
        // read_committed instead of blocking it forever
        val (pid2, epoch2) = c.initProducerId(txnId)
        assert(pid2 == pid, "same transactional.id must keep its pid across failover")
        assert(epoch2 == epoch + 1, "successor must fence the old epoch")
        assert(c.lastStableOffset("tfo", p) == 3L)
        assert(c.fetchAll("tfo", p, readCommitted = true).isEmpty)

        // a zombie of the dead-coordinator era cannot write
        c.addPartitionsToTxn(txnId, pid2, epoch2, "tfo", Seq(p))
        val fenced = intercept[IllegalArgumentException] {
          c.produce("tfo", p, Seq((3L, b("k"), b("zombie"))),
            producerId = pid, producerEpoch = epoch, baseSequence = 2,
            transactionalId = txnId)
        }
        assert(fenced.getMessage.contains(
          graft.kafka.KafkaCodec.Err.InvalidProducerEpoch.toString))

        // the restarted transaction runs to commit through the successor
        c.produce("tfo", p, Seq((4L, b("k"), b("fresh"))),
          producerId = pid2, producerEpoch = epoch2, baseSequence = 0,
          transactionalId = txnId)
        c.endTxn(txnId, pid2, epoch2, commit = true)
        assert(c.fetchAll("tfo", p, readCommitted = true)
          .map(r => str(r.value)) == Seq("fresh"))
      } finally c.close()
    }
  }

  test("failing the last replica of a partition fails loudly, not silently") {
    withCluster(nBrokers = 2, numPartitions = 2, rf = 1) { cluster =>
      val e = intercept[IllegalStateException](cluster.failBroker(0))
      assert(e.getMessage.contains("lost its last replica"))
    }
  }

  test("DSv2 batch read over a bootstrap LIST survives the first endpoint being down") {
    withCluster() { cluster =>
      import spark.implicits._
      val deadPort = cluster.brokers(0).port
      (0 until 90).map(i => (s"k$i", s"""{"id":$i}""")).toDF("key", "value")
        .write.format("kafka-wire")
        .option("kafka.bootstrap.servers",
          s"127.0.0.1:${cluster.bootstrapPort}")
        .option("topic", "boot").mode("append").save()
      cluster.failBroker(0)
      // bootstrap list leads with the DEAD endpoint; the planner must
      // dial past it, and every planned slice lands on an alive leader
      val got = spark.read.format("kafka-wire")
        .option("kafka.bootstrap.servers",
          s"127.0.0.1:$deadPort,127.0.0.1:${cluster.brokers(1).port}")
        .option("topic", "boot").load()
        .selectExpr("CAST(value AS STRING) AS v")
        .select(get_json_object(col("v"), "$.id").cast("int").as("id"))
        .as[Int].collect().sorted
      assert(got.toSeq == (0 until 90))
    }
  }

  test("partition reader re-routes when its pinned leader died after planning") {
    withCluster() { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.brokers(1).port)
      try {
        c.metadata(Seq("prw"))
        c.produce("prw", 0, (0 until 20).map(i => (1L + i, null, b(s"r$i"))))
      } finally c.close()
      // the exact window the DSv2 planner leaves open: the slice pins
      // partition 0's leader endpoint, then that broker dies before the
      // task opens its socket
      val deadPort = cluster.brokers(0).port
      cluster.failBroker(0)
      val part = graft.kafka.KafkaWireInputPartition("127.0.0.1", deadPort,
        "prw", 0, 0L, 20L,
        fallback = Seq(("127.0.0.1", cluster.brokers(1).port)))
      val reader = new graft.kafka.KafkaWirePartitionReader(part)
      try {
        val got = Iterator.continually(reader)
          .takeWhile(_.next()).map(_.get().getLong(4)).toVector
        assert(got == (0L until 20L).toVector)
      } finally reader.close()
    }
  }

  test("a hung broker surfaces as a timeout, not a forever-pinned task") {
    // a server that accepts and then never answers — the hang mode a
    // network partition or wedged broker produces
    val server = new java.net.ServerSocket(0)
    val sink = new Thread(() =>
      try { val s = server.accept(); Thread.sleep(600000); s.close() }
      catch { case _: Exception => () })
    sink.setDaemon(true)
    sink.start()
    try {
      val c = new KafkaWireClient("127.0.0.1", server.getLocalPort,
        requestTimeoutMs = 500)
      try {
        val t0 = System.nanoTime()
        intercept[java.net.SocketTimeoutException](c.metadata(Seq("t")))
        val elapsedMs = (System.nanoTime() - t0) / 1000000
        assert(elapsedMs < 10000, s"timeout took ${elapsedMs}ms")
      } finally c.close()
    } finally server.close()
  }

  test("restarted broker catches up missed appends and resumes follower duty") {
    withCluster() { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.brokers(1).port)
      try {
        c.metadata(Seq("rj"))
        (0 until 3).foreach { p =>
          c.produce("rj", p, Seq((1L, null, b(s"pre-$p"))))
        }
        cluster.failBroker(0)
        // appends broker 0 misses while down (partitions 0 and 2 — its
        // replica set under rf=2 with 3 brokers/partitions)
        (0 until 3).foreach { p =>
          c.produce("rj", p, Seq((2L, null, b(s"miss-$p"))))
        }
        cluster.restartBroker(0)
        assert(cluster.isAlive(0))
        // catch-up: broker 0 holds the full log of every partition it
        // replicates (0 and 2), nothing of partition 1
        assert(cluster.brokers(0).highWatermark("rj", 0) == 2L)
        assert(cluster.brokers(0).highWatermark("rj", 2) == 2L)
        assert(cluster.brokers(0).highWatermark("rj", 1) == 0L)
        // leadership did NOT move back (no preferred-leader election)
        assert(cluster.leaderOf(0) == 1)
        // follower duty resumes: a post-restart acked append mirrors in
        c.produce("rj", 0, Seq((3L, null, b("post-rejoin"))))
        assert(cluster.brokers(0).highWatermark("rj", 0) == 3L)
        // and the rejoined broker serves metadata again, on a live port
        val m = new KafkaWireClient("127.0.0.1", cluster.brokers(0).port)
        try assert(m.metadataFull(Seq("rj")).brokers.map(_.nodeId).sorted ==
          Seq(0, 1, 2))
        finally m.close()
      } finally c.close()
    }
  }

  test("restarted coordinator standby holds offsets committed while it was down") {
    withCluster() { cluster =>
      val group = "rejoin-group"
      val c = new KafkaClusterClient("127.0.0.1", cluster.brokers(1).port)
      try {
        c.metadata(Seq("rg"))
        val coord = cluster.coordinatorOf(group)
        cluster.failBroker(coord)
        c.commitOffsets(group, "rg", Map(0 -> 11L)) // lands on the successor
        cluster.restartBroker(coord)
        // coordination returns to the preferred (first-in-standby)
        // broker, which caught up the offsets committed in its absence
        assert(cluster.coordinatorOf(group) == coord)
        assert(c.committedOffsets(group, "rg", Seq(0, 1, 2)) == Map(0 -> 11L))
      } finally c.close()
    }
  }

  test("checkpointed stream resumes exactly-once across a broker loss") {
    withCluster() { cluster =>
      import spark.implicits._
      val checkpoint = tmp("chk_fo_")
      val outDir = tmp("fo_out_")
      def drain(bootstrapPort: Int): Unit = {
        val q = spark.readStream.format("kafka-wire")
          .option("kafka.bootstrap.servers", s"127.0.0.1:$bootstrapPort")
          .option("topic", "fstream")
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
      }
      def produce(ids: Range): Unit = {
        val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
        try {
          val nParts = c.metadata(Seq("fstream")).head.partitions.size
          ids.groupBy(_ % nParts).foreach { case (p, ps) =>
            c.produce("fstream", p, ps.map(i => (1L + i, b(s"k$i"), b(s"""{"id":$i}"""))))
          }
        } finally c.close()
      }
      produce(0 until 60)
      drain(cluster.bootstrapPort)
      // the broker leading partition 0 (and the original bootstrap) dies
      cluster.failBroker(0)
      produce(60 until 120)
      // resume from the checkpoint against a SURVIVOR bootstrap: the
      // second wave arrives exactly once, nothing from wave one repeats
      drain(cluster.bootstrapPort)
      val got = spark.read.parquet(outDir).as[Int].collect().sorted
      assert(got.toSeq == (0 until 120))
    }
  }
}
