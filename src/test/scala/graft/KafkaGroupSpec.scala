package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kafka.{KafkaStubBroker, KafkaWireClient}

/** Consumer-group protocol on the wire: the OFFSET surface
  * (FindCoordinator / OffsetCommit / OffsetFetch — coordinator
  * discovery, simple-consumer commits in the manual-assignment mode
  * Spark's own consumers run in, the -1 "no committed offset"
  * sentinel, lag math, per-batch group commits under `kafka.group.id`,
  * the checkpoint-free `startingOffsets=group` handover) and, since
  * round 13, the classic eager REBALANCE protocol (JoinGroup /
  * SyncGroup / Heartbeat / LeaveGroup v0): generation lifecycle,
  * leader election and opaque assignment relay, session-timeout
  * eviction, rejoin-on-rebalance signaling, and the zombie-commit
  * generation fence.
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

  // ---- classic rebalance protocol (round 13) ----

  test("rebalance lifecycle: two concurrent joins land in ONE generation, the leader relays range assignments") {
    withBroker() { broker =>
      val a = new KafkaWireClient("127.0.0.1", broker.port, clientId = "ca")
      val b = new KafkaWireClient("127.0.0.1", broker.port, clientId = "cb")
      try {
        // both join with empty member ids; the initial-rebalance delay
        // folds the pair into a single generation
        val results = new java.util.concurrent.ConcurrentLinkedQueue[KafkaWireClient.JoinResult]
        val ta = new Thread(() => results.add(a.joinGroup("g1")))
        val tb = new Thread(() => { Thread.sleep(10); results.add(b.joinGroup("g1")) })
        ta.start(); tb.start(); ta.join(15000); tb.join(15000)
        val rs = results.toArray(Array.empty[KafkaWireClient.JoinResult])
        assert(rs.length == 2)
        assert(rs.map(_.generation).toSet == Set(1),
          s"joins split across generations: ${rs.map(_.generation).toSeq}")
        assert(rs.map(_.leaderId).toSet.size == 1)
        val leader = rs.find(_.isLeader).get
        val follower = rs.find(!_.isLeader).get
        // only the leader sees the member list (the assignor's input)
        assert(leader.members.map(_._1).sorted ==
          Seq(leader.memberId, follower.memberId).sorted)
        assert(follower.members.isEmpty)
        // leader computes the range split and relays it through sync;
        // the follower's sync parks until the assignments land
        val split = KafkaWireClient.rangeAssign(
          leader.members.map(_._1), 0 until broker.numPartitions)
        val assignments = split.map { case (m, ps) =>
          m -> KafkaWireClient.encodeAssignment("t", ps)
        }
        // each member id is minted as "<clientId>-<seq>", so the
        // prefix resolves which socket owns which member
        def clientOf(memberId: String): KafkaWireClient =
          if (memberId.startsWith("ca-")) a else b
        @volatile var followerBytes: Array[Byte] = null
        val tf = new Thread(() => {
          val (err, bytes) = clientOf(follower.memberId)
            .syncGroup("g1", follower.generation, follower.memberId)
          if (err == 0) followerBytes = bytes
        })
        tf.start()
        val (errL, leaderBytes) = clientOf(leader.memberId)
          .syncGroup("g1", leader.generation, leader.memberId, assignments)
        assert(errL == 0)
        tf.join(15000)
        assert(followerBytes != null, "follower sync never completed")
        val (tL, psL) = KafkaWireClient.decodeAssignment(leaderBytes)
        val (tF, psF) = KafkaWireClient.decodeAssignment(followerBytes)
        assert(tL == "t" && tF == "t")
        // the two assignments partition the topic exactly
        assert((psL ++ psF).sorted == (0 until broker.numPartitions))
        assert(psL.toSet.intersect(psF.toSet).isEmpty)
        // stable group: heartbeats answer NONE for both members
        assert(clientOf(leader.memberId)
          .heartbeat("g1", leader.generation, leader.memberId) == 0)
        assert(clientOf(follower.memberId)
          .heartbeat("g1", follower.generation, follower.memberId) == 0)
      } finally { a.close(); b.close() }
    }
  }

  test("a silent member is evicted on session timeout; the survivor rebalances to a new generation owning everything") {
    withBroker() { broker =>
      val a = new KafkaWireClient("127.0.0.1", broker.port, clientId = "ca")
      val b = new KafkaWireClient("127.0.0.1", broker.port, clientId = "cb")
      try {
        val results = new java.util.concurrent.ConcurrentLinkedQueue[KafkaWireClient.JoinResult]
        val ta = new Thread(() => results.add(a.joinGroup("g2", sessionTimeoutMs = 30000)))
        val tb = new Thread(() => { Thread.sleep(10);
          results.add(b.joinGroup("g2", sessionTimeoutMs = 800)) })
        ta.start(); tb.start(); ta.join(15000); tb.join(15000)
        val rs = results.toArray(Array.empty[KafkaWireClient.JoinResult])
        assert(rs.map(_.generation).toSet == Set(1))
        def clientOf(memberId: String): KafkaWireClient =
          if (memberId.startsWith("ca-")) a else b
        val leader = rs.find(_.isLeader).get
        val assignments = KafkaWireClient.rangeAssign(
          leader.members.map(_._1), 0 until 3).map { case (m, ps) =>
          m -> KafkaWireClient.encodeAssignment("t", ps) }
        val syncs = rs.map { r =>
          new Thread(() => clientOf(r.memberId).syncGroup("g2", r.generation,
            r.memberId, if (r.isLeader) assignments else Map.empty))
        }
        syncs.foreach(_.start()); syncs.foreach(_.join(15000))
        // the short-session member (cb-*) goes silent; the survivor
        // keeps heartbeating until the coordinator's eviction flips the
        // group into a rebalance
        val aId = rs.find(_.memberId.startsWith("ca-")).get.memberId
        val deadline = System.currentTimeMillis() + 15000
        var hb = 0
        while (hb == 0 && System.currentTimeMillis() < deadline) {
          Thread.sleep(100)
          hb = a.heartbeat("g2", 1, aId)
        }
        assert(hb == 27, s"expected REBALANCE_IN_PROGRESS after eviction, got $hb")
        // rejoin: generation 2, sole member, leader, owns the topic
        val r2 = a.joinGroup("g2", memberId = aId, sessionTimeoutMs = 30000)
        assert(r2.generation == 2)
        assert(r2.isLeader && r2.members.map(_._1) == Seq(aId))
        val (err2, bytes2) = a.syncGroup("g2", 2, aId, Map(
          aId -> KafkaWireClient.encodeAssignment("t", 0 until 3)))
        assert(err2 == 0)
        assert(KafkaWireClient.decodeAssignment(bytes2)._2 == (0 until 3))
      } finally { a.close(); b.close() }
    }
  }

  test("zombie-commit fence: stale generation and unknown member rejected; the live member commits; simple-consumer commits blocked while the group has members") {
    withBroker() { broker =>
      val a = new KafkaWireClient("127.0.0.1", broker.port, clientId = "ca")
      try {
        val r = a.joinGroup("g3")
        val (errS, _) = a.syncGroup("g3", r.generation, r.memberId, Map(
          r.memberId -> KafkaWireClient.encodeAssignment("t", 0 until 3)))
        assert(errS == 0)
        // a LeaveGroup + rejoin bumps the generation, stranding gen 1
        a.leaveGroup("g3", r.memberId)
        val r2 = a.joinGroup("g3")
        assert(r2.generation == 2)
        a.syncGroup("g3", 2, r2.memberId, Map(
          r2.memberId -> KafkaWireClient.encodeAssignment("t", 0 until 3)))
        // the zombie (old generation) is fenced with ILLEGAL_GENERATION
        val e1 = intercept[graft.kafka.KafkaCodec.KafkaWireException](
          a.commitOffsetsAs("g3", "t", Map(0 -> 5L), 1, r2.memberId))
        assert(e1.code == 22, s"expected ILLEGAL_GENERATION, got ${e1.code}")
        // an unknown member is fenced with UNKNOWN_MEMBER_ID
        val e2 = intercept[graft.kafka.KafkaCodec.KafkaWireException](
          a.commitOffsetsAs("g3", "t", Map(0 -> 5L), 2, "ghost-1"))
        assert(e2.code == 25, s"expected UNKNOWN_MEMBER_ID, got ${e2.code}")
        // a simple-consumer commit cannot clobber a protocol group
        val e3 = intercept[graft.kafka.KafkaCodec.KafkaWireException](
          a.commitOffsets("g3", "t", Map(0 -> 5L)))
        assert(e3.code == 25, s"expected UNKNOWN_MEMBER_ID, got ${e3.code}")
        // the live member's commit lands and reads back
        a.commitOffsetsAs("g3", "t", Map(0 -> 7L, 1 -> 3L), 2, r2.memberId)
        assert(a.committedOffsets("g3", "t", Seq(0, 1)) == Map(0 -> 7L, 1 -> 3L))
      } finally a.close()
    }
  }

  test("a late joiner flips a Stable group into rebalance: members learn via heartbeat and reconverge at the next generation") {
    withBroker() { broker =>
      val a = new KafkaWireClient("127.0.0.1", broker.port, clientId = "ca")
      val b = new KafkaWireClient("127.0.0.1", broker.port, clientId = "cb")
      try {
        val r1 = a.joinGroup("g4")
        assert(r1.generation == 1 && r1.isLeader)
        a.syncGroup("g4", 1, r1.memberId, Map(
          r1.memberId -> KafkaWireClient.encodeAssignment("t", 0 until 3)))
        assert(a.heartbeat("g4", 1, r1.memberId) == 0)
        // B joins: the group flips to PreparingRebalance; A's next
        // heartbeat says rejoin; both land in generation 2
        @volatile var rB: KafkaWireClient.JoinResult = null
        val tb = new Thread(() => rB = b.joinGroup("g4"))
        tb.start()
        val deadline = System.currentTimeMillis() + 15000
        var hb = 0
        while (hb == 0 && System.currentTimeMillis() < deadline) {
          Thread.sleep(20)
          hb = a.heartbeat("g4", 1, r1.memberId)
        }
        assert(hb == 27, s"expected REBALANCE_IN_PROGRESS, got $hb")
        val r2 = a.joinGroup("g4", memberId = r1.memberId)
        tb.join(15000)
        assert(rB != null, "late joiner never completed its join")
        assert(r2.generation == 2 && rB.generation == 2)
        assert(Set(r2.leaderId) == Set(rB.leaderId))
        // longest-lived member keeps the leadership
        assert(r2.leaderId == r1.memberId)
      } finally { a.close(); b.close() }
    }
  }

  test("two-channel liveness: a slow-PROCESSING member with a background heartbeat survives the session timeout that evicts a silent member") {
    withBroker() { broker =>
      val a = new KafkaWireClient("127.0.0.1", broker.port, clientId = "ca")
      val b = new KafkaWireClient("127.0.0.1", broker.port, clientId = "cb")
      try {
        // both join with a SHORT session (700 ms) — far less than the
        // "processing" sleep below, so without heartbeats both die
        val results = new java.util.concurrent.ConcurrentLinkedQueue[KafkaWireClient.JoinResult]
        val ta = new Thread(() => results.add(a.joinGroup("g5", sessionTimeoutMs = 700)))
        val tb = new Thread(() => { Thread.sleep(10);
          results.add(b.joinGroup("g5", sessionTimeoutMs = 700)) })
        ta.start(); tb.start(); ta.join(15000); tb.join(15000)
        val rs = results.toArray(Array.empty[KafkaWireClient.JoinResult])
        assert(rs.length == 2 && rs.map(_.generation).toSet.size == 1)
        val gen = rs.head.generation
        def clientOf(memberId: String): KafkaWireClient =
          if (memberId.startsWith("ca-")) a else b
        val leader = rs.find(_.isLeader).get
        val assignments = KafkaWireClient.rangeAssign(
          leader.members.map(_._1), 0 until 3).map { case (m, ps) =>
          m -> KafkaWireClient.encodeAssignment("t", ps) }
        val syncs = rs.map { r =>
          new Thread(() => clientOf(r.memberId).syncGroup("g5", gen,
            r.memberId, if (r.isLeader) assignments else Map.empty))
        }
        syncs.foreach(_.start()); syncs.foreach(_.join(15000))
        // A processes slowly but heartbeats from the background
        // thread (150 ms cadence); B processes slowly and is SILENT
        val aId = rs.find(_.memberId.startsWith("ca-")).get.memberId
        val bId = rs.find(_.memberId.startsWith("cb-")).get.memberId
        val hb = new graft.kafka.GroupHeartbeat("127.0.0.1", broker.port,
          "g5", aId, gen, intervalMs = 150)
        try {
          Thread.sleep(2100) // 3x the session timeout: "processing"
          // B is gone: its own heartbeat is fenced as unknown
          val eB = intercept[graft.kafka.KafkaCodec.KafkaWireException](
            b.heartbeat("g5", gen, bId))
          assert(eB.code == 25, s"expected UNKNOWN_MEMBER_ID, got ${eB.code}")
          // A is alive AND was told (on the heartbeat channel) that
          // B's eviction opened a rebalance
          assert(hb.rebalanceSignalled,
            "survivor's heartbeat thread never saw the rebalance signal")
          assert(hb.failure.isEmpty, s"heartbeat thread died: ${hb.failure}")
          val r2 = a.joinGroup("g5", memberId = aId, sessionTimeoutMs = 700)
          assert(r2.generation == gen + 1 && r2.isLeader &&
            r2.members.map(_._1) == Seq(aId),
            s"survivor did not own the next generation: $r2")
          hb.generationIs(r2.generation)
        } finally hb.close()
      } finally { a.close(); b.close() }
    }
  }

  test("a join waiter evicted at its own deadline gets UNKNOWN_MEMBER_ID, not a connection reset; the group stays rejoinable") {
    withBroker() { broker =>
      val a = new KafkaWireClient("127.0.0.1", broker.port, clientId = "ca")
      val b = new KafkaWireClient("127.0.0.1", broker.port, clientId = "cb")
      try {
        // M1 joins alone and never syncs or rejoins (a zombie with a
        // 1.5 s session)
        val r1 = a.joinGroup("g6", sessionTimeoutMs = 1500)
        assert(r1.generation == 1)
        // M2 joins with a SHORTER session: the rebalance barrier waits
        // for M1 (who never rejoins) until M2's own 400 ms deadline.
        // Whether the loop's final evictExpired lands before or after
        // that deadline is an inherent 10 ms race with two
        // protocol-LEGAL outcomes: M2 is itself evicted (answered
        // UNKNOWN_MEMBER_ID) or M2 survives to complete the
        // generation alone with M1 dropped as a straggler. What must
        // NEVER happen is the pre-round-14 third outcome: the
        // completer dropping M1 AND itself, electing a leader from
        // the emptied member map, and the NoSuchElementException
        // resetting the connection (a raw IOException client-side).
        val res =
          try Right(b.joinGroup("g6", sessionTimeoutMs = 400))
          catch { case e: graft.kafka.KafkaCodec.KafkaWireException => Left(e) }
        res match {
          case Left(e) =>
            assert(e.code == 25, s"expected UNKNOWN_MEMBER_ID, got ${e.code}")
          case Right(j) =>
            assert(j.isLeader && j.members.map(_._1) == Seq(j.memberId),
              s"surviving waiter should own the generation alone: $j")
        }
        // either way the group was not corrupted: once the stale
        // sessions lapse, a fresh join completes and leads
        val r2 = b.joinGroup("g6", sessionTimeoutMs = 30000)
        assert(r2.isLeader && r2.members.map(_._1) == Seq(r2.memberId),
          s"group not rejoinable after the evicted-waiter join: $r2")
        assert(r2.generation >= 2)
      } finally { a.close(); b.close() }
    }
  }

  test("group protocol is voted across members: the chosen protocol is one EVERY member offered; a disjoint joiner is rejected with INCONSISTENT_GROUP_PROTOCOL") {
    withBroker() { broker =>
      val ca = new KafkaWireClient("127.0.0.1", broker.port, clientId = "ca")
      val cb = new KafkaWireClient("127.0.0.1", broker.port, clientId = "cb")
      val cc = new KafkaWireClient("127.0.0.1", broker.port, clientId = "cc")
      try {
        // A offers [range, sticky]; B offers only [sticky] — the only
        // protocol every member speaks is "sticky", so the generation
        // must select it no matter which thread completes the barrier
        val results = new java.util.concurrent.ConcurrentLinkedQueue[KafkaWireClient.JoinResult]
        val ta = new Thread(() => results.add(ca.joinGroup("g7",
          protocols = Seq(("range", Array.empty[Byte]), ("sticky", b("ma"))))))
        val tb = new Thread(() => { Thread.sleep(10)
          results.add(cb.joinGroup("g7",
            protocols = Seq(("sticky", b("mb"))))) })
        ta.start(); tb.start(); ta.join(15000); tb.join(15000)
        val rs = results.toArray(Array.empty[KafkaWireClient.JoinResult])
        assert(rs.length == 2 && rs.map(_.generation).toSet.size == 1)
        assert(rs.map(_.protocol).toSet == Set("sticky"),
          s"chosen protocol not in every member's list: ${rs.map(_.protocol).toSeq}")
        // the leader's relayed subscription metadata is the bytes each
        // member attached to the CHOSEN protocol, not its first offer
        val leader = rs.find(_.isLeader).get
        val metas = leader.members.map { case (_, m) =>
          new String(m, java.nio.charset.StandardCharsets.UTF_8) }.sorted
        assert(metas == Seq("ma", "mb"), s"relayed metadata wrong: $metas")
        // C offers only [roundrobin] — no overlap with the group:
        // rejected at admission, the stable pair is undisturbed
        val e = intercept[graft.kafka.KafkaCodec.KafkaWireException](
          cc.joinGroup("g7", protocols = Seq(("roundrobin", Array.empty[Byte]))))
        assert(e.code == 23,
          s"expected INCONSISTENT_GROUP_PROTOCOL, got ${e.code}")
      } finally { ca.close(); cb.close(); cc.close() }
    }
  }
}
