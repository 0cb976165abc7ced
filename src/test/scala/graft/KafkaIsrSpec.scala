package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.kafka.{KafkaClusterClient, KafkaStubCluster, KafkaWireClient}

/** Honest follower replication lag ([[KafkaStubCluster]] with
  * `asyncLagMs`): followers trail the leader and chase via their own
  * replication channel, ISR membership follows the
  * `replica.lag.time.max.ms` eviction rule, shrink and expand are
  * observable through real Metadata responses, produce acks wait for
  * the ISR (a laggard past the grace window is evicted, not waited
  * for), and the consumer-visible high watermark is min-LEO over the
  * ISR — so records an in-grace laggard has not applied are not yet
  * readable, and eviction releases them. The previously-synchronous
  * push mode (`asyncLagMs` = None) is the degenerate case and is
  * covered by KafkaFailoverSpec unchanged.
  */
class KafkaIsrSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def str(a: Array[Byte]): String = new String(a, StandardCharsets.UTF_8)

  private def withAsyncCluster[A](lagMs: Long, rf: Int = 3)(
      f: KafkaStubCluster => A): A = {
    val c = new KafkaStubCluster(nBrokers = 3, numPartitions = 3,
      replicationFactor = rf, asyncLagMs = Some(lagMs))
    c.start()
    try f(c) finally c.stop()
  }

  /** Partition `p`'s ISR as one alive broker's Metadata reports it. */
  private def isrOf(cluster: KafkaStubCluster, topic: String, p: Int): Set[Int] = {
    val broker = cluster.aliveBrokers.head
    val wc = new KafkaWireClient("127.0.0.1", broker.port)
    try wc.metadataFull(Seq(topic)).topics.head.partitions
      .find(_.partition == p).get.isr.toSet
    finally wc.close()
  }

  test("healthy chasers converge: full ISR, every replica holds every acked record") {
    withAsyncCluster(lagMs = 2000) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("lag"))
        (0 until 3).foreach { p =>
          c.produce("lag", p, (0 until 20).map(i => (1L + i, b(s"k$i"), b(s"v$p-$i"))))
        }
        // the ack barrier already waited for the ISR, so every replica
        // is at the leader's LEO the moment produce returns
        (0 until 3).foreach { p =>
          cluster.brokers.foreach { broker =>
            assert(broker.highWatermark("lag", p) == 20L,
              s"broker ${broker.brokerId} partition $p")
          }
          assert(isrOf(cluster, "lag", p) == Set(0, 1, 2))
        }
        assert((0 until 3).forall(cluster.replicationLag(_) == 0))
      } finally c.close()
    }
  }

  test("paused follower is evicted from the ISR; acks and the watermark advance without it") {
    withAsyncCluster(lagMs = 250) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("shrink"))
        (0 until 3).foreach { p =>
          c.produce("shrink", p, Seq((1L, null, b(s"seed-$p"))))
        }
        cluster.pauseReplication(1)
        // partition 0: leader 0, followers 1 (paused) and 2. The ack
        // waits out the grace window for broker 1, evicts it, returns.
        c.produce("shrink", 0, (0 until 10).map(i => (2L + i, null, b(s"x$i"))))
        // shrink is observable via Metadata on the partitions broker 1
        // FOLLOWS and lags on...
        assert(isrOf(cluster, "shrink", 0) == Set(0, 2))
        // ...while the partition broker 1 LEADS keeps its full ISR (its
        // followers' chasers — brokers 2 and 0 — are still running)
        c.produce("shrink", 1, Seq((2L, null, b("y"))))
        assert(isrOf(cluster, "shrink", 1) == Set(0, 1, 2))
        // the evicted laggard does not hold the watermark back: a
        // consumer sees all 11 acked records, while broker 1's log
        // genuinely trails
        val got = c.fetchAll("shrink", 0).map(r => str(r.value))
        assert(got == ("seed-0" +: (0 until 10).map(i => s"x$i")))
        assert(cluster.brokers(1).highWatermark("shrink", 0) < 11L)
        assert(cluster.replicationLag(1) > 0)
      } finally c.close()
    }
  }

  test("resumed follower drains its backlog, re-enters the ISR, and can take leadership with nothing missing") {
    withAsyncCluster(lagMs = 250) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("expand"))
        cluster.pauseReplication(1)
        c.produce("expand", 0, (0 until 15).map(i => (1L + i, null, b(s"r$i"))))
        assert(isrOf(cluster, "expand", 0) == Set(0, 2))
        cluster.resumeReplication(1)
        assert(cluster.awaitCaughtUp(1), "follower 1 did not drain its backlog")
        // expand: caught up -> back in the ISR, log byte-identical LEO
        assert(isrOf(cluster, "expand", 0) == Set(0, 1, 2))
        assert(cluster.brokers(1).highWatermark("expand", 0) ==
          cluster.brokers(0).highWatermark("expand", 0))
        // the chased log is real: kill the leader, the promoted
        // follower serves every acked record
        cluster.failBroker(0)
        assert(cluster.leaderOf(0) == 1)
        val got = c.fetchAll("expand", 0).map(r => str(r.value))
        assert(got == (0 until 15).map(i => s"r$i"))
      } finally c.close()
    }
  }

  test("an already-evicted laggard does not tax later acks with fresh grace windows") {
    withAsyncCluster(lagMs = 2000) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("fast"))
        cluster.pauseReplication(1)
        // first produce pays the one grace window that evicts broker 1
        c.produce("fast", 0, Seq((1L, null, b("first"))))
        assert(isrOf(cluster, "fast", 0) == Set(0, 2))
        // subsequent acks consult the ISR, not a per-batch deadline:
        // five produces that each waited out a fresh 2000ms grace
        // window would take ≥10s; the 1500ms bound discriminates that
        // failure mode while leaving real slack for GC/load (the
        // produces themselves are ~ms round-trips)
        val t0 = System.nanoTime()
        (0 until 5).foreach(i => c.produce("fast", 0, Seq((2L + i, null, b(s"n$i")))))
        val elapsedMs = (System.nanoTime() - t0) / 1000000L
        assert(elapsedMs < 1500,
          s"5 post-eviction produces took ${elapsedMs}ms — waited out grace windows")
        cluster.resumeReplication(1)
        assert(cluster.awaitCaughtUp(1))
      } finally c.close()
    }
  }

  test("a follower that DIES while lagging restarts clean: stale pending applies are dropped, snapshot re-baselines") {
    withAsyncCluster(lagMs = 300) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("die"))
        c.produce("die", 0, (0 until 5).map(i => (1L + i, null, b(s"a$i"))))
        cluster.pauseReplication(1)
        c.produce("die", 0, (0 until 5).map(i => (10L + i, null, b(s"c$i"))))
        assert(cluster.replicationLag(1) > 0)
        // the lagging follower dies with unapplied batches in its
        // channel; the generation-stamped clear must drop them so they
        // can never land on top of the restart snapshot
        cluster.failBroker(1)
        assert(cluster.replicationLag(1) == 0)
        c.produce("die", 0, (0 until 5).map(i => (20L + i, null, b(s"d$i"))))
        cluster.restartBroker(1)
        // snapshot catch-up brought it to the leader's LEO exactly
        assert(cluster.brokers(1).highWatermark("die", 0) ==
          cluster.brokers(0).highWatermark("die", 0))
        // and it resumes live follower duty: new appends chase through
        // the channel again
        c.produce("die", 0, Seq((30L, null, b("post"))))
        assert(cluster.awaitCaughtUp(1))
        assert(cluster.brokers(1).highWatermark("die", 0) == 16L)
        assert(isrOf(cluster, "die", 0) == Set(0, 1, 2))
        val got = c.fetchAll("die", 0).map(r => str(r.value))
        assert(got == ((0 until 5).map(i => s"a$i") ++ (0 until 5).map(i => s"c$i") ++
          (0 until 5).map(i => s"d$i") :+ "post"))
      } finally c.close()
    }
  }

  test("concurrent producers under pause/resume churn: replicas converge byte-identical") {
    withAsyncCluster(lagMs = 150) { cluster =>
      val clients = (0 until 3).map(_ =>
        new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort))
      try {
        clients.head.metadata(Seq("churn"))
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
        val producers = clients.zipWithIndex.map { case (cl, t) =>
          new Thread(() => try {
            (0 until 40).foreach { i =>
              cl.produce("churn", (t + i) % 3, Seq((1L + i, b(s"t$t"), b(s"t$t-i$i"))))
            }
          } catch { case e: Throwable => errs.add(e) })
        }
        val churn = new Thread(() => (0 until 6).foreach { i =>
          cluster.pauseReplication(1); Thread.sleep(40)
          cluster.resumeReplication(1); Thread.sleep(20)
        })
        (producers :+ churn).foreach(_.start())
        (producers :+ churn).foreach(_.join(30000))
        assert(errs.isEmpty, s"producer errors: ${errs.peek()}")
        (0 until 3).foreach(id => assert(cluster.awaitCaughtUp(id)))
        // every replica of every partition converged to the same log:
        // same length, and the same multiset of values via the leader
        (0 until 3).foreach { p =>
          val leo = cluster.brokers.map(_.highWatermark("churn", p)).toSet
          assert(leo.size == 1, s"partition $p replica LEOs diverged: $leo")
        }
        val all = (0 until 3).flatMap(p =>
          clients.head.fetchAll("churn", p).map(r => str(r.value)))
        assert(all.size == 120 && all.toSet.size == 120)
      } finally clients.foreach(_.close())
    }
  }

  test("transactions compose with lag: markers chase through the channel, a promoted laggard keeps read_committed honest") {
    withAsyncCluster(lagMs = 250) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("txn"))
        // COMMITTED txn whose data AND commit marker replicate while
        // follower 1 is paused (both ride the same channel FIFO)
        val (pid, ep) = c.initProducerId("isr-txn")
        c.addPartitionsToTxn("isr-txn", pid, ep, "txn", Seq(0))
        cluster.pauseReplication(1)
        c.produce("txn", 0, Seq((1L, b("k1"), b("c1")), (2L, b("k2"), b("c2"))),
          gzip = false, pid, ep, 0, transactionalId = "isr-txn")
        c.endTxn("isr-txn", pid, ep, commit = true)
        // the evicted laggard holds back neither the ack nor the LSO
        assert(c.fetchAll("txn", 0, readCommitted = true).map(r => str(r.value))
          == Seq("c1", "c2"))
        assert(cluster.brokers(1).highWatermark("txn", 0) < 3L)
        // ABORTED txn, same lag window: the abort marker and its
        // aborted-range bookkeeping must also chase correctly
        val (pid2, ep2) = c.initProducerId("isr-txn2")
        c.addPartitionsToTxn("isr-txn2", pid2, ep2, "txn", Seq(0))
        c.produce("txn", 0, Seq((3L, b("k3"), b("dead"))),
          gzip = false, pid2, ep2, 0, transactionalId = "isr-txn2")
        c.endTxn("isr-txn2", pid2, ep2, commit = false)
        cluster.resumeReplication(1)
        assert(cluster.awaitCaughtUp(1))
        // the chased follower holds data + both markers (LEO equal)...
        assert(cluster.brokers(1).highWatermark("txn", 0) ==
          cluster.brokers(0).highWatermark("txn", 0))
        // ...and after promotion its REBUILT transaction state serves
        // the same read_committed view: committed rows only, the
        // aborted record skipped via the replicated abort marker
        cluster.failBroker(0)
        assert(cluster.leaderOf(0) == 1)
        assert(c.fetchAll("txn", 0, readCommitted = true).map(r => str(r.value))
          == Seq("c1", "c2"))
        assert(c.fetchAll("txn", 0).map(r => str(r.value))
          == Seq("c1", "c2", "dead"))
      } finally c.close()
    }
  }

  test("leader death promotes the IN-SYNC replica, never the evicted laggard; the laggard is re-baselined to the new leader") {
    withAsyncCluster(lagMs = 300) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("clean"))
        cluster.pauseReplication(1)
        // two produces past grace: broker 1 is evicted with ACKED
        // records sitting unapplied in its channel (head + queue)
        c.produce("clean", 0, (0 until 5).map(i => (1L + i, null, b(s"a$i"))))
        c.produce("clean", 0, (0 until 5).map(i => (10L + i, null, b(s"b$i"))))
        assert(isrOf(cluster, "clean", 0) == Set(0, 2))
        // kill the leader: promotion must skip the laggard (its log is
        // missing acked records) and pick the in-sync broker 2
        cluster.failBroker(0)
        assert(cluster.leaderOf(0) == 2,
          s"promoted ${cluster.leaderOf(0)} — an evicted laggard led")
        // epoch truncation re-baselined the laggard to the new leader's
        // log (snapshot install works even while its chaser is paused),
        // and purged its stale backlog so nothing can land on top later
        assert(cluster.brokers(1).highWatermark("clean", 0) ==
          cluster.brokers(2).highWatermark("clean", 0))
        cluster.resumeReplication(1)
        assert(cluster.awaitCaughtUp(1), "purged backlog never settled")
        // the new leader serves every acked record, and fresh appends
        // replicate to the re-baselined follower without divergence
        c.produce("clean", 0, Seq((20L, null, b("post"))))
        assert(cluster.awaitCaughtUp(1))
        val got = c.fetchAll("clean", 0).map(r => str(r.value))
        assert(got == ((0 until 5).map(i => s"a$i") ++
          (0 until 5).map(i => s"b$i") :+ "post"))
        assert(cluster.brokers(1).highWatermark("clean", 0) == 11L)
      } finally c.close()
    }
  }

  test("rolling restart + preferred election: leadership returns to the preferred replicas with zero acked-record loss") {
    withAsyncCluster(lagMs = 2000) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("roll"))
        (0 until 3).foreach { p =>
          c.produce("roll", p, (0 until 10).map(i => (1L + i, null, b(s"pre$p-$i"))))
        }
        // full rolling restart, one broker at a time: each fail moves
        // that broker's leaderships; each restart catches up but does
        // NOT move leadership back
        (0 until 3).foreach { id =>
          cluster.failBroker(id)
          cluster.restartBroker(id)
          assert(cluster.awaitCaughtUp(id), s"broker $id never caught up")
          // the periodic refresh a real client runs between roll steps
          // (metadata.max.age.ms): restarted brokers re-bind on fresh
          // ports, so a client that never refreshed mid-roll would age
          // out its entire endpoint set
          c.metadata(Seq("roll"))
        }
        // the roll leaves placement skewed: promotion is preferred-first
        // among survivors, so p0/p1 drift home but p2's preferred
        // replica was freshly restarted when broker 2 died — broker 0
        // still leads it
        assert(cluster.leaderOf(2) != 2, "test premise: roll must skew placement")
        val epochBefore = cluster.leaderEpoch(2)
        // records acked AFTER the roll, before the election
        (0 until 3).foreach { p =>
          c.produce("roll", p, Seq((100L, null, b(s"mid$p"))))
        }
        cluster.electPreferredLeaders()
        // every partition's leadership is home, with a bumped epoch on
        // the moved one only
        (0 until 3).foreach(p => assert(cluster.leaderOf(p) == p,
          s"partition $p led by ${cluster.leaderOf(p)} after preferred election"))
        assert(cluster.leaderEpoch(2) == epochBefore + 1)
        // zero acked-record loss: every pre-roll and mid-roll record is
        // served by the restored leaders, and a fresh produce lands +
        // replicates cleanly under the new epoch
        (0 until 3).foreach { p =>
          c.produce("roll", p, Seq((200L, null, b(s"post$p"))))
          val got = c.fetchAll("roll", p).map(r => str(r.value))
          assert(got == ((0 until 10).map(i => s"pre$p-$i") :+ s"mid$p" :+ s"post$p"),
            s"partition $p: $got")
        }
        assert((0 until 3).forall(cluster.awaitCaughtUp(_)))
        // idempotent: a second trigger with placement already preferred
        // is a no-op (no epoch churn)
        val epochs = (0 until 3).map(cluster.leaderEpoch)
        cluster.electPreferredLeaders()
        assert((0 until 3).map(cluster.leaderEpoch) == epochs)
      } finally c.close()
    }
  }

  test("no in-sync replica to promote: failBroker refuses the unclean election loudly, and recovers once the laggard chases") {
    // rf=2: partition 0 lives on brokers {0, 1} only — evicting broker
    // 1 leaves the leader with no in-sync follower at all
    withAsyncCluster(lagMs = 300, rf = 2) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("unclean"))
        cluster.pauseReplication(1)
        c.produce("unclean", 0, (0 until 5).map(i => (1L + i, null, b(s"v$i"))))
        assert(isrOf(cluster, "unclean", 0) == Set(0))
        // promoting broker 1 now would lose the five acked records its
        // channel still holds — the election must be refused, loudly,
        // with the cluster left untouched
        val e = intercept[IllegalStateException](cluster.failBroker(0))
        assert(e.getMessage.contains("unclean"), e.getMessage)
        assert(cluster.isAlive(0) && cluster.leaderOf(0) == 0,
          "refused election must leave the cluster untouched")
        // once the laggard chases back into the ISR, the same failover
        // is clean and loses nothing
        cluster.resumeReplication(1)
        assert(cluster.awaitCaughtUp(1))
        cluster.failBroker(0)
        assert(cluster.leaderOf(0) == 1)
        val got = c.fetchAll("unclean", 0).map(r => str(r.value))
        assert(got == (0 until 5).map(i => s"v$i"))
      } finally c.close()
    }
  }

  test("in-grace lag holds the consumer-visible watermark back; eviction releases it") {
    // the grace window doubles as the margin for the mid-grace fetch
    // below — 5s keeps a loaded box or GC pause from expiring the
    // window before the in-grace observation completes
    withAsyncCluster(lagMs = 5000) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("hw"))
        c.produce("hw", 0, (0 until 4).map(i => (1L + i, null, b(s"old$i"))))
        cluster.pauseReplication(1)
        // produce blocks on the ISR barrier for ~lagMs (broker 1 is in
        // grace); run it on its own thread and observe mid-grace
        val producer = new Thread(() =>
          c.produce("hw", 0, (0 until 3).map(i => (10L + i, null, b(s"new$i")))))
        producer.start()
        // wait until the leader has LOCALLY appended the new batch
        val deadline = System.nanoTime() + 5000000000L
        while (cluster.brokers(0).highWatermark("hw", 0) < 7L &&
            System.nanoTime() < deadline) Thread.sleep(1)
        assert(cluster.brokers(0).highWatermark("hw", 0) == 7L,
          "leader never appended the in-flight batch")
        // mid-grace: broker 1 is still IN the ISR (not yet past the
        // window), so the visible watermark stops at its LEO — a
        // second consumer connection sees only the old records
        val mid = new KafkaWireClient("127.0.0.1", cluster.brokers(0).port)
        val midGot = try mid.fetchAll("hw", 0).map(r => str(r.value))
          finally mid.close()
        assert(midGot == (0 until 4).map(i => s"old$i"),
          s"in-grace records leaked to a consumer: $midGot")
        producer.join(10000)
        assert(!producer.isAlive, "produce never returned after grace expiry")
        // evicted: the watermark is released without the laggard
        val after = c.fetchAll("hw", 0).map(r => str(r.value))
        assert(after == ((0 until 4).map(i => s"old$i") ++ (0 until 3).map(i => s"new$i")))
        cluster.resumeReplication(1)
        assert(cluster.awaitCaughtUp(1))
        assert(isrOf(cluster, "hw", 0) == Set(0, 1, 2))
      } finally c.close()
    }
  }

  test("restart catch-up chases a LIVE leader: continuous produce through kill+restart loses no acked record; rejoined replica re-enters the ISR and survives promotion") {
    // rf=2: partition 0 lives on {0, 1} only, so broker 1's death and
    // rejoin are fully observable through partition 0's ISR
    withAsyncCluster(lagMs = 2000, rf = 2) { cluster =>
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort)
      try {
        c.metadata(Seq("live"))
        c.produce("live", 0, (0 until 50).map(i => (1L + i, null, b(s"v$i"))))
        val leader = cluster.leaderOf(0)
        val follower = cluster.replicasOf(0).find(_ != leader).get
        cluster.failBroker(follower)
        assert(isrOf(cluster, "live", 0) == Set(leader))
        // produce CONTINUOUSLY through the whole dead→restart→chase
        // window — the property under test is that no acked record is
        // lost even though the leader never quiesces
        @volatile var stop = false
        @volatile var acked = 50
        @volatile var err: Throwable = null
        val producer = new Thread(() => {
          try {
            var i = 50
            while (!stop) {
              c.produce("live", 0, Seq((1L + i, null, b(s"v$i"))))
              acked = i + 1
              i += 1
            }
          } catch { case t: Throwable => err = t }
        })
        producer.start()
        Thread.sleep(80) // acked appends while the follower is dead
        cluster.restartBroker(follower) // catch-up races live produce
        Thread.sleep(80) // acked appends during/after catch-up
        stop = true
        producer.join(10000)
        assert(err == null, s"producer failed: $err")
        val ackedAtStop = acked
        assert(ackedAtStop > 60, "producer made no progress through the restart")
        // the rejoined replica drains its backlog and holds EVERY acked
        // record — snapshot point + live channel covered the whole log
        assert(cluster.awaitCaughtUp(follower, 10000))
        assert(cluster.brokerAt(follower).highWatermark("live", 0) ==
          cluster.brokerAt(leader).highWatermark("live", 0))
        assert(cluster.brokerAt(follower).highWatermark("live", 0) >= ackedAtStop)
        // ISR re-entry under the replica.lag.time rule (caught up ⇒ no
        // pending batch older than grace ⇒ in-sync)
        assert(isrOf(cluster, "live", 0) == Set(leader, follower),
          "caught-up rejoined replica missing from the ISR")
        // re-kill the OTHER replica: promotion lands on the restarted
        // broker, which must serve the complete acked history
        cluster.failBroker(leader)
        assert(cluster.leaderOf(0) == follower,
          s"expected promotion onto restarted broker $follower")
        val got = c.fetchAll("live", 0).map(r => str(r.value))
        assert(got.size >= ackedAtStop, s"${got.size} < acked $ackedAtStop")
        assert(got == got.indices.map(i => s"v$i"),
          "promoted restarted replica serves a gap or reorder")
      } finally c.close()
    }
  }
}
