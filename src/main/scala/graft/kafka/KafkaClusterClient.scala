package graft.kafka

import KafkaWireClient.{ClusterMeta, TopicMeta}

/** Leader/coordinator-routing Kafka client over a MULTI-BROKER cluster:
  * one bootstrap endpoint, a metadata-derived leader map, and one
  * [[KafkaWireClient]] socket per broker actually talked to. Every
  * data-path call (produce / fetch / ListOffsets) lands on the
  * partition's LEADER and every group/transaction call on its
  * COORDINATOR (FindCoordinator) — the routing that makes aggregate
  * bandwidth scale with the broker count instead of funneling through
  * one endpoint, and exactly what the real client library does behind
  * `bootstrap.servers`.
  *
  * Leadership is DYNAMIC: a dead socket or a NOT_LEADER_FOR_PARTITION
  * answer triggers the refresh-metadata → re-route retry loop
  * ([[onLeader]]), and coordinator calls re-discover via
  * FindCoordinator the same way ([[onCoordinator]]) — the failover
  * behavior KafkaFailoverSpec drives end to end against
  * [[KafkaStubCluster.failBroker]]. Mid-transaction RPCs
  * (AddPartitionsToTxn / EndTxn) deliberately do NOT retry across a
  * coordinator loss: the OUTCOME of an interrupted EndTxn is
  * ambiguous at the client (markers may or may not have been
  * written), so the in-flight transaction fails loudly and the
  * producer restarts via [[initProducerId]] — which DOES retry to the
  * successor, where the mirrored txn state aborts whatever the old
  * epoch left open and fences it (the real producer's
  * abortable-then-restartable contract).
  *
  * Not thread-safe: one instance per task/thread, like the
  * single-broker client.
  */
final class KafkaClusterClient(bootstrapHost: String, bootstrapPort: Int,
    clientId: String = "graft",
    sasl: Option[KafkaWireClient.SaslPlain] = None,
    extraBootstrap: Seq[(String, Int)] = Nil,
    tls: Option[Tls.ClientTls] = None) extends KafkaOffsetClient {

  private val clients =
    scala.collection.mutable.Map.empty[(String, Int), KafkaWireClient]
  private var leaders = Map.empty[(String, Int), (String, Int)]
  // every endpoint this client has ever learned (the bootstrap LIST +
  // metadata broker lists): after one metadata refresh, losing the
  // first bootstrap broker no longer strands the client — any survivor
  // serves metadata. `extraBootstrap` carries the rest of a
  // comma-separated bootstrap.servers list, the stock safety net for a
  // FRESH client whose first endpoint is already down.
  private val seedEndpoints: Vector[(String, Int)] =
    (Vector((bootstrapHost, bootstrapPort)) ++ extraBootstrap).distinct
  private var knownEndpoints: Vector[(String, Int)] = seedEndpoints

  // every broker connection authenticates with the same credentials —
  // the real client's model (one jaas config per client, N sockets) —
  // and, under SSL/SASL_SSL, TLS-wraps with the same truststore
  private def clientAt(host: String, port: Int): KafkaWireClient =
    clients.getOrElseUpdate((host, port),
      new KafkaWireClient(host, port, clientId, sasl, tls = tls))

  /** Forget (and close) a connection after an I/O failure, so the next
    * call re-dials instead of reusing a dead socket.
    */
  private def dropClient(endpoint: (String, Int)): Unit =
    clients.remove(endpoint).foreach(c =>
      try c.close() catch { case _: Exception => () })

  /** Run `f` against the first REACHABLE known endpoint (metadata-class
    * calls — any alive broker can answer them). Dead endpoints are
    * skipped after their connect/request fails; all-dead rethrows the
    * last failure.
    */
  private def anyReachable[A](f: KafkaWireClient => A): A = {
    var last: Throwable = null
    knownEndpoints.foreach { ep =>
      try return f(clientAt(ep._1, ep._2))
      catch {
        case e: java.io.IOException => dropClient(ep); last = e
      }
    }
    throw last
  }

  /** Fetch metadata for `topics` from any reachable broker; refresh the
    * leader map and the known-endpoint list (bootstrap first, then the
    * returned ALIVE brokers — a failed broker drops out of broker
    * lists, so it ages out of the dial order after one refresh).
    */
  def refreshMetadata(topics: Seq[String]): ClusterMeta = {
    val m = anyReachable(_.metadataFull(topics))
    val byId = m.brokers.map(b => b.nodeId -> ((b.host, b.port))).toMap
    // a leader id absent from the broker list is a mid-failover
    // snapshot (the broker just died and promotion is racing this
    // refresh): skip the entry — the stale/absent cache route fails
    // the next call, which refreshes again and sees the promoted map
    leaders ++= (for {
      t <- m.topics
      p <- t.partitions
      ep <- byId.get(p.leader)
    } yield (t.topic, p.partition) -> ep)
    // dial order: live brokers from THIS refresh first, configured
    // seeds as the fallback — a dead seed must not tax every future
    // metadata call with a failed connect
    knownEndpoints =
      (m.brokers.map(b => (b.host, b.port)).toVector ++ seedEndpoints).distinct
    m
  }

  /** The endpoint leading (topic, partition), refreshing metadata on a
    * cache miss — retried, because one refresh can catch a
    * mid-failover snapshot whose leader entry was skipped above.
    */
  def leaderFor(topic: String, partition: Int): (String, Int) = {
    var attempt = 0
    while (!leaders.contains((topic, partition)) && attempt < 4) {
      refreshMetadata(Seq(topic))
      attempt += 1
    }
    leaders.getOrElse((topic, partition), throw new IllegalStateException(
      s"no leader resolvable for $topic/$partition after $attempt refreshes"))
  }

  /** Route a data call to the partition's leader, surviving failover:
    * a dead socket (the leader crashed mid-session) or a
    * NOT_LEADER_FOR_PARTITION answer (leadership moved) drops the
    * cached route, refreshes metadata from any survivor, and retries
    * against the promoted leader — the standard client loop. Delivery
    * on the retried path is at-least-once (the lost request may have
    * been applied before the socket died); idempotent/transactional
    * producers fence the duplicate, exactly the real contract.
    */
  private def onLeader[A](topic: String, partition: Int)(
      f: KafkaWireClient => A): A = {
    val maxAttempts = 4
    var attempt = 1
    while (true) {
      val ep = leaderFor(topic, partition)
      try return f(clientAt(ep._1, ep._2))
      catch {
        case e @ (_: java.io.IOException | _: KafkaCodec.KafkaWireException)
            if attempt < maxAttempts &&
              (e match {
                case w: KafkaCodec.KafkaWireException => w.retriable
                case _ => true
              }) =>
          // a dead SOCKET is dropped; a NOT_LEADER answer came over a
          // healthy connection — keep it (the broker is alive, just
          // not the leader; a real client re-routes without re-dialing
          // or re-running SASL)
          if (e.isInstanceOf[java.io.IOException]) dropClient(ep)
          leaders -= ((topic, partition))
          refreshMetadata(Seq(topic))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def coordinator(key: String): KafkaWireClient = {
    val (_, h, p) = anyReachable(_.findCoordinator(key))
    clientAt(h, p)
  }

  /** Coordinator calls survive failover the same way data calls do:
    * re-discover via FindCoordinator (which any survivor answers) and
    * retry on the successor, which holds the mirrored offset state.
    */
  private def onCoordinator[A](key: String)(f: KafkaWireClient => A): A = {
    val maxAttempts = 4
    var attempt = 1
    while (true) {
      val (_, h, p) = anyReachable(_.findCoordinator(key))
      val ep = (h, p)
      try return f(clientAt(h, p))
      catch {
        case e @ (_: java.io.IOException | _: KafkaCodec.KafkaWireException)
            if attempt < maxAttempts &&
              (e match {
                case w: KafkaCodec.KafkaWireException => w.retriable
                case _ => true
              }) =>
          // only the COORDINATOR's socket failed — drop exactly that
          // one; tearing down healthy authenticated leader connections
          // would force every partition to re-dial + re-SASL for no
          // recovery benefit
          if (e.isInstanceOf[java.io.IOException]) dropClient(ep)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def metadata(topics: Seq[String]): Seq[TopicMeta] =
    refreshMetadata(topics).topics

  override def allTopics(): Seq[String] = anyReachable(_.allTopics())

  override def listOffset(topic: String, partition: Int, timestamp: Long): Long =
    onLeader(topic, partition)(_.listOffset(topic, partition, timestamp))

  override def lastStableOffset(topic: String, partition: Int): Long =
    onLeader(topic, partition)(_.lastStableOffset(topic, partition))

  def produce(topic: String, partition: Int,
      records: Seq[(Long, Array[Byte], Array[Byte])],
      gzip: Boolean = false,
      producerId: Long = -1L,
      producerEpoch: Short = -1,
      baseSequence: Int = -1,
      transactionalId: String = null): Long =
    onLeader(topic, partition)(_.produce(topic, partition, records, gzip,
      producerId, producerEpoch, baseSequence, transactionalId))

  /** Seed the leader cache with a planner-provided hint: the common
    * path then skips the metadata round trip entirely, and a WRONG
    * hint (leadership moved after planning) self-corrects through the
    * normal NOT_LEADER / dead-socket retry loop.
    */
  def assumeLeader(topic: String, partition: Int, host: String,
      port: Int): Unit =
    leaders += ((topic, partition) -> ((host, port)))

  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 4 * 1024 * 1024,
      readCommitted: Boolean = false): KafkaWireClient.FetchResult =
    onLeader(topic, partition) { c =>
      val r = c.fetch(topic, partition, offset, maxBytes, readCommitted)
      // a stale-leader answer arrives as a RESULT code, not an
      // exception — surface it as the retriable error so the routing
      // loop refreshes and re-routes instead of handing the caller a
      // dead end
      if (r.errorCode == KafkaCodec.Err.NotLeaderForPartition)
        throw new KafkaCodec.KafkaWireException(r.errorCode,
          s"fetch error ${r.errorCode} on $topic/$partition@$offset (stale leader)")
      r
    }

  def fetchAll(topic: String, partition: Int, offset: Long = 0L,
      readCommitted: Boolean = false): Seq[KafkaCodec.WireRecord] =
    onLeader(topic, partition)(
      _.fetchAll(topic, partition, offset, readCommitted))

  /** InitProducerId: transactional handshakes go to the id's
    * COORDINATOR (fencing state lives there); plain idempotent pid
    * allocation is served by any broker.
    */
  def initProducerId(transactionalId: String = null): (Long, Short) =
    if (transactionalId == null) anyReachable(_.initProducerId())
    else onCoordinator(transactionalId)(_.initProducerId(transactionalId))

  def addPartitionsToTxn(transactionalId: String, pid: Long, epoch: Short,
      topic: String, partitions: Seq[Int]): Unit =
    coordinator(transactionalId)
      .addPartitionsToTxn(transactionalId, pid, epoch, topic, partitions)

  def endTxn(transactionalId: String, pid: Long, epoch: Short,
      commit: Boolean): Unit =
    coordinator(transactionalId).endTxn(transactionalId, pid, epoch, commit)

  override def commitOffsets(group: String, topic: String,
      offsets: Map[Int, Long], metadata: String = null,
      generation: Int = -1): Unit =
    onCoordinator(group)(
      _.commitOffsets(group, topic, offsets, metadata, generation))

  override def committedOffsets(group: String, topic: String,
      partitions: Seq[Int]): Map[Int, Long] =
    onCoordinator(group)(_.committedOffsets(group, topic, partitions))

  override def close(): Unit = {
    clients.values.foreach(c => try c.close() catch { case _: Exception => () })
    clients.clear()
  }
}
