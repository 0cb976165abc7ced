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
  * Leadership in [[KafkaStubCluster]] is static (no failover —
  * COVERAGE.md non-goals), so the stale-leader
  * NOT_LEADER_FOR_PARTITION → refresh-metadata → re-route loop is
  * unreachable from a correctly-routed client; the error surface
  * itself is pinned broker-side in KafkaClusterSpec by addressing the
  * wrong broker directly.
  *
  * Not thread-safe: one instance per task/thread, like the
  * single-broker client.
  */
final class KafkaClusterClient(bootstrapHost: String, bootstrapPort: Int,
    clientId: String = "graft",
    sasl: Option[KafkaWireClient.SaslPlain] = None) extends KafkaOffsetClient {

  private val clients =
    scala.collection.mutable.Map.empty[(String, Int), KafkaWireClient]
  private var leaders = Map.empty[(String, Int), (String, Int)]

  // every broker connection authenticates with the same credentials —
  // the real client's model (one jaas config per client, N sockets)
  private def clientAt(host: String, port: Int): KafkaWireClient =
    clients.getOrElseUpdate((host, port),
      new KafkaWireClient(host, port, clientId, sasl))

  private def bootstrap: KafkaWireClient =
    clientAt(bootstrapHost, bootstrapPort)

  /** Fetch metadata for `topics` from the bootstrap broker and refresh
    * the leader map.
    */
  def refreshMetadata(topics: Seq[String]): ClusterMeta = {
    val m = bootstrap.metadataFull(topics)
    val byId = m.brokers.map(b => b.nodeId -> ((b.host, b.port))).toMap
    leaders ++= (for (t <- m.topics; p <- t.partitions)
      yield (t.topic, p.partition) -> byId(p.leader))
    m
  }

  /** The endpoint leading (topic, partition), refreshing metadata on a
    * cache miss.
    */
  def leaderFor(topic: String, partition: Int): (String, Int) =
    leaders.getOrElse((topic, partition), {
      refreshMetadata(Seq(topic))
      leaders((topic, partition))
    })

  private def onLeader[A](topic: String, partition: Int)(
      f: KafkaWireClient => A): A = {
    val (h, p) = leaderFor(topic, partition)
    f(clientAt(h, p))
  }

  private def coordinator(key: String): KafkaWireClient = {
    val (_, h, p) = bootstrap.findCoordinator(key)
    clientAt(h, p)
  }

  override def metadata(topics: Seq[String]): Seq[TopicMeta] =
    refreshMetadata(topics).topics

  override def allTopics(): Seq[String] = bootstrap.allTopics()

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

  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 4 * 1024 * 1024,
      readCommitted: Boolean = false): KafkaWireClient.FetchResult =
    onLeader(topic, partition)(
      _.fetch(topic, partition, offset, maxBytes, readCommitted))

  def fetchAll(topic: String, partition: Int, offset: Long = 0L,
      readCommitted: Boolean = false): Seq[KafkaCodec.WireRecord] =
    onLeader(topic, partition)(
      _.fetchAll(topic, partition, offset, readCommitted))

  /** InitProducerId: transactional handshakes go to the id's
    * COORDINATOR (fencing state lives there); plain idempotent pid
    * allocation is served by any broker.
    */
  def initProducerId(transactionalId: String = null): (Long, Short) =
    if (transactionalId == null) bootstrap.initProducerId()
    else coordinator(transactionalId).initProducerId(transactionalId)

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
    coordinator(group).commitOffsets(group, topic, offsets, metadata, generation)

  override def committedOffsets(group: String, topic: String,
      partitions: Seq[Int]): Map[Int, Long] =
    coordinator(group).committedOffsets(group, topic, partitions)

  /** Per-partition lag: committed (coordinator) vs log end (leaders). */
  def groupLag(group: String, topic: String,
      partitions: Seq[Int]): Seq[(Int, Long, Long, Long)] = {
    val committed = committedOffsets(group, topic, partitions)
    partitions.sorted.map { p =>
      val c = committed.getOrElse(p, 0L)
      val end = listOffset(topic, p, -1L)
      (p, c, end, math.max(0L, end - c))
    }
  }

  override def close(): Unit = {
    clients.values.foreach(c => try c.close() catch { case _: Exception => () })
    clients.clear()
  }
}
