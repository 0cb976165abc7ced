package graft.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import KafkaCodec._

/** In-process Kafka broker speaking the real binary protocol over TCP —
  * the test-double for S5/K2's executed path, mirroring round 7's
  * [[graft.streaming.EsStub]] playbook: no external jar, but the bytes
  * on the socket are the ones a real broker would accept/emit.
  *
  * Speaks (non-flexible versions, header v1 in / v0 out):
  *   - ApiVersions v0
  *   - Metadata v1 (auto-creates topics with [[numPartitions]])
  *   - Produce v3 (record batch v2, CRC-checked on ingest)
  *   - Fetch v4 (earliest..high-watermark, OFFSET_OUT_OF_RANGE beyond)
  *   - ListOffsets v1 (-2 earliest / -1 latest)
  *
  * Offset semantics enforced (what `spark_streaming_kafka.py:13-18`'s
  * `startingOffsets=earliest` consumer depends on):
  *   - produce appends atomically per partition; base offset = log end
  *   - offsets are dense and immutable once assigned
  *   - fetch(o) returns [o, hw); fetch(hw) is empty-not-error;
  *     fetch(>hw) errors OFFSET_OUT_OF_RANGE
  *
  * `compressionType` models the broker-side `compression.type` topic
  * config: `"gzip"` re-encodes every fetch response batch with the
  * gzip codec bits (consumers must inflate), `"none"` (default) sends
  * plain batches. Produce accepts either codec regardless — the log
  * stores decoded records, so this stub always recompresses on fetch
  * rather than keeping producer batches byte-identical (a real broker
  * with `compression.type=producer` would; documented divergence,
  * irrelevant to consumers, which see only records).
  */
final class KafkaStubBroker(val numPartitions: Int = 3,
    val compressionType: String = "none") {
  require(compressionType == "none" || compressionType == "gzip",
    s"unsupported compression.type '$compressionType' (none|gzip)")
  private val fetchGzip = compressionType == "gzip"

  private final case class StoredRecord(
      offset: Long, timestampMs: Long, key: Array[Byte], value: Array[Byte])

  // partition log: append-only; all access synchronized on the buffer
  private val logs = new ConcurrentHashMap[(String, Int), ArrayBuffer[StoredRecord]]()

  // KIP-98 idempotence: PID allocation (InitProducerId) plus per
  // (topic, partition, pid) producer state — the last 5 accepted batch
  // sequence ranges with their assigned base offsets, exactly the
  // window a real broker's ProducerStateManager keeps. A duplicate
  // range re-acks the original offset WITHOUT appending; a sequence
  // gap fails with OUT_OF_ORDER_SEQUENCE_NUMBER.
  private val nextPid = new java.util.concurrent.atomic.AtomicLong(1000L)
  private final case class SeqRange(baseSeq: Int, count: Int, baseOffset: Long)
  private val producerState =
    new ConcurrentHashMap[(String, Int, Long), List[SeqRange]]()
  private val running = new AtomicBoolean(false)
  @volatile private var server: ServerSocket = _
  @volatile private var acceptor: Thread = _

  /** Total produce requests served (test hook, chunking assertions). */
  val produceRequests = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Producer sessions handed out by InitProducerId (test hook). */
  def producersInitialized: Long = nextPid.get() - 1000L

  def port: Int = server.getLocalPort
  def bootstrap: String = s"127.0.0.1:$port"

  def start(): Unit = {
    server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    running.set(true)
    acceptor = daemon("kafka-stub-accept") {
      while (running.get()) {
        try {
          val sock = server.accept()
          daemon(s"kafka-stub-conn-${sock.getPort}")(serve(sock)).start()
        } catch { case _: Exception if !running.get() => /* closing */ }
      }
    }
    acceptor.start()
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  /** Partition high watermark (test hook). */
  def highWatermark(topic: String, partition: Int): Long = {
    val log = logs.get((topic, partition))
    if (log == null) 0L else log.synchronized(log.length.toLong)
  }

  def topics: Set[String] = logs.keySet.asScala.map(_._1).toSet

  private def daemon(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => body, name)
    t.setDaemon(true)
    t
  }

  private def logFor(topic: String, partition: Int): ArrayBuffer[StoredRecord] =
    logs.computeIfAbsent((topic, partition), _ => new ArrayBuffer[StoredRecord]())

  private def serve(sock: Socket): Unit = {
    try {
      // mirror the client's TCP_NODELAY: without it the kernel's
      // Nagle/delayed-ACK interaction stalls each request-response
      // round-trip ~40ms, which dominates a multi-hundred-round-trip
      // produce/fetch session
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (running.get()) {
        val size = in.readInt()
        val req = new Array[Byte](size)
        in.readFully(req)
        val buf = ByteBuffer.wrap(req)
        val apiKey = buf.getShort.toInt
        val apiVersion = buf.getShort.toInt
        val correlationId = buf.getInt
        readNullableString(buf) // client_id
        val body = apiKey match {
          case Api.ApiVersions => apiVersionsResponse()
          case Api.Metadata    => metadataResponse(buf)
          case Api.Produce     => produceResponse(buf)
          case Api.Fetch       => fetchResponse(buf)
          case Api.ListOffsets => listOffsetsResponse(buf)
          case Api.InitProducerId => initProducerIdResponse(buf)
          case other =>
            throw new IllegalArgumentException(s"unsupported api key $other v$apiVersion")
        }
        out.writeInt(4 + body.length)
        out.writeInt(correlationId)
        out.write(body)
        out.flush()
      }
    } catch {
      case _: java.io.EOFException => // client closed
      case _: java.net.SocketException => // client/server closed
      case e: Exception =>
        System.err.println(s"[KafkaStub] ${e.getClass.getName}: ${e.getMessage}")
    } finally sock.close()
  }

  private def apiVersionsResponse(): Array[Byte] = {
    val apis = Seq(
      (Api.Produce, 3, 3), (Api.Fetch, 4, 4), (Api.ListOffsets, 1, 1),
      (Api.Metadata, 1, 1), (Api.ApiVersions, 0, 0),
      (Api.InitProducerId, 0, 0))
    val buf = ByteBuffer.allocate(2 + 4 + apis.size * 6)
    buf.putShort(Err.None.toShort)
    buf.putInt(apis.size)
    apis.foreach { case (k, lo, hi) =>
      buf.putShort(k.toShort); buf.putShort(lo.toShort); buf.putShort(hi.toShort)
    }
    buf.array()
  }

  private def metadataResponse(req: ByteBuffer): Array[Byte] = {
    val nTopics = req.getInt
    val requested =
      if (nTopics < 0) topics.toSeq.sorted
      else (0 until nTopics).map(_ => readString(req))
    // auto-create: metadata for an unseen topic materializes its
    // partitions, like a broker with auto.create.topics.enable=true
    requested.foreach(t => (0 until numPartitions).foreach(p => logFor(t, p)))
    val buf = ByteBuffer.allocate(64 * 1024)
    // brokers
    buf.putInt(1)
    buf.putInt(0) // node_id
    writeString(buf, "127.0.0.1")
    buf.putInt(port)
    writeNullableString(buf, null) // rack
    buf.putInt(0) // controller_id
    buf.putInt(requested.size)
    requested.foreach { t =>
      buf.putShort(Err.None.toShort)
      writeString(buf, t)
      buf.put(0.toByte) // is_internal
      buf.putInt(numPartitions)
      (0 until numPartitions).foreach { p =>
        buf.putShort(Err.None.toShort)
        buf.putInt(p)
        buf.putInt(0) // leader = node 0
        buf.putInt(1); buf.putInt(0) // replicas [0]
        buf.putInt(1); buf.putInt(0) // isr [0]
      }
    }
    buf.flip()
    val arr = new Array[Byte](buf.remaining()); buf.get(arr); arr
  }

  private def produceResponse(req: ByteBuffer): Array[Byte] = {
    produceRequests.incrementAndGet()
    readNullableString(req) // transactional_id
    req.getShort // acks
    req.getInt // timeout_ms
    val nTopics = req.getInt
    val results = (0 until nTopics).flatMap { _ =>
      val topic = readString(req)
      val nParts = req.getInt
      (0 until nParts).map { _ =>
        val partition = req.getInt
        val recordSet = readNullableBytes(req)
        if (partition < 0 || partition >= numPartitions)
          (topic, partition, Err.UnknownTopicOrPartition, -1L)
        else {
          try {
            val batches = decodeBatchesWithMeta(recordSet) // CRC-validated
            val log = logFor(topic, partition)
            // synchronized over the log so the sequence check and the
            // append are one atomic step even under concurrent
            // producers — the same single-writer-per-partition section
            // a real broker's log append runs in
            val result = log.synchronized {
              var firstBase = -1L
              var err = Err.None
              batches.foreach { case (meta, records) =>
                if (err == Err.None) {
                  val stateKey = (topic, partition, meta.producerId)
                  val ranges =
                    if (meta.idempotent)
                      producerState.getOrDefault(stateKey, Nil)
                    else Nil
                  val dup = if (meta.idempotent)
                    ranges.find(r => r.baseSeq == meta.baseSequence &&
                      r.count == meta.numRecords)
                  else None
                  dup match {
                    case Some(r) => // retry of an accepted batch: re-ack
                      if (firstBase < 0) firstBase = r.baseOffset
                    case None =>
                      val lastSeqEnd = ranges.headOption
                        .map(r => r.baseSeq + r.count).getOrElse(0)
                      if (meta.idempotent && meta.baseSequence != lastSeqEnd)
                        err = Err.OutOfOrderSequenceNumber
                      else {
                        val base = log.length.toLong
                        records.zipWithIndex.foreach { case (r, i) =>
                          log += StoredRecord(base + i, r.timestampMs, r.key, r.value)
                        }
                        if (meta.idempotent)
                          producerState.put(stateKey,
                            (SeqRange(meta.baseSequence, meta.numRecords, base) ::
                              ranges).take(5))
                        if (firstBase < 0) firstBase = base
                      }
                  }
                }
              }
              (err, firstBase)
            }
            (topic, partition, result._1, result._2)
          } catch {
            case _: IllegalArgumentException =>
              (topic, partition, Err.CorruptMessage, -1L)
          }
        }
      }
    }
    val buf = ByteBuffer.allocate(64 * 1024)
    val byTopic = results.groupBy(_._1)
    buf.putInt(byTopic.size)
    byTopic.foreach { case (topic, parts) =>
      writeString(buf, topic)
      buf.putInt(parts.size)
      parts.foreach { case (_, p, err, base) =>
        buf.putInt(p)
        buf.putShort(err.toShort)
        buf.putLong(base)
        buf.putLong(-1L) // log_append_time (CreateTime in use)
      }
    }
    buf.putInt(0) // throttle_time_ms
    buf.flip()
    val arr = new Array[Byte](buf.remaining()); buf.get(arr); arr
  }

  private def fetchResponse(req: ByteBuffer): Array[Byte] = {
    req.getInt // replica_id
    req.getInt // max_wait_ms
    req.getInt // min_bytes
    req.getInt // max_bytes
    req.get() // isolation_level
    val nTopics = req.getInt
    val parts = (0 until nTopics).flatMap { _ =>
      val topic = readString(req)
      val nParts = req.getInt
      (0 until nParts).map { _ =>
        val partition = req.getInt
        val fetchOffset = req.getLong
        val partMaxBytes = req.getInt
        (topic, partition, fetchOffset, partMaxBytes)
      }
    }
    val responses = parts.map { case (topic, partition, fetchOffset, partMaxBytes) =>
      if (partition < 0 || partition >= numPartitions)
        (topic, partition, Err.UnknownTopicOrPartition, 0L, null: Array[Byte])
      else {
        val log = logFor(topic, partition)
        val (hw, slice) = log.synchronized {
          (log.length.toLong, log.drop(fetchOffset.toInt).toVector)
        }
        if (fetchOffset > hw)
          (topic, partition, Err.OffsetOutOfRange, hw, null: Array[Byte])
        else if (slice.isEmpty)
          (topic, partition, Err.None, hw, Array.empty[Byte])
        else {
          // honor the per-partition byte budget batch-wise: at least
          // one batch is always returned (Kafka's own guarantee so a
          // consumer never starves on a large first record)
          var budget = math.max(partMaxBytes, 1)
          val batches = ArrayBuffer.empty[Array[Byte]]
          var i = 0
          while (i < slice.length && budget > 0) {
            val chunk = slice.slice(i, math.min(i + 500, slice.length))
            val encoded = encodeBatch(slice(i).offset,
              chunk.map(r => (r.timestampMs, r.key, r.value)), fetchGzip)
            batches += encoded
            budget -= encoded.length
            i += chunk.length
          }
          (topic, partition, Err.None, hw, batches.flatten.toArray)
        }
      }
    }
    val totalBytes = responses.map { case (_, _, _, _, rs) =>
      if (rs == null) 0 else rs.length
    }.sum
    val buf = ByteBuffer.allocate(64 * 1024 + totalBytes)
    buf.putInt(0) // throttle_time_ms
    val byTopic = responses.groupBy(_._1)
    buf.putInt(byTopic.size)
    byTopic.foreach { case (topic, ps) =>
      writeString(buf, topic)
      buf.putInt(ps.size)
      ps.foreach { case (_, p, err, hw, recordSet) =>
        buf.putInt(p)
        buf.putShort(err.toShort)
        buf.putLong(hw)
        buf.putLong(hw) // last_stable_offset
        buf.putInt(0) // aborted_transactions: empty
        writeNullableBytes(buf, recordSet)
      }
    }
    buf.flip()
    val arr = new Array[Byte](buf.remaining()); buf.get(arr); arr
  }

  /** InitProducerId v0: allocate a fresh (pid, epoch 0) — the handshake
    * an `enable.idempotence=true` producer performs before its first
    * produce (KIP-98). Transactional ids are not spoken (this pair
    * models idempotence, not transactions); a non-null one is rejected
    * the way a broker without the transaction coordinator would be
    * wrong to accept silently.
    */
  private def initProducerIdResponse(req: ByteBuffer): Array[Byte] = {
    val txnId = readNullableString(req)
    req.getInt // transaction_timeout_ms
    require(txnId == null,
      "transactional producers not supported by this stub (idempotence only)")
    val buf = ByteBuffer.allocate(16)
    buf.putInt(0) // throttle_time_ms
    buf.putShort(Err.None.toShort)
    buf.putLong(nextPid.getAndIncrement())
    buf.putShort(0) // producer_epoch
    buf.flip()
    val arr = new Array[Byte](buf.remaining()); buf.get(arr); arr
  }

  private def listOffsetsResponse(req: ByteBuffer): Array[Byte] = {
    req.getInt // replica_id
    val nTopics = req.getInt
    val parts = (0 until nTopics).flatMap { _ =>
      val topic = readString(req)
      val nParts = req.getInt
      (0 until nParts).map { _ =>
        val partition = req.getInt
        val ts = req.getLong
        (topic, partition, ts)
      }
    }
    val buf = ByteBuffer.allocate(64 * 1024)
    val byTopic = parts.groupBy(_._1)
    buf.putInt(byTopic.size)
    byTopic.foreach { case (topic, ps) =>
      writeString(buf, topic)
      buf.putInt(ps.size)
      ps.foreach { case (_, p, ts) =>
        val hw = highWatermark(topic, p)
        // real ListOffsets semantics: a non-negative timestamp resolves
        // to the FIRST offset whose record timestamp is >= it (log end
        // when none qualifies — "start from new data only")
        val (offset, matchedTs) = ts match {
          case -2L => (0L, 0L) // earliest
          case -1L => (hw, -1L) // latest
          case t =>
            val log = logFor(topic, p)
            log.synchronized(log.find(_.timestampMs >= t)) match {
              case Some(r) => (r.offset, r.timestampMs)
              case None    => (hw, -1L)
            }
        }
        buf.putInt(p)
        buf.putShort(Err.None.toShort)
        buf.putLong(matchedTs)
        buf.putLong(offset)
      }
    }
    buf.flip()
    val arr = new Array[Byte](buf.remaining()); buf.get(arr); arr
  }
}
