package graft.kafka

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32C

/** Byte-level codec for the public Apache Kafka wire protocol — the
  * executed-transport half of S5/K2 that `format("kafka")` config alone
  * could never prove (the connector jar is absent in this zero-egress
  * environment, so we speak the broker's TCP protocol directly, the
  * same playbook as the round-7 ES `_bulk` client).
  *
  * Everything here is from the published protocol guide
  * (kafka.apache.org/protocol) and KIP-98's record batch v2 layout:
  *
  * {{{
  * RecordBatch =>
  *   baseOffset: int64
  *   batchLength: int32            // bytes after this field
  *   partitionLeaderEpoch: int32
  *   magic: int8 (= 2)
  *   crc: uint32                   // CRC32C of attributes..end
  *   attributes: int16
  *   lastOffsetDelta: int32
  *   baseTimestamp: int64
  *   maxTimestamp: int64
  *   producerId: int64
  *   producerEpoch: int16
  *   baseSequence: int32
  *   numRecords: int32
  *   records: Record*              // zigzag-varint encoded
  * }}}
  *
  * Non-flexible (pre-tagged-field) API versions are used throughout the
  * client/broker pair, so primitives are the classic fixed-width +
  * int16-length strings + int32-length arrays/bytes.
  *
  * Reference behavior being reproduced: `dataframe_to_kafka.py:85-113`
  * (keyed produce) and `spark_streaming_kafka.py:13-18` (earliest-offset
  * consume).
  */
object KafkaCodec {

  /** A broker-reported protocol error, carrying its numeric code so
    * routing layers can react to the RETRIABLE subset
    * (NOT_LEADER_FOR_PARTITION / NOT_COORDINATOR → refresh metadata and
    * re-route, the loop a real client runs on leader failover) instead
    * of string-matching a require() message.
    */
  // extends IllegalArgumentException so it substitutes for the
  // require()-based failures it replaces (specs pin that type)
  final class KafkaWireException(val code: Int, message: String)
      extends IllegalArgumentException(message) {
    def retriable: Boolean =
      code == Err.NotLeaderForPartition || code == Err.NotCoordinator
  }

  /** One decoded record on the wire: null key/value are real protocol
    * states (tombstones), carried as null arrays. `control` marks a
    * record from a control batch (a transaction COMMIT/ABORT marker) —
    * it occupies a log offset like any record (consumers must count it
    * when advancing) but is never surfaced as data; `producerId` is
    * the batch-level producer id (-1 when non-idempotent), carried
    * per-record so a read_committed consumer can match records against
    * aborted-transaction ranges.
    */
  final case class WireRecord(
      offset: Long,
      timestampMs: Long,
      key: Array[Byte],
      value: Array[Byte],
      control: Boolean = false,
      producerId: Long = -1L)

  /** Batch-level producer state (KIP-98 fields): pid/epoch/sequence
    * all -1 on a plain produce; set by `enable.idempotence=true`
    * producers so the broker can fence duplicates. `transactional` /
    * `control` are the attribute bits 4/5 of record batch v2 — a
    * transactional data batch belongs to an open transaction, a
    * control batch carries its COMMIT/ABORT marker.
    */
  final case class BatchMeta(
      producerId: Long,
      producerEpoch: Short,
      baseSequence: Int,
      numRecords: Int,
      transactional: Boolean = false,
      control: Boolean = false) {
    def idempotent: Boolean = producerId >= 0L
  }

  /** Control-record payloads (KIP-98): the marker record's KEY is
    * (version int16, type int16) with type 0 = ABORT, 1 = COMMIT; the
    * VALUE is (version int16, coordinator_epoch int32). These are the
    * bytes a real broker writes when the transaction coordinator
    * completes a transaction.
    */
  object ControlMarker {
    val Abort = 0
    val Commit = 1

    def key(markerType: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(4)
      b.putShort(0) // version
      b.putShort(markerType.toShort)
      b.array()
    }

    def value(): Array[Byte] = {
      val b = ByteBuffer.allocate(6)
      b.putShort(0) // version
      b.putInt(0) // coordinator_epoch
      b.array()
    }

    /** Marker type from a control record's key (-1 if malformed). */
    def typeOf(key: Array[Byte]): Int =
      if (key == null || key.length < 4) -1
      else ((key(2) & 0xff) << 8) | (key(3) & 0xff)
  }

  // ---- zigzag varints (record v2 body encoding) ----

  def writeVarLong(buf: ByteBuffer, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0L) {
      buf.put(((z & 0x7f) | 0x80).toByte)
      z >>>= 7
    }
    buf.put(z.toByte)
  }

  def writeVarInt(buf: ByteBuffer, v: Int): Unit = writeVarLong(buf, v.toLong)

  def readVarLong(buf: ByteBuffer): Long = {
    var z = 0L; var shift = 0
    var b = buf.get()
    while ((b & 0x80) != 0) {
      z |= (b & 0x7fL) << shift
      shift += 7
      b = buf.get()
    }
    z |= (b & 0x7fL) << shift
    (z >>> 1) ^ -(z & 1) // un-zigzag
  }

  def readVarInt(buf: ByteBuffer): Int = readVarLong(buf).toInt

  def varLongSize(v: Long): Int = {
    var z = (v << 1) ^ (v >> 63); var n = 1
    while ((z & ~0x7fL) != 0L) { n += 1; z >>>= 7 }
    n
  }

  // ---- classic protocol primitives ----

  def writeString(buf: ByteBuffer, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    buf.putShort(b.length.toShort).put(b)
  }

  def writeNullableString(buf: ByteBuffer, s: String): Unit =
    if (s == null) buf.putShort(-1) else writeString(buf, s)

  def readString(buf: ByteBuffer): String = {
    val n = buf.getShort.toInt
    require(n >= 0, "non-nullable string was null")
    val b = new Array[Byte](n); buf.get(b)
    new String(b, StandardCharsets.UTF_8)
  }

  def readNullableString(buf: ByteBuffer): String = {
    val n = buf.getShort.toInt
    if (n < 0) null
    else { val b = new Array[Byte](n); buf.get(b); new String(b, StandardCharsets.UTF_8) }
  }

  def writeNullableBytes(buf: ByteBuffer, b: Array[Byte]): Unit =
    if (b == null) buf.putInt(-1) else { buf.putInt(b.length); buf.put(b) }

  def readNullableBytes(buf: ByteBuffer): Array[Byte] = {
    val n = buf.getInt
    if (n < 0) null else { val b = new Array[Byte](n); buf.get(b); b }
  }

  // ---- record batch v2 ----

  private val BatchHeaderLen = 61 // baseOffset..numRecords inclusive
  private val AttributesOffsetInBatch = 21 // CRC covers attributes..end

  /** Compression codec ids (attributes bits 0-2, per the protocol
    * guide). This pair speaks none and gzip — gzip is the one codec
    * whose implementation ships in the JDK, so it needs no external
    * jar; snappy/lz4/zstd would. An unknown codec fails loudly.
    */
  object Codec {
    val None = 0
    val Gzip = 1
  }

  def gzipCompress(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(math.max(bytes.length / 4, 64))
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  def gzipDecompress(bytes: Array[Byte]): Array[Byte] = {
    val gz = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(math.max(bytes.length * 4, 64))
    val buf = new Array[Byte](8192)
    var n = gz.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = gz.read(buf) }
    gz.close()
    out.toByteArray
  }

  private def recordSize(timestampDelta: Long, offsetDelta: Int,
      key: Array[Byte], value: Array[Byte]): Int = {
    var n = 1 // attributes int8
    n += varLongSize(timestampDelta)
    n += varLongSize(offsetDelta.toLong)
    n += (if (key == null) varLongSize(-1L) else varLongSize(key.length.toLong) + key.length)
    n += (if (value == null) varLongSize(-1L) else varLongSize(value.length.toLong) + value.length)
    n += varLongSize(0L) // headers count
    n
  }

  /** Encode one v2 record batch. Offsets inside are `baseOffset + i`;
    * timestamps are per-record CreateTime. With `gzip = true` the
    * records section (everything after the numRecords field) is
    * gzip-deflated and the attributes codec bits say so — numRecords
    * still states the uncompressed record count, and the CRC covers
    * the bytes on the wire (i.e. the compressed payload), exactly as
    * the protocol guide specifies.
    */
  def encodeBatch(baseOffset: Long,
      records: Seq[(Long, Array[Byte], Array[Byte])],
      gzip: Boolean = false,
      producerId: Long = -1L,
      producerEpoch: Short = -1,
      baseSequence: Int = -1,
      transactional: Boolean = false,
      control: Boolean = false): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val baseTs = records.head._1
    val maxTs = records.map(_._1).max
    val bodySizes = records.zipWithIndex.map { case ((ts, k, v), i) =>
      val sz = recordSize(ts - baseTs, i, k, v)
      sz + varLongSize(sz.toLong)
    }
    val body = ByteBuffer.allocate(bodySizes.sum)
    records.zipWithIndex.foreach { case ((ts, k, v), i) =>
      writeVarLong(body, recordSize(ts - baseTs, i, k, v).toLong)
      body.put(0.toByte) // record attributes
      writeVarLong(body, ts - baseTs)
      writeVarLong(body, i.toLong)
      if (k == null) writeVarLong(body, -1L)
      else { writeVarLong(body, k.length.toLong); body.put(k) }
      if (v == null) writeVarLong(body, -1L)
      else { writeVarLong(body, v.length.toLong); body.put(v) }
      writeVarLong(body, 0L) // no headers
    }
    val payload = if (gzip) gzipCompress(body.array()) else body.array()
    val total = BatchHeaderLen + payload.length
    val buf = ByteBuffer.allocate(total)
    buf.putLong(baseOffset)
    buf.putInt(total - 12) // batchLength: everything after that field
    buf.putInt(0) // partitionLeaderEpoch
    buf.put(2.toByte) // magic
    val crcPos = buf.position()
    buf.putInt(0) // crc placeholder
    // attributes: codec bits 0-2, CreateTime (bit 3 clear),
    // isTransactional bit 4, isControlBatch bit 5
    val attributes = (if (gzip) Codec.Gzip else Codec.None) |
      (if (transactional) 0x10 else 0) | (if (control) 0x20 else 0)
    buf.putShort(attributes.toShort)
    buf.putInt(records.size - 1) // lastOffsetDelta
    buf.putLong(baseTs)
    buf.putLong(maxTs)
    buf.putLong(producerId)
    buf.putShort(producerEpoch)
    buf.putInt(baseSequence)
    buf.putInt(records.size)
    buf.put(payload)
    val arr = buf.array()
    val crc = new CRC32C
    crc.update(arr, AttributesOffsetInBatch, total - AttributesOffsetInBatch)
    buf.putInt(crcPos, crc.getValue.toInt)
    arr
  }

  /** Decode a record set (zero or more concatenated v2 batches),
    * validating each batch's CRC32C — a torn or corrupted batch fails
    * loudly rather than yielding garbage rows.
    */
  def decodeBatches(recordSet: Array[Byte]): Seq[WireRecord] =
    decodeBatchesWithMeta(recordSet).flatMap(_._2)

  /** [[decodeBatches]] preserving each batch's producer-state header —
    * what a broker needs to enforce KIP-98 idempotence on Produce.
    */
  def decodeBatchesWithMeta(
      recordSet: Array[Byte]): Seq[(BatchMeta, Seq[WireRecord])] = {
    if (recordSet == null) return Nil
    val out = Seq.newBuilder[(BatchMeta, Seq[WireRecord])]
    val buf = ByteBuffer.wrap(recordSet)
    while (buf.remaining() >= 12) {
      val baseOffset = buf.getLong
      val batchLength = buf.getInt
      if (buf.remaining() < batchLength) {
        // partial trailing batch: a real broker may return one at the
        // fetch byte limit; consumers skip it and refetch
        buf.position(buf.limit())
      } else {
        val batchStart = buf.position() - 12
        buf.getInt // partitionLeaderEpoch
        val magic = buf.get()
        require(magic == 2, s"unsupported magic $magic (only record batch v2)")
        val crcStored = buf.getInt
        val crc = new CRC32C
        crc.update(recordSet, batchStart + AttributesOffsetInBatch,
          batchLength - (AttributesOffsetInBatch - 12))
        require(crc.getValue.toInt == crcStored,
          f"record batch CRC mismatch at offset $baseOffset: " +
            f"stored 0x$crcStored%08x != computed 0x${crc.getValue.toInt}%08x")
        val attributes = buf.getShort
        buf.getInt // lastOffsetDelta
        val baseTs = buf.getLong
        buf.getLong // maxTimestamp
        val producerId = buf.getLong
        val producerEpoch = buf.getShort
        val baseSequence = buf.getInt
        val n = buf.getInt
        // records section spans to the batch end; slice it so a
        // compressed payload can be inflated before parsing
        val recordsEnd = batchStart + 12 + batchLength
        val payload = new Array[Byte](recordsEnd - buf.position())
        buf.get(payload)
        val codec = attributes & 0x07
        val recBuf = codec match {
          case Codec.None => ByteBuffer.wrap(payload)
          case Codec.Gzip => ByteBuffer.wrap(gzipDecompress(payload))
          case other =>
            throw new IllegalArgumentException(
              s"unsupported compression codec $other (this pair speaks none/gzip)")
        }
        val recs = Seq.newBuilder[WireRecord]
        var i = 0
        while (i < n) {
          readVarLong(recBuf) // record length
          recBuf.get() // attributes
          val tsDelta = readVarLong(recBuf)
          val offDelta = readVarLong(recBuf)
          val kLen = readVarInt(recBuf)
          val k = if (kLen < 0) null else { val a = new Array[Byte](kLen); recBuf.get(a); a }
          val vLen = readVarInt(recBuf)
          val v = if (vLen < 0) null else { val a = new Array[Byte](vLen); recBuf.get(a); a }
          val nHeaders = readVarInt(recBuf)
          var h = 0
          while (h < nHeaders) { // skip headers: keyLen+key, valLen+val
            val hk = readVarInt(recBuf); recBuf.position(recBuf.position() + math.max(hk, 0))
            val hv = readVarInt(recBuf); recBuf.position(recBuf.position() + math.max(hv, 0))
            h += 1
          }
          recs += WireRecord(baseOffset + offDelta, baseTs + tsDelta, k, v,
            control = (attributes & 0x20) != 0, producerId = producerId)
          i += 1
        }
        out += ((BatchMeta(producerId, producerEpoch, baseSequence, n,
          transactional = (attributes & 0x10) != 0,
          control = (attributes & 0x20) != 0),
          recs.result()))
      }
    }
    out.result()
  }

  /** Kafka's default-partitioner hash (murmur2 over the key bytes,
    * masked positive, modulo partition count) — the published algorithm
    * every client implements so a keyed topic lands the same key on the
    * same partition regardless of producer language
    * (`dataframe_to_kafka.py:94-100` relies on exactly this for its
    * per-key ordering).
    */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val n4 = data.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    (data.length % 4) match {
      case 3 =>
        h ^= (data((n4 * 4) + 2) & 0xff) << 16
        h ^= (data((n4 * 4) + 1) & 0xff) << 8
        h ^= data(n4 * 4) & 0xff
        h *= m
      case 2 =>
        h ^= (data((n4 * 4) + 1) & 0xff) << 8
        h ^= data(n4 * 4) & 0xff
        h *= m
      case 1 =>
        h ^= data(n4 * 4) & 0xff
        h *= m
      case _ =>
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Default-partitioner placement for a non-null key. */
  def partitionFor(key: Array[Byte], numPartitions: Int): Int =
    (murmur2(key) & 0x7fffffff) % numPartitions

  // ---- api keys + error codes (the subset this pair speaks) ----

  object Api {
    val Produce = 0
    val Fetch = 1
    val ListOffsets = 2
    val Metadata = 3
    val OffsetCommit = 8
    val OffsetFetch = 9
    val FindCoordinator = 10
    val JoinGroup = 11
    val Heartbeat = 12
    val LeaveGroup = 13
    val SyncGroup = 14
    val SaslHandshake = 17
    val ApiVersions = 18
    val InitProducerId = 22
    val AddPartitionsToTxn = 24
    val EndTxn = 26
    val SaslAuthenticate = 36
  }

  object Err {
    val None = 0
    val OffsetOutOfRange = 1
    val CorruptMessage = 2
    val UnknownTopicOrPartition = 3
    val NotLeaderForPartition = 6 // partition is led by another broker: refresh metadata and re-route
    val NotCoordinator = 16 // group/txn key is coordinated by another broker
    val IllegalGeneration = 22 // member-protocol generation on a group with no active members
    val InconsistentGroupProtocol = 23 // joiner's protocol list shares nothing with the group's
    val UnknownMemberId = 25 // group op from a member the coordinator doesn't know (fenced)
    val RebalanceInProgress = 27 // heartbeat/sync during PreparingRebalance: rejoin now
    val UnsupportedSaslMechanism = 33 // handshake named a mechanism the broker doesn't enable
    val IllegalSaslState = 34 // SASL request out of sequence (e.g. authenticate before handshake)
    val OutOfOrderSequenceNumber = 45
    val InvalidProducerEpoch = 47 // a newer producer with the same transactional.id fenced this one
    val InvalidTxnState = 48 // e.g. transactional produce to a partition never added to the txn
    val SaslAuthenticationFailed = 58 // credentials rejected; the broker closes the connection after responding
  }
}
