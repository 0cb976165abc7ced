package graft.kafka

import java.util.concurrent.CountDownLatch
import java.util.concurrent.TimeUnit

import graft.kafka.KafkaCodec.Err
import graft.kafka.KafkaCodec.KafkaWireException

/** The consumer's BACKGROUND HEARTBEAT THREAD — the piece that lets a
  * group member's session outlive its processing time. Kafka's
  * liveness contract is two-channel: `session.timeout.ms` bounds
  * silence on the HEARTBEAT channel (a crashed process), while the
  * poll loop bounds processing (`max.poll.interval.ms` in the modern
  * client). A consumer that spends 17 s materializing a batch is not
  * dead, and the way the real client proves that is exactly this: a
  * daemon thread pinging the coordinator every few seconds while the
  * caller works. Reference behavior: the consumers in
  * kafka_to_elasticsearch.py lean on kafka-python's identical
  * background heartbeat; round 13's catalog query lacked one and had
  * to paper over it with a 600 s session timeout — this class retires
  * that crutch.
  *
  * Runs on its OWN connection to the coordinator: member identity
  * travels in the Heartbeat request body, not the socket, so the main
  * client's blocking JoinGroup/SyncGroup calls never contend with it.
  *
  * Signals, never throws into the caller:
  *   - [[rebalanceSignalled]] flips when the coordinator answers
  *     REBALANCE_IN_PROGRESS — the "rejoin now" nudge. Heartbeats
  *     CONTINUE (the coordinator refreshes the member's deadline even
  *     mid-rebalance, keeping a slow member alive until it rejoins).
  *   - A fencing answer (ILLEGAL_GENERATION / UNKNOWN_MEMBER_ID —
  *     e.g. a new generation completed while the caller was between
  *     rejoin and [[generationIs]]) PAUSES the loop at the stale
  *     generation instead of killing the thread; [[generationIs]]
  *     resumes it, mirroring the real client's reset-and-await-rejoin.
  *   - [[failure]] carries a transport-level death (socket torn down).
  */
final class GroupHeartbeat(host: String, port: Int, group: String,
    memberId: String, initialGeneration: Int,
    intervalMs: Long = 1000L, clientId: String = "graft-hb")
    extends AutoCloseable {

  @volatile private var gen = initialGeneration
  @volatile private var fencedAtGen = Int.MinValue
  // the generation a rebalance signal was observed UNDER: an in-flight
  // heartbeat for a stale generation must not raise a phantom signal
  // for a newer one the caller already rejoined into (generations are
  // monotonic, so "signal gen == current gen" is the liveness test)
  @volatile private var rebalanceAtGen = Int.MinValue
  @volatile private var died: Option[Throwable] = None
  private val stop = new CountDownLatch(1)
  private val client = new KafkaWireClient(host, port, clientId = clientId)

  private val thread = new Thread(() => {
    try {
      while (!stop.await(intervalMs, TimeUnit.MILLISECONDS)) {
        val g = gen
        if (g != fencedAtGen) {
          try {
            if (client.heartbeat(group, g, memberId) == Err.RebalanceInProgress)
              rebalanceAtGen = g
          } catch {
            case e: KafkaWireException
                if e.code == Err.IllegalGeneration ||
                  e.code == Err.UnknownMemberId =>
              rebalanceAtGen = g
              fencedAtGen = g
          }
        }
      }
    } catch { case t: Throwable => died = Some(t) }
  }, s"graft-heartbeat-$group-$memberId")
  thread.setDaemon(true)
  thread.start()

  /** True once the coordinator has told this member to rejoin under
    * the CURRENT generation; signals observed under an older one are
    * stale by construction and read as false.
    */
  def rebalanceSignalled: Boolean = rebalanceAtGen == gen

  /** Transport-level thread death, if any (fencing is NOT a death). */
  def failure: Option[Throwable] = died

  /** The caller rejoined and landed in `newGen`: heartbeat under it
    * from now on. Any rebalance/fencing signal recorded under an older
    * generation — including one set by a heartbeat that was in flight
    * during this call — is stale and ignored by the generation compare,
    * so there is no flag to clear and no clear-then-reset race.
    */
  def generationIs(newGen: Int): Unit = { gen = newGen }

  override def close(): Unit = {
    stop.countDown()
    thread.join(5000)
    client.close()
  }
}
