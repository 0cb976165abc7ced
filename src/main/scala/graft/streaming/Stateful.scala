package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Custom keyed streaming state via `flatMapGroupsWithState`
  * (SURVEY.md §1.3 / §2.7 T5 — beyond reference parity, which is
  * stateless). Running per-key counters: state is one long per key,
  * updated each micro-batch, emitting the new total.
  *
  * Scale: state lives in the state store partitioned by key — the
  * shuffle is on the group key only, and per-key state is O(1).
  */
object Stateful {

  def runningUserCounts(events: DataFrame): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.select("user_id").as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) => {
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator.single((uid, total))
        })
  }

  // ------------------------------------------------------------------
  // transformWithState (Spark 4's arbitrary-state v2 API): typed state
  // variables per key instead of one opaque blob, TTL support, timers —
  // and it REQUIRES the RocksDB state store, which is the right choice
  // for large keyed state anyway. The processor below keeps a per-user
  // running summary in a single ValueState and emits the updated
  // summary each batch (update semantics: downstream keeps last-per-key).

  final case class EventIn(user_id: Long, event_id: Long, value: Double, ts_us: Long)
  final case class UserSummary(
      user_id: Long, n_events: Long, max_value: Double, last_event_id: Long)

  /** Per-user summary: count, max value, id of the latest event by
    * (ts, event_id). Input order within a batch is arbitrary — every
    * reduction here is order-insensitive, so the result is deterministic.
    */
  final class UserSummaryProcessor
      extends StatefulProcessor[Long, EventIn, UserSummary] {

    @transient private var summary: ValueState[(Long, Double, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      summary = getHandle.getValueState[(Long, Double, Long, Long)](
        "summary",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[UserSummary] = {
      // (count, max_value, last_ts_us, last_event_id)
      var (c, mx, lts, lid) =
        if (summary.exists()) summary.get()
        else (0L, Double.NegativeInfinity, Long.MinValue, Long.MinValue)
      rows.foreach { e =>
        c += 1
        if (e.value > mx) mx = e.value
        if (e.ts_us > lts || (e.ts_us == lts && e.event_id > lid)) {
          lts = e.ts_us; lid = e.event_id
        }
      }
      summary.update((c, mx, lts, lid))
      Iterator.single(UserSummary(key, c, mx, lid))
    }
  }

  /** Streaming per-user summaries through transformWithState. */
  def userSummaries(events: DataFrame): Dataset[UserSummary] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new UserSummaryProcessor,
        TimeMode.None(), OutputMode.Update(),
        implicitly[org.apache.spark.sql.Encoder[UserSummary]])
  }
}
