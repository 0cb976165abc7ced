package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

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

  // ------------------------------------------------------------------
  // Event-time TIMERS (transformWithState TimeMode.EventTime): a
  // hand-built session window. The built-in `session_window` operator
  // (q_stream_session_window) and this processor share ONE oracle — the
  // same trick q_dedup_clusters/q_dedup_clusters_twostar use — so the
  // custom state machine is proven to reproduce the built-in's gap rule
  // ([start, last+gap), new session when diff >= gap) AND its append-
  // mode emission contract (a session emits only once the watermark
  // passes its end).
  //
  // Mechanics: per user, one open session in a ValueState and finished-
  // but-unemittable sessions in a ListState; after each batch exactly
  // one event-time timer sits at the earliest pending session end. When
  // the watermark crosses it, handleExpiredTimer emits every session
  // with end <= watermark and re-arms for the rest. In-batch events are
  // sorted by (ts, event_id) — bounded by a user's per-batch volume,
  // the standard sessionization shape; cross-batch order is the
  // watermark's job.

  final case class SessionIn(
      user_id: Long, event_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  final case class SessionOut(
      user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  final class SessionTimerProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessionIn, SessionOut] {

    private val tuple3 = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    // every not-yet-emitted session as (start_us, last_us, n_events).
    // No open/closed split: a session is "closed" only by the watermark,
    // so out-of-order events across micro-batches (allowed by the 1h
    // watermark delay vs the 30m gap) can extend or BRIDGE any pending
    // session — exactly the merge rule the built-in session_window
    // applies, which is what the shared oracle checks.
    @transient private var pending: ListState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState[(Long, Long, Long)]("pending", tuple3, TTLConfig.NONE)

    /** One timer per key, at the earliest pending end; re-check against
      * the actual watermark at expiry, so the exact fire boundary
      * semantics never matter.
      */
    private def armTimer(sessions: Seq[(Long, Long, Long)],
        expiredMs: Long = Long.MinValue): Unit = {
      // the just-expired timer is already gone from the store; deleting
      // it again only produces a WARN per key per batch
      getHandle.listTimers().filter(_ != expiredMs).foreach(getHandle.deleteTimer)
      if (sessions.nonEmpty)
        getHandle.registerTimer((sessions.map(_._2).min + gapUs + 999L) / 1000L)
    }

    /** Sort by start and fold: intervals [start, last+gap) that touch
      * merge (counts add). Events enter as unit sessions (ts, ts, 1), so
      * one pass handles extend-forward, extend-backward, and bridging
      * two previously separate sessions. Per-key pending count is
      * bounded by watermark-delay / gap — O(1) sessions, not O(rows).
      */
    private def merged(all: Seq[(Long, Long, Long)]): Vector[(Long, Long, Long)] = {
      val sorted = all.sortBy(s => (s._1, s._2))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      sorted.foreach { case s @ (st, last, n) =>
        out.lastOption match {
          case Some((pst, plast, pn)) if st - plast < gapUs =>
            out(out.size - 1) = (pst, math.max(plast, last), pn + n)
          case _ => out += s
        }
      }
      out.toVector
    }

    override def handleInputRows(key: Long, rows: Iterator[SessionIn],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val units = rows.map(e => (e.ts_us, e.ts_us, 1L)).toVector
      val next = merged(pending.get().toVector ++ units)
      pending.clear()
      next.foreach(pending.appendValue)
      armTimer(next)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val (emit, keep) = pending.get().toVector.partition(_._2 + gapUs <= wmUs)
      pending.clear()
      keep.foreach(pending.appendValue)
      armTimer(keep, expiredTimerInfo.getExpiryTimeInMs())
      emit.sortBy(_._1).iterator.map { case (st, last, n) =>
        SessionOut(key, st / 1000000L, (last + gapUs) / 1000000L, n)
      }
    }
  }

  /** Timer-driven session windows through transformWithState. */
  def sessionsViaTimers(events: DataFrame, gapUs: Long = 1800000000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .withWatermark("ts", "1 hour")
      .as[SessionIn]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[SessionOut]])
  }

  // ------------------------------------------------------------------
  // Streaming AS-OF join — the temporal join Structured Streaming has
  // no built-in operator for: each purchase pairs with the user's most
  // recent click at-or-before its event time. Event-time timers make it
  // exact under out-of-order arrival: a purchase is emitted only once
  // the watermark passes its timestamp — at that point every click with
  // c_ts ≤ p_ts has either arrived or would be dropped as late, so the
  // match is final (the same emission contract as append-mode session
  // windows). State per user is bounded: pending purchases only until
  // their timer fires, and of the clicks at-or-below the watermark only
  // the LATEST survives — any older one can never win an as-of match
  // for a future (> watermark) purchase.

  final case class AsOfEvent(
      user_id: Long, ts_us: Long, event_id: Long, kind: String,
      ts: java.sql.Timestamp)
  final case class AsOfMatch(
      purchase_id: Long, user_id: Long, p_sec: Long, click_id: Option[Long])

  final class AsOfTimerProcessor
      extends StatefulProcessor[Long, AsOfEvent, AsOfMatch] {

    private val tuple2 = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    // (ts_us, event_id) lists; purchases pending until their timer fires
    @transient private var clicks: ListState[(Long, Long)] = _
    @transient private var purchases: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      clicks = getHandle.getListState[(Long, Long)]("clicks", tuple2, TTLConfig.NONE)
      purchases = getHandle.getListState[(Long, Long)]("purchases", tuple2, TTLConfig.NONE)
    }

    /** One timer per key at the earliest actionable instant: the
      * earliest pending purchase, OR — so click state stays bounded for
      * keys with few/no purchases — the SECOND-earliest stored click
      * (once the watermark passes it, at least two clicks sit
      * at-or-below it and the GC in handleExpiredTimer collapses them
      * to one, so every pure-GC fire shrinks state). Expiry re-checks
      * against the actual watermark (same discipline as
      * [[SessionTimerProcessor]]).
      */
    private def armTimer(pending: Seq[(Long, Long)], clickTs: Seq[Long],
        expiredMs: Long = Long.MinValue): Unit = {
      getHandle.listTimers().filter(_ != expiredMs).foreach(getHandle.deleteTimer)
      val gc = if (clickTs.sizeIs >= 2) Seq(clickTs.sorted.apply(1)) else Nil
      val cand = pending.map(_._1) ++ gc
      if (cand.nonEmpty) getHandle.registerTimer((cand.min + 999L) / 1000L)
    }

    override def handleInputRows(key: Long, rows: Iterator[AsOfEvent],
        timerValues: TimerValues): Iterator[AsOfMatch] = {
      rows.foreach { e =>
        if (e.kind == "p") purchases.appendValue((e.ts_us, e.event_id))
        else clicks.appendValue((e.ts_us, e.event_id))
      }
      armTimer(purchases.get().toVector, clicks.get().toVector.map(_._1))
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AsOfMatch] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val allClicks = clicks.get().toVector
      val (emit, keep) = purchases.get().toVector.partition(_._1 <= wmUs)
      purchases.clear()
      keep.foreach(purchases.appendValue)
      // click GC: of the clicks at-or-below the watermark only the
      // latest can still win (every surviving purchase has p_ts > wm ≥
      // their ts); clicks above the watermark all remain in play
      val (old, live) = allClicks.partition(_._1 <= wmUs)
      val kept = live ++ old.sortBy(c => (c._1, c._2)).lastOption
      clicks.clear()
      kept.foreach(clicks.appendValue)
      armTimer(keep, kept.map(_._1), expiredTimerInfo.getExpiryTimeInMs())
      emit.sortBy(p => (p._1, p._2)).iterator.map { case (pTs, pid) =>
        val best = allClicks.filter(_._1 <= pTs)
          .sortBy(c => (c._1, c._2)).lastOption
        AsOfMatch(pid, key, pTs / 1000000L, best.map(_._2))
      }
    }
  }

  /** Event-time as-of join (purchases ⟕ latest preceding click) through
    * transformWithState timers.
    */
  def asOfViaTimers(events: DataFrame): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        when(col("event_type") === "purchase", "p").otherwise("c").as("kind"),
        col("ts"))
      .withWatermark("ts", "1 hour")
      .as[AsOfEvent]
      .groupByKey(_.user_id)
      .transformWithState(new AsOfTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[AsOfMatch]])
  }

  // ------------------------------------------------------------------
  // MapState — the third typed-state kind (with UserSummaryProcessor's
  // ValueState and SessionTimerProcessor's ListState this covers the
  // full transformWithState state surface): per-user map of
  // event_type -> running count, emitting the updated distribution each
  // batch. Point lookups/updates touch ONE map entry per input row —
  // the state store never rewrites the whole per-key blob, which is the
  // reason MapState exists over a ValueState[Map[...]].

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  final class UserTypeCountsProcessor
      extends StatefulProcessor[Long, (Long, String), TypeCount] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.Set.empty[String]
      rows.foreach { case (_, t) =>
        val cur = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, cur + 1L)
        touched += t
      }
      touched.iterator.map(t => TypeCount(key, t, counts.getValue(t))).toVector.iterator
    }
  }

  /** Streaming per-(user, event_type) counts through MapState. */
  def userTypeCounts(events: DataFrame): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events.select("user_id", "event_type").as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new UserTypeCountsProcessor,
        TimeMode.None(), OutputMode.Update(),
        implicitly[org.apache.spark.sql.Encoder[TypeCount]])
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
