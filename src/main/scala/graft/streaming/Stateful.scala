package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
