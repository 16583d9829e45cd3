package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the `events` shape
  * (ts timestamp, user_id long, event_type string, value double).
  *
  * The batch analogs are `events_windowed` / `events_sessions` in the
  * oracle-checked corpus; these run the same logic incrementally with
  * event-time watermarks, so at 100 TB/day the state store holds only
  * the open windows / sessions, not history.
  */
object Streams {

  /** Tumbling 1h event-time window per event_type, 1h watermark for
    * late data — the streaming form of `events_windowed`. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** In-stream exact dedup: drop repeated event_ids, bounding state by
    * the event-time watermark (the streaming form of `dedup_exact` —
    * at 100 TB/day the state store holds one key per id inside the
    * watermark horizon only). */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  case class Sess(userId: Long, start: Long, end: Long, nEvents: Long)

  /** Event-time sessionization with a 30-min gap, the streaming form of
    * `events_sessions`: per-user state holds only the open session;
    * sessions close via event-time timeout when the watermark passes
    * gap past the last event. */
  def sessionize(events: Dataset[(Timestamp, Long)],
                 gapSec: Long = 1800): Dataset[Sess] = {
    import events.sparkSession.implicits._
    events
      .withColumnRenamed("_1", "ts").withColumnRenamed("_2", "user_id")
      .withWatermark("ts", "30 minutes")
      .as[(Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Sess, Sess](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, it, state: GroupState[Sess]) =>
          if (state.hasTimedOut) {
            val s = state.get; state.remove(); Iterator(s)
          } else {
            val secs = it.map(_._1.getTime / 1000).toSeq.sorted
            var cur = state.getOption
            val closed = Seq.newBuilder[Sess]
            for (t <- secs) cur match {
              case Some(s) if t - s.end <= gapSec =>
                cur = Some(s.copy(end = t, nEvents = s.nEvents + 1))
              case Some(s) =>
                closed += s; cur = Some(Sess(user, t, t, 1))
              case None => cur = Some(Sess(user, t, t, 1))
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end * 1000 + gapSec * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
