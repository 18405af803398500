package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Custom-state streaming: gap-based sessionization via
  * `flatMapGroupsWithState` (the KeyValueGroupedDataset state API —
  * SURVEY §2.10's Spark-native extension point for state Druid keeps in
  * realtime nodes).
  *
  * An entity's events belong to one session until a gap larger than
  * `gapMinutes` appears; a closed session emits (entity, start, end,
  * events, value sum). Event-time timeouts + watermark make this correct
  * under out-of-order arrival and bound the state store.
  */
object Sessionize {

  final case class Event(entity: String, ts: Timestamp, value: Double)

  final case class Session(entity: String, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  final case class SessionState(startMs: Long, endMs: Long, nEvents: Long, valueSum: Double)

  /** Sessionize a stream carrying (entityCol, __time, valueCol).
    * Returns the stream of CLOSED sessions. */
  def sessions(stream: DataFrame, entityCol: String, valueCol: String,
      gapMinutes: Int, watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    val typed = stream
      .withWatermark("__time", watermark)
      .select(col(entityCol).cast("string").as("entity"),
        col("__time").as("ts"), col(valueCol).cast("double").as("value"))
      .as[Event]

    typed.groupByKey(_.entity)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: String, events: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap elapsed with no new events → close the session
            val s = state.get
            state.remove()
            Iterator.single(Session(entity, new Timestamp(s.startMs),
              new Timestamp(s.endMs), s.nEvents, s.valueSum))
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  // min() the start too: an out-of-order event inside the
                  // watermark may precede the current session's start, and
                  // it IS counted — start/duration must cover it
                  cur = Some(SessionState(math.min(s.startMs, t), math.max(s.endMs, t),
                    s.nEvents + 1, s.valueSum + e.value))
                case Some(s) => // gap inside the batch → close, start fresh
                  closed ::= Session(entity, new Timestamp(s.startMs),
                    new Timestamp(s.endMs), s.nEvents, s.valueSum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
