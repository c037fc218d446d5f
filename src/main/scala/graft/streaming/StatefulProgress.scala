package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** A6/W3/W4 as true custom streaming state: the reference recomputes
  * `avg_time_per_task` and an ETA from mutable counters on every stdout
  * line (`/root/reference/interface.py:183-194`). The Spark-native
  * equivalent of that mutable-counter loop is
  * `KeyValueGroupedDataset.mapGroupsWithState`: one `TaskState` per
  * pipeline task, updated per micro-batch, emitting a refreshed
  * progress/ETA row.
  *
  * State is O(|tasks|) rows — bounded by the work plan, not the stream;
  * for unbounded key domains pair with `GroupStateTimeout` eviction.
  */
object StatefulProgress {

  case class ProgressEvent(task: String, ts: java.sql.Timestamp)
  case class TaskState(done: Long, firstTs: Long, lastTs: Long)
  case class TaskProgress(task: String, done: Long, elapsedSec: Double,
                          avgSecPerItem: Double, etaSec: Double)

  case class SessionEvent(user: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class CompletedSession(user: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, n_events: Long)

  /** True streaming sessionization with `flatMapGroupsWithState` +
    * event-time timeout: a session CLOSES (and is emitted, Append mode)
    * when the watermark passes `last event + gap` — the stateful
    * custom-state form of q17's batch `session_window`. State per key is
    * one open session; eviction is watermark-driven, so state is
    * bounded even over an unbounded key domain. */
  def streamingSessions(events: Dataset[SessionEvent],
                        gapMinutes: Int): Dataset[CompletedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, CompletedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, batch, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(CompletedSession(user,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n))
          } else {
            val times = batch.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[CompletedSession]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.last >= gapMs =>
                  closed ::= CompletedSession(user,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Running per-task progress with ETA against a known `totalItems`
    * (the reference's `total_tarefas` from its config). */
  def runningEta(events: Dataset[ProgressEvent],
                 totalItems: Long): Dataset[TaskProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.task)
      .mapGroupsWithState[TaskState, TaskProgress](GroupStateTimeout.NoTimeout) {
        (task, batch, state) =>
          val evs = batch.toSeq
          val prev = state.getOption.getOrElse(
            TaskState(0L, Long.MaxValue, Long.MinValue))
          val times = evs.map(_.ts.getTime)
          val next = TaskState(
            prev.done + evs.size,
            math.min(prev.firstTs, if (times.isEmpty) prev.firstTs else times.min),
            math.max(prev.lastTs, if (times.isEmpty) prev.lastTs else times.max))
          state.update(next)
          val elapsed =
            if (next.lastTs >= next.firstTs) (next.lastTs - next.firstTs) / 1000.0
            else 0.0
          val avg = if (next.done > 0) elapsed / next.done else 0.0
          TaskProgress(task, next.done, elapsed, avg,
            math.max(totalItems - next.done, 0L) * avg)
      }
  }
}
