package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via flatMapGroupsWithState — the
  * escape hatch for semantics the declarative window aggs can't express.
  *
  * Scale posture: state is partitioned by the group key like any keyed
  * shuffle; at 100 TB-of-stream the key must be a fingerprint (bounded
  * cardinality per partition) and production deployments should swap
  * NoTimeout for an event-time timeout so state ages out behind the
  * watermark.
  */
object StatefulOps {

  case class FpDoc(doc_id: Long, fp: String, text: String)

  /** Streaming exact dedup: emit only the first document seen per
    * fingerprint, across batches. Works identically on batch Datasets
    * (Spark runs the same state function per group). */
  def streamingDedup(docs: Dataset[FpDoc]): Dataset[FpDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[FpDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }

  case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, n_events: Long, total: Double,
      started: java.sql.Timestamp, last_seen: java.sql.Timestamp)

  /** Custom sessionization with an EVENT-TIME TIMEOUT: events accumulate into
    * per-user session state; when the watermark passes last_seen + gap the
    * state times out and the completed session is emitted. This is the
    * production custom-state shape — unlike NoTimeout, state cannot grow
    * unboundedly: it dies `gapMs` behind the watermark. The declarative
    * `session_window` (EventStream.sessionize) covers plain gap-merge;
    * this operator exists for semantics that need arbitrary state (e.g.
    * emit-on-close with custom aggregates).
    * Requires `withWatermark("ts", ...)` upstream on streaming input. */
  def sessionizeWithTimeout(events: Dataset[TimedEvent], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[TimedEvent], state: GroupState[Session]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed last_seen + gap: close and emit the session
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            // Fold events in event-time order. Both gap directions close:
            // an event more than gap AFTER last_seen closes the open session
            // and starts a new one (a later in-order event must not fuse two
            // gap-separated sessions), and a late event more than gap BEFORE
            // the open session's start is emitted as its own closed session
            // (it belongs to an earlier, already-gap-separated span — fusing
            // it would produce a session whose start postdates a member).
            // Late events within the gap of `started` extend the session
            // backwards.
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(sess) if e.ts.getTime > sess.last_seen.getTime + gapMs =>
                  closed += sess
                  open = Some(Session(uid, 1L, e.value, e.ts, e.ts))
                case Some(sess) if e.ts.getTime < sess.started.getTime - gapMs =>
                  closed += Session(uid, 1L, e.value, e.ts, e.ts)
                case Some(sess) =>
                  open = Some(sess.copy(n_events = sess.n_events + 1,
                    total = sess.total + e.value,
                    started = if (e.ts.before(sess.started)) e.ts else sess.started,
                    last_seen = if (e.ts.after(sess.last_seen)) e.ts else sess.last_seen))
                case None =>
                  open = Some(Session(uid, 1L, e.value, e.ts, e.ts))
              }
            }
            open.foreach { sess =>
              state.update(sess)
              state.setTimeoutTimestamp(sess.last_seen.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Running per-user event counter with capped emission: emits an updated
    * total per user per batch — a minimal custom-accumulator shape. */
  case class UserEvent(user_id: Long, value: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserTotal(uid, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }
}
