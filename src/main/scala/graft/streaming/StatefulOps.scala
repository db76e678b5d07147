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
