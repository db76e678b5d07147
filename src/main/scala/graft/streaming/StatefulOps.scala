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

  /** Custom sessionization with an EVENT-TIME TIMEOUT: per-user events merge
    * into gap-separated sessions; a session is emitted only once the
    * watermark passes its last_seen + gap, so out-of-order events within the
    * watermark delay land in the right session (including bridging two
    * sessions into one). State holds the LIST of still-open sessions — with
    * late data, several disjoint spans can be open at once — and cannot grow
    * unboundedly: every span dies gapMs behind the watermark. The
    * declarative `session_window` (EventStream.sessionize) covers plain
    * gap-merge; this operator exists for semantics that need arbitrary
    * state (emit-on-close with custom aggregates).
    * Requires `withWatermark("ts", ...)` upstream on streaming input. */
  def sessionizeWithTimeout(events: Dataset[TimedEvent], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[TimedEvent], state: GroupState[List[Session]]) =>
          val wm = state.getCurrentWatermarkMs()
          var sessions = state.getOption.getOrElse(Nil)
          if (!(rows.isEmpty && state.hasTimedOut)) {
            // Merge each event into every session within gap of it — an
            // event can bridge two previously-disjoint sessions, which then
            // merge into one.
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val (near, far) = sessions.partition(s =>
                e.ts.getTime >= s.started.getTime - gapMs &&
                  e.ts.getTime <= s.last_seen.getTime + gapMs)
              val merged = near.foldLeft(Session(uid, 1L, e.value, e.ts, e.ts)) {
                (acc, s) =>
                  Session(uid, acc.n_events + s.n_events, acc.total + s.total,
                    if (s.started.before(acc.started)) s.started else acc.started,
                    if (s.last_seen.after(acc.last_seen)) s.last_seen else acc.last_seen)
              }
              sessions = merged :: far
            }
          }
          // Emit every session the watermark has sealed (no event that could
          // still arrive can extend it); keep the rest open.
          val (done, open) = sessions.partition(s => s.last_seen.getTime + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            state.setTimeoutTimestamp(open.map(_.last_seen.getTime).min + gapMs)
          }
          done.sortBy(_.started.getTime).iterator
      }
  }

  case class BandedDoc(doc_id: Long, band: Int, key: String, embedding: Array[Float])
  case class NearDupMatch(doc_id: Long, matched_id: Long)

  /** Streaming SEMANTIC near-dup detection: the online twin of
    * `api.Similarity.lshCosineNearDup`. Input rows are (doc, band, key,
    * embedding) — one row per band from the SAME BandKeys projection the
    * batch path uses (see StreamingSampleSpec for the wiring) — grouped by
    * (band, key), so state shards across exactly the candidate buckets the
    * batch join would build. Per bucket the state holds the (id, embedding)
    * list seen so far; a new arrival emits a match per stored neighbor
    * within `tau` cosine, then appends itself.
    *
    * A pair colliding in several bands emits once per collision — dedupe
    * downstream if exact-once pairs matter (the batch path's distinct()).
    * `maxPerBucket` bounds state in hot buckets (oldest kept — the ids that
    * can still match the most future arrivals are the ones already seen by
    * every earlier arrival, and FIFO keeps emission deterministic); with the
    * adaptive band geometry bits track log2(n), so bucket occupancy stays
    * ~constant and the cap is a backstop, not the mechanism. Production
    * deployments should additionally swap NoTimeout for an event-time
    * timeout per the class doc. */
  def streamingNearDupLsh(docs: Dataset[BandedDoc], tau: Double,
      maxPerBucket: Int = 1024): Dataset[NearDupMatch] = {
    require(tau > -1 && tau < 1, s"tau must be in (-1,1), got $tau")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandedDoc],
            state: GroupState[List[(Long, Array[Float])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[NearDupMatch]
          // batch arrival order is nondeterministic, so process in id order:
          // emissions depend only on the SET of rows per batch, not a race
          for (d <- rows.toSeq.sortBy(_.doc_id)) {
            val nn = math.sqrt(d.embedding.foldLeft(0.0)((a, x) => a + x.toDouble * x))
            for ((oid, oemb) <- seen if oid != d.doc_id) {
              var dot = 0.0
              var i = 0
              val n = math.min(d.embedding.length, oemb.length)
              while (i < n) { dot += d.embedding(i).toDouble * oemb(i); i += 1 }
              val on = math.sqrt(oemb.foldLeft(0.0)((a, x) => a + x.toDouble * x))
              if (nn > 0 && on > 0 && dot / (nn * on) >= tau)
                out += NearDupMatch(d.doc_id, oid)
            }
            if (seen.size < maxPerBucket && !seen.exists(_._1 == d.doc_id))
              seen = seen :+ ((d.doc_id, d.embedding))
          }
          state.update(seen)
          out.result().iterator
      }
  }

  case class BandedFp(doc_id: Long, band: Int, key: Long, fp: Long)

  /** Streaming HAMMING near-dup — the online twin of
    * `ops.Hamming.nearDupPairs` (pigeonhole banding over integer
    * fingerprints: SimHash signatures, image dHashes). Input rows are
    * (doc, band, key, fp) — one row per pigeonhole block from the SAME
    * `Hamming.bandRows` projection the batch join uses — grouped by
    * (band, key), so state shards across exactly the candidate buckets the
    * batch join would build. A new arrival emits a match per stored
    * fingerprint within `maxDist` bits, then appends itself.
    *
    * Because the banding is LOSSLESS (any ≤maxDist pair shares a block),
    * the union of emissions over all buckets is the batch pair set exactly
    * — dedupe downstream when a pair collides in several blocks (the batch
    * path's distinct()). `maxPerBucket` bounds state in degenerate buckets
    * (oldest kept, FIFO — deterministic emission); at the 64/3 production
    * geometry a bucket key is 16 bits of fingerprint, so real-corpus
    * occupancy is df(key) and the cap is a backstop. Production swaps
    * NoTimeout for an event-time timeout per the class doc. */
  def streamingNearDupHamming(fps: Dataset[BandedFp], bits: Int, maxDist: Int,
      maxPerBucket: Int = 4096): Dataset[NearDupMatch] = {
    require(bits > 0 && bits <= 64, s"bits must be in 1..64, got $bits")
    require(maxDist >= 0 && maxDist < bits,
      s"maxDist must be in 0..${bits - 1}, got $maxDist")
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val spark = fps.sparkSession
    import spark.implicits._
    fps.groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandedFp],
            state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[NearDupMatch]
          // batch arrival order is nondeterministic, so process in id order:
          // emissions depend only on the SET of rows per batch, not a race
          for (d <- rows.toSeq.sortBy(_.doc_id)) {
            for ((oid, ofp) <- seen if oid != d.doc_id)
              if (java.lang.Long.bitCount((d.fp ^ ofp) & mask) <= maxDist)
                out += NearDupMatch(d.doc_id, oid)
            if (seen.size < maxPerBucket && !seen.exists(_._1 == d.doc_id))
              seen = seen :+ ((d.doc_id, d.fp))
          }
          state.update(seen)
          out.result().iterator
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

  case class BudgetDoc(doc_id: Long, group: String, n_tok: Long)
  case class AdmittedDoc(doc_id: Long, group: String, n_tok: Long, cum_tok: Long)

  /** Streaming token-budget admission — the ingestion-time twin of the
    * batch mixture materialization (Sampling.mixtureByBudget / Z17): per
    * group (language/source), admit arriving docs while the group's
    * cumulative token total stays within its budget; everything after the
    * budget fills is dropped, unlisted groups drop entirely. State per
    * group is ONE long (the running total) — bounded by group cardinality,
    * not stream length.
    *
    * Ordering contract: a stream has no global order, so admission is
    * FIRST-ARRIVAL within each group (per micro-batch, iterator order).
    * That is the honest streaming semantics — the batch op's (hash, id)
    * order needs the whole corpus. Batch parity therefore holds exactly
    * when the batch frame is fed in the batch op's admission order
    * (StreamingPipelineSpec pins this: same input order → same admitted
    * set and same cumulative totals as mixtureByBudget).
    */
  def streamingBudgetAdmission(docs: Dataset[BudgetDoc],
      budgets: Map[String, Long]): Dataset[AdmittedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[BudgetDoc], state: GroupState[Long]) =>
          budgets.get(group) match {
            case None => Iterator.empty
            case Some(budget) =>
              var cum = state.getOption.getOrElse(0L)
              val out = scala.collection.mutable.ArrayBuffer.empty[AdmittedDoc]
              for (d <- rows) {
                // EVERY arrival advances the inclusive running total and a
                // doc is admitted iff its own inclusive total fits — the
                // batch op's exact prefix rule (a too-big doc ends the
                // group's admissions, it does not skip-and-continue)
                cum += d.n_tok
                if (cum <= budget) out += AdmittedDoc(d.doc_id, d.group, d.n_tok, cum)
              }
              state.update(cum)
              out.iterator
          }
      }
  }

}
