package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exact._

/** Structured Streaming surface (SURVEY.md §2.9 X6).
  *
  * The reference has zero streaming (batch re-scrape + append,
  * /root/reference/web_scraper.py:1288); these are the streaming twins of the
  * batch operators so the same logical aggregations run over `readStream`
  * sources. The batch `events_window` query in TextQueries uses the identical
  * groupBy(window(...)) aggregation — Catalyst plans both; only the sink and
  * watermark differ.
  *
  * Scale posture: event-time tumbling windows + watermark bound state size;
  * the aggregation is keyed by (window, event_type) so state partitions by
  * the shuffle key like any streaming agg. For sessionization-style custom
  * state, use [[sessionize]] (flatMapGroupsWithState would be the next step;
  * session_window covers the common case declaratively).
  */
object EventStream {

  /** Tumbling 1-hour window counts/sums with a 2-hour watermark.
    * Works on both batch and streaming DataFrames with schema
    * (ts timestamp, event_type string, value double). */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n_events"),
        col("total_value"))

  /** Exactly-once parquet sink: foreachBatch + dynamic-partition overwrite
    * into a `batch_id=<n>` directory. After a failure, Structured Streaming
    * replays the last uncommitted micro-batch with the SAME batch id, and the
    * overwrite replaces that one partition instead of appending duplicates —
    * the standard idempotent-sink pattern for file stores without
    * transactions (checkpoint tracks offsets; the partition overwrite makes
    * the write side effect replay-safe). Scale posture: each micro-batch is
    * an independent partitioned write; downstream readers see append-only
    * batch_id partitions and can compact asynchronously. */
  def exactlyOnceParquet(df: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatch(batch.toDF(), path, id)
      }
      .start()

  /** The foreachBatch body, separated so idempotence is directly testable:
    * running it twice with the same batch id must leave one copy. */
  private[streaming] def writeBatch(batch: DataFrame, path: String, id: Long): Unit = {
    val spark = batch.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try batch.withColumn("batch_id", lit(id))
      .write.mode("overwrite").partitionBy("batch_id").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Exactly-once TRANSACTIONAL sink: foreachBatch into a [[graft.sources.
    * TxLog]] ACID table, batch id = the log's streaming-transaction version
    * (the Delta-log `txn` pattern). Stronger than [[exactlyOnceParquet]]:
    * replaying the last uncommitted micro-batch after a crash is detected
    * against the table's OWN commit log (not the layout of a partition
    * directory) and skipped as a metadata no-op, concurrent zombie drivers
    * of a restarted query cannot double-commit (slot-bound optimistic
    * concurrency in `appendIdempotent`), and readers of the table get
    * snapshot isolation + time travel over the stream's whole history.
    * Scale posture: each micro-batch is one ordinary distributed parquet
    * job + one driver-side hard-link commit; the log grows O(batches) and
    * compacts on the checkpoint cadence.
    *
    * `appId` must be stable across restarts of the same logical query (and
    * distinct between different queries writing the same table) — reusing
    * the Spark checkpoint location string is the natural choice. */
  def exactlyOnceTxLog(df: DataFrame, table: String, checkpoint: String,
      appId: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sources.TxLog.appendIdempotent(batch.toDF(), table, appId, id)
        ()
      }
      .start()

  /** Streaming MERGE (upsert) sink: foreachBatch → [[graft.sources.TxLog
    * .merge]] on `keyCol` — the CDC-ingestion shape (Delta's foreachBatch-
    * merge recipe): each micro-batch's rows replace same-key rows of the
    * table and insert new keys, with the file-scoped rewrite bounding the
    * I/O to files an update key can live in. Replay safety here comes from
    * SEMANTIC idempotence rather than the txn action: re-merging the same
    * batch maps every key to the same final row, so a crash-replayed batch
    * leaves the table bit-identical (duplicate VERSIONS may appear in
    * history; rows never duplicate). Batches carrying several rows per key
    * should pre-reduce (e.g. window_latest) — merge applies a batch as one
    * set. */
  def upsertTxLog(df: DataFrame, table: String, checkpoint: String,
      keyCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) { graft.sources.TxLog.merge(batch.toDF(), table, keyCol); () }
      }
      .start()

  /** Session windows per user: events within `gap` of each other merge into
    * one session (declarative session_window — no manual state needed). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Watermarked STREAM-STREAM interval join — the attribution shape: every
    * `clicks` event joined to each same-user `views` event at most `gap`
    * before it. Both sides carry a watermark and the join condition bounds
    * the two event times against each other, which is exactly what
    * Structured Streaming requires to EXPIRE join state: a buffered view
    * can only match clicks in [v_ts, v_ts + gap], so once the click
    * watermark passes that bound the row leaves the state store — without
    * the time bound the state would grow forever and Spark rejects the
    * plan in append mode. Works identically on batch frames (the spec's
    * parity oracle). Inputs need (user_id, event_id, ts); output one row
    * per attributed (click, view) pair. */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
      gap: String = "10 minutes", watermark: String = "30 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("event_id").as("view_id")).withWatermark("v_ts", watermark)
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("event_id").as("click_id")).withWatermark("c_ts", watermark)
    c.join(v, expr(
        s"c_user = v_user AND v_ts <= c_ts AND c_ts <= v_ts + interval $gap"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("v_ts"), col("c_ts"))
  }
}
