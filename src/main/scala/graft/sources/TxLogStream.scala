package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Streaming SOURCE over a [[TxLog]] ACID table — tail the commit log as
  * micro-batches, the Delta streaming-source shape (Armbrust et al. VLDB
  * 2020, §4.3 "Streaming reads"): the stream OFFSET is the log version, so
  * progress tracking, restart, and replay all ride the table's own commit
  * protocol rather than directory listings.
  *
  *   spark.readStream.format("txlog").load(tablePath)
  *
  * Batch semantics (deterministic in the offset range, which is what makes
  * checkpoint replay exact):
  *  - the INITIAL batch (no start offset) is the table SNAPSHOT at the
  *    first observed version — the live file set, i.e. full history with
  *    removals already folded in, so a table whose past contains
  *    overwrites/merges streams cleanly from scratch;
  *  - every later batch (start, end] is the union of files ADDED by the
  *    commits in that version range. Append commits are pure new data.
  *    `optimize` commits (file compaction) are SKIPPED — they rewrite
  *    bytes, not rows (Delta's `dataChange=false`), so skipping is exact.
  *    Any other rewrite commit (`overwrite`/`merge`) does not mean new
  *    data — its adds are rewritten old rows — so by default the source
  *    FAILS on one (`ignoreChanges=false`), naming the version; with
  *    `ignoreChanges=true` the rewrite's added files are emitted instead
  *    (re-emission of untouched rows in rewritten files is the documented
  *    caveat, exactly Delta's `ignoreChanges` contract — downstream must
  *    key-dedup, e.g. via [[TxLog.merge]] or `appendIdempotent` +
  *    window_latest).
  *
  *  VACUUM HORIZON: a batch reads the data files its version range named
  *  at commit time; `TxLog.vacuum` must not collect below a lagging
  *  stream's committed offset (same operational rule as Delta — retain at
  *  least the slowest reader's horizon via `retainVersions`/the grace
  *  window).
  *
  * Exactly-once END TO END: this source + [[graft.streaming.EventStream
  * .exactlyOnceTxLog]] gives table→table pipelines where a crash at any
  * point (mid-batch, between commit and checkpoint, zombie driver) neither
  * drops nor duplicates rows — the source replays a deterministic version
  * range and the sink's txn action dedups the replayed commit.
  *
  * Options: `ignoreChanges` (above); `maxVersionsPerTrigger` (cap versions
  * consumed per micro-batch — best-effort per driver JVM, the first batch
  * after a restart is uncapped because V1 sources learn the committed
  * offset only from the engine's first getBatch call);
  * `maxFilesPerTrigger` / `maxBytesPerTrigger` (Delta-parity byte/file
  * admission: a 100-commit backlog of fat commits must not plan one giant
  * batch — versions are admitted oldest-first while the accumulated batch
  * stays within BOTH caps, and the first data-carrying version always
  * admits so a single commit larger than a cap stays consumable; offsets
  * are version-granular, so caps round UP to whole commits. Bytes accept
  * `512m`/`1g` suffixes. Sizes come from the add-actions' recorded `size`
  * field — O(pending-commits) driver-side log reads, with a per-file stat
  * fallback only for legacy lines written before size recording. Same
  * best-effort restart caveat as maxVersionsPerTrigger); `startingVersion`
  * (tail-only mode: skip the initial snapshot and consume only commits
  * AFTER the given version — `startingVersion=latest-at-start` is the
  * "new data only" stream; the pinned start rides the offset log, so a
  * restart replays identically).
  *
  * SCALE posture: getOffset is one directory listing of `_txlog` (O(log
  * suffix) names, no data I/O); a batch plans a vanilla parquet scan over
  * exactly the named files — pushdown/pruning/AQE all apply; nothing on the
  * driver is O(rows). Commit json files are never deleted, so any
  * historical range stays replayable (vacuum only collects data files
  * outside the retained snapshots).
  *
  * API note: this implements the V1 `Source` contract
  * (`execution.streaming.Source`, the interface Spark's own
  * FileStreamSource implements, stable across 2.x–4.x) because it is the
  * one streaming-source API where a micro-batch is served as a file-backed
  * DataFrame; the public DSv2 MicroBatchStream would require hand-rolling
  * parquet `InternalRow` partition readers for no behavioral gain.
  */
class TxLogStreamProvider extends StreamSourceProvider with RelationProvider
    with CreatableRelationProvider with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "txlog"

  /** Streaming SINK: `df.writeStream.format("txlog").start(table)` — the
    * public path onto the exactly-once transactional append that
    * [[graft.streaming.EventStream.exactlyOnceTxLog]] exposes as an API
    * (same mechanism: each micro-batch commits with a `txn` action keyed by
    * (appId, batchId), so a replayed batch after any crash is a metadata
    * no-op — see [[TxLog.appendIdempotent]]). The transaction identity is
    * the `appId` option when given, else the query's `checkpointLocation`
    * (stable across restarts — exactly what the identity must be); a sink
    * with NEITHER is refused, because without a stable identity replayed
    * batches would duplicate. Append output mode only: Update/Complete
    * semantics need a key to merge on — use foreachBatch + [[TxLog.merge]]
    * (the streaming-MERGE shape) for that. Options: `stats`, `mergeSchema`
    * as on the batch writer. */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"txlog sink supports Append output mode only, got $outputMode " +
        "(for upserts use foreachBatch with TxLog.merge)")
    require(partitionColumns.isEmpty,
      "txlog sink does not partition output — drop .partitionBy(...) " +
        "(use the clusterBy write option on the batch writer for clustered layout)")
    val table = TxLogStreamSource.tableOf(parameters)
    val lower = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val appId = lower.get("appid").orElse(lower.get("checkpointlocation")).getOrElse(
      throw new IllegalArgumentException(
        "txlog sink needs a stable exactly-once identity: set option(\"appId\", ...) " +
          "or option(\"checkpointLocation\", ...)"))
    new TxLogSink(table, appId,
      lower.get("stats").filter(_.nonEmpty),
      lower.get("mergeschema").exists(_.toBoolean))
  }

  /** Batch read: `spark.read.format("txlog")[.option("versionAsOf"|
    * "startingVersion"|…, v)].load(table)` — see [[TxLogBatch]]. */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    TxLogBatch.relation(sqlContext, parameters)

  /** Batch write: `df.write.format("txlog").mode(…).save(table)` — the
    * transactional append/overwrite verbs (see [[TxLogBatch.write]]). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation =
    TxLogBatch.write(sqlContext, mode, parameters, data)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val lower = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val base = schema.getOrElse(
      TxLogStreamSource.inferSchema(sqlContext, TxLogStreamSource.tableOf(parameters)))
    val s =
      if (lower.get("readchangefeed").exists(_.toBoolean))
        TxLogCdfStreamSource.cdfSchema(base)
      else base
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val table = TxLogStreamSource.tableOf(parameters)
    // defensively case-fold: the engine passes a case-insensitive map on
    // current versions, but that is an implementation detail
    val lower = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val startingVersion = lower.get("startingversion").map {
      case "latest" => TxLog.latestVersion(table)
      case n        => n.toLong
    }
    if (lower.get("readchangefeed").exists(_.toBoolean)) {
      // STREAMING CDF (Delta's readChangeFeed streaming option): tail the
      // exact row-level change feed — every micro-batch is
      // readChangeFeed over its offset range, so a downstream incremental
      // consumer sees inserts/pre/post/delete rows with _commit_version
      require(!lower.contains("ignorechanges"),
        "readChangeFeed serves exact row-level changes — ignoreChanges " +
          "belongs to the row-append stream only")
      new TxLogCdfStreamSource(sqlContext, table,
        TxLogCdfStreamSource.cdfSchema(
          schema.getOrElse(TxLogStreamSource.inferSchema(sqlContext, table))),
        startingVersion = startingVersion.getOrElse(0L),
        maxVersionsPerTrigger = lower.get("maxversionspertrigger").map(_.toLong))
    } else new TxLogStreamSource(sqlContext, table,
      schema.getOrElse(TxLogStreamSource.inferSchema(sqlContext, table)),
      ignoreChanges = lower.get("ignorechanges").exists(_.toBoolean),
      maxVersionsPerTrigger = lower.get("maxversionspertrigger").map(_.toLong),
      startingVersion = startingVersion,
      maxFilesPerTrigger = lower.get("maxfilespertrigger").map { s =>
        val n = s.toLong
        require(n > 0, s"maxFilesPerTrigger must be positive, got $s"); n
      },
      maxBytesPerTrigger = lower.get("maxbytespertrigger")
        .map(TxLogStreamSource.parseByteString))
  }
}

/** The V1 sink behind `writeStream.format("txlog")`: every micro-batch is
  * one idempotent transactional append. The engine hands `addBatch` a
  * DataFrame wrapping its IncrementalExecution; it is rebound to a batch
  * frame over the already-planned rows (no re-analysis, no recomputation)
  * before the ordinary distributed parquet stage + commit. Exactly-once
  * holds across crash/replay AND zombie drivers — both are
  * [[TxLog.appendIdempotent]]'s contract, proven in TxSinkSpec. */
class TxLogSink(table: String, appId: String, stats: Option[String],
    mergeSchema: Boolean) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    TxLog.appendIdempotent(GraftBridge.rebatch(data), table, appId, batchId,
      statsCol = stats, mergeSchema = mergeSchema)
    ()
  }
  override def toString: String = s"TxLogSink[$table]"
}

object TxLogStreamSource {

  private[sources] def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "txlog source needs a table path: .load(<tablePath>)"))

  /** `"512m"`/`"2g"`-style byte strings (Delta's maxBytesPerTrigger
    * spelling), plain digits = bytes. */
  private[graft] def parseByteString(s: String): Long = {
    val t = s.trim.toLowerCase(java.util.Locale.ROOT)
    val (digits, mult) = t.takeWhile(c => c.isDigit) match {
      case d if d.length == t.length => (d, 1L)
      case d => (d, t.drop(d.length) match {
        case "b"          => 1L
        case "k" | "kb"   => 1L << 10
        case "m" | "mb"   => 1L << 20
        case "g" | "gb"   => 1L << 30
        case "t" | "tb"   => 1L << 40
        case suffix => throw new IllegalArgumentException(
          s"maxBytesPerTrigger: unknown byte suffix '$suffix' in '$s'")
      })
    }
    require(digits.nonEmpty, s"maxBytesPerTrigger: no digits in '$s'")
    val v = digits.toLong * mult
    require(v > 0, s"maxBytesPerTrigger must be positive, got $s")
    v
  }

  /** Schema = the log-recorded table schema when present (tables created
    * since schema tracking; a mid-stream evolution does NOT retype a
    * running stream — it keeps its at-start schema, and files carrying
    * later columns project them away), else the parquet schema of the
    * current snapshot's files (legacy tables). An empty legacy table
    * cannot self-describe — pass `.schema(...)` explicitly there. */
  private[sources] def inferSchema(sqlContext: SQLContext, table: String): StructType = {
    val snap = TxLog.snapshot(table)
    val phys = snap.schemaJson match {
      case Some(j) => TxLog.schemaOf(j)
      case None =>
        require(snap.files.nonEmpty,
          s"cannot infer schema of empty txlog table $table — pass .schema(...) explicitly")
        sqlContext.sparkSession.read.parquet(snap.files: _*).schema
    }
    // COLUMN MAPPING: the stream's public schema is the LOGICAL view
    if (snap.colmap.isEmpty) phys
    else {
      val byPhys = phys.fields.map(f => f.name -> f).toMap
      StructType(snap.colmap.collect {
        case (l, p) if byPhys.contains(p) => byPhys(p).copy(name = l)
      })
    }
  }
}

object TxLogCdfStreamSource {
  /** The feed schema: the table schema plus the change-metadata columns. */
  private[sources] def cdfSchema(base: StructType): StructType =
    StructType(base.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = true) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = true))
}

/** Streaming source over the EXACT row-level change feed (the streaming
  * half of W21's CDF story — Delta's `readChangeFeed` +`startingVersion`
  * stream): the offset is the log version, and every micro-batch is
  * [[TxLog.readChangeFeed]] over its (start, end] range — derived and
  * sidecar-recorded change rows stamped `_change_type` /
  * `_commit_version`. The feed over a pinned version range is a pure
  * function of immutable commits, sidecars, bitmaps and data files, so a
  * restarted stream replaying a checkpointed range reproduces it EXACTLY
  * — the same determinism argument as the row-append source, extended to
  * change evidence. A commit without evidence (a rewrite run without
  * `changeFeed = true`) fails the batch loudly BY VERSION, never serves
  * approximations; vacuum retention bounds the tailable horizon exactly
  * as it bounds the batch feed.
  *
  * `startingVersion` (default 0 = full history; "latest" = new changes
  * only) sets where the FIRST batch starts; later batches resume from the
  * checkpointed offset. Plans are the batch feed's (file scans +
  * broadcast attribution joins) with only the FILE leaves re-tagged
  * streaming — the attribution maps stay batch sides, so each join is a
  * supported stream-static join. */
class TxLogCdfStreamSource(sqlContext: SQLContext, table: String,
    override val schema: StructType, startingVersion: Long,
    maxVersionsPerTrigger: Option[Long]) extends Source {

  private var lastEnd: Long = -1L

  override def getOffset: Option[Offset] = synchronized {
    val tip = TxLog.latestVersion(table)
    if (tip < 1 || tip <= startingVersion) None
    else {
      val end = maxVersionsPerTrigger match {
        case Some(cap) if lastEnd >= 0 => math.min(tip, lastEnd + math.max(1L, cap))
        case _                         => tip
      }
      lastEnd = math.max(lastEnd, end)
      Some(LongOffset(end))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val hi = end match {
      case LongOffset(v) => v
      case other         => other.toString.toLong
    }
    synchronized { lastEnd = math.max(lastEnd, hi) }
    val lo = start match {
      case Some(LongOffset(v)) => v
      case Some(other)         => other.toString.toLong
      case None                => startingVersion
    }
    val feed = TxLog.readChangeFeed(sqlContext.sparkSession, table, lo, hi)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    org.apache.spark.sql.graftshim.StreamingFrames.asStreamingFiles(feed)
      .getOrElse(org.apache.spark.sql.graftshim.StreamingFrames
        .emptyStreaming(sqlContext.sparkSession, schema))
  }

  override def stop(): Unit = ()

  override def toString: String = s"TxLogCdfStreamSource[$table]"
}

class TxLogStreamSource(sqlContext: SQLContext, table: String,
    override val schema: StructType, ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Long],
    startingVersion: Option[Long] = None,
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None) extends Source {

  /** Last version handed to the engine (from getOffset or getBatch) — the
    * base the per-trigger cap advances from. -1 = unknown (fresh source;
    * the first answer is uncapped). Driver-side only, like every V1
    * source's internal progress state. */
  private var lastEnd: Long = -1L

  override def getOffset: Option[Offset] = synchronized {
    val tip = TxLog.latestVersion(table)
    // tail-only mode: nothing to emit until a commit lands PAST the start
    if (startingVersion.exists(tip <= _)) None
    else if (tip < 1) None
    else {
      val vCapped = maxVersionsPerTrigger match {
        case Some(cap) if lastEnd >= 0 => math.min(tip, lastEnd + math.max(1L, cap))
        case _                         => tip
      }
      val end = if (lastEnd < 0) vCapped else admitUpTo(vCapped)
      lastEnd = math.max(lastEnd, end)
      Some(LongOffset(end))
    }
  }

  /** FILE/BYTE admission (Delta's AdmissionLimits at commit granularity):
    * advance from `lastEnd` toward `maxV`, admitting whole versions
    * oldest-first while the accumulated batch stays within both caps.
    * Metadata-only commits (optimize/alter/constraints) are free. The first
    * DATA-carrying version always admits — a single commit larger than a
    * cap must still be consumable, it just gets a batch to itself. Cost:
    * O(pending commits) driver-side log-json reads per trigger, bounded by
    * the caps themselves once the stream is caught up; byte sizes come
    * from the add-actions' recorded `size` (stat fallback only for lines
    * from pre-size writers). */
  private def admitUpTo(maxV: Long): Long = {
    if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) return maxV
    var end = lastEnd
    var files = 0L
    var bytes = 0L
    var admittedData = false
    val metaOnly = Set("optimize", "alter", "addConstraint", "dropConstraint")
    for (c <- TxLog.changes(table, lastEnd, maxV)) {
      val n = if (metaOnly.contains(c.op)) 0 else c.added.length
      val sz =
        if (n == 0) 0L
        else c.added.zipAll(c.addedSizes, "", None).map {
          case (_, Some(s)) => s
          case (p, None) =>
            try java.nio.file.Files.size(java.nio.file.Paths.get(p))
            catch { case _: Exception => 0L }
        }.sum
      val over = n > 0 && admittedData &&
        (maxFilesPerTrigger.exists(files + n > _) ||
          maxBytesPerTrigger.exists(bytes + sz > _))
      if (over) return end
      files += n
      bytes += sz
      if (n > 0) admittedData = true
      end = c.version
    }
    maxV // everything fit (trailing never-committed slots consume for free)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val hi = versionOf(end)
    synchronized { lastEnd = math.max(lastEnd, hi) }
    val files = start match {
      case None if startingVersion.isDefined =>
        // tail-only: the first batch is the commits AFTER the pinned start,
        // no snapshot — deterministic on replay for the same (start, hi)
        changesIn(startingVersion.get, hi)
      case None =>
        // initial batch: the snapshot AT hi — removals folded in, exact on
        // replay because hi is pinned in the stream's offset log
        TxLog.snapshot(table, hi).files
      case Some(lo) => changesIn(versionOf(lo), hi)
    }
    // getBatch must hand the engine an isStreaming-tagged plan; the shim
    // re-tags the ordinary parquet scan (see StreamingFrames' scaladoc)
    if (files.isEmpty)
      org.apache.spark.sql.graftshim.StreamingFrames.emptyStreaming(
        sqlContext.sparkSession, schema)
    else org.apache.spark.sql.graftshim.StreamingFrames.asStreaming(
      TxLog.toLogicalDf(
        sqlContext.sparkSession.read.schema(readSchema).parquet(files: _*),
        colmapAtStart))
  }

  // COLUMN MAPPING, pinned at stream start (like the schema discipline:
  // a mid-stream ALTER does not retype a running stream): files carry
  // PHYSICAL names, so the scan reads the physical log schema and the
  // projection presents the logical view the source declared.
  private val colmapAtStart: Seq[(String, String)] = TxLog.columnMapping(table)
  private val readSchema: StructType =
    if (colmapAtStart.isEmpty) schema
    else TxLog.snapshot(table).schemaJson.map(TxLog.schemaOf).getOrElse(schema)

  private def changesIn(lo: Long, hi: Long): Seq[String] =
    TxLog.changes(table, lo, hi).flatMap { c =>
      if (c.op == "append") c.added
      // optimize commits rewrite bytes, not rows (dataChange=false):
      // skipping them is exact, never a caveat
      else if (c.op == "optimize") Seq.empty
      // metadata-only OPS carry no rows by definition — skipping is exact.
      // Op-based, NOT added.isEmpty: a remove-only rewrite (a truncating
      // restore) changes rows and must still fail loudly below
      else if (c.op == "addConstraint" || c.op == "dropConstraint") Seq.empty
      // alter commits carry no rows either, but a mid-stream DROP or RENAME
      // of a streamed column would silently keep serving the dropped
      // column's bytes / the stale logical name under the pinned at-start
      // mapping — fail the stream (restart picks up the new schema). PURE
      // ADDITIONS (ADD COLUMN, generated or not, and enabling an identity
      // mapping) keep every pinned (logical → physical) pair valid and
      // stream on: the new column simply isn't in this stream's schema.
      //
      // The gate classifies THE COMMIT ITSELF — the pairs present at
      // c.version − 1 and gone at c.version — and fails only when that
      // delta touches a pair this stream pinned at start. Comparing the
      // pin against the commit's as-of state instead (the r14 shape) was
      // a checkpoint wedge: after a RENAME, a restarted stream replaying
      // any EARLIER purely-additive alter threw on that older commit on
      // every restart — the post-rename pin is never a subset of a
      // pre-rename as-of mapping, and the error's own remedy (restart)
      // could never succeed.
      else if (c.op == "alter") {
        val pinned =
          if (colmapAtStart.nonEmpty) colmapAtStart.toSet
          else readSchema.fieldNames.map(n => (n, n)).toSet
        // identity fallback uses the schema AS OF that version, not the
        // current one — alter commits always record a mapping, so the
        // fallback only fires for versions before mapping was enabled.
        // Before v1 no column existed at all (empty set, NOT the current
        // schema: an alter in the very first slot can have dropped
        // nothing, and the current-schema fallback would fabricate a
        // delta for every column added since).
        def mappingAt(v: Long): Set[(String, String)] =
          if (v < 1) Set.empty
          else TxLog.columnMapping(table, asOf = v) match {
            case Seq() =>
              TxLog.snapshot(table, v).schemaJson.map(TxLog.schemaOf)
                .getOrElse(readSchema).fieldNames.map(n => (n, n)).toSet
            case m => m.toSet
          }
        val gone = (mappingAt(c.version - 1) -- mappingAt(c.version)) & pinned
        if (gone.nonEmpty) throw new IllegalStateException(
          s"txlog stream on $table hit a non-additive schema change at " +
            s"version ${c.version} (rename or drop of a streamed column: " +
            s"${gone.map(_._1).mkString(", ")}). The stream " +
            "serves the column mapping pinned at its start; restart the " +
            "stream to adopt the new schema.")
        Seq.empty
      }
      else if (ignoreChanges) c.added
      else throw new IllegalStateException(
        s"txlog stream on $table hit a ${c.op} commit at version ${c.version}: " +
          "a rewrite's adds are rewritten old rows, not new data. Set " +
          "ignoreChanges=true to emit them (downstream must key-dedup).")
    }

  private def versionOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other         => other.toString.toLong // engine-deserialized json
  }

  override def stop(): Unit = ()

  override def toString: String = s"TxLogStreamSource[$table]"
}
