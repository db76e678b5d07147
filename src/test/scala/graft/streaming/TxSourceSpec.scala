package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec
import graft.sources.TxLog

/** The txlog streaming SOURCE: offset = commit-log version, initial batch =
  * snapshot, later batches = appended files; rewrite commits are refused by
  * default (ignoreChanges opts into Delta-style re-emission). The flagship
  * contract is source + transactional sink composing into an exactly-once
  * table→table pipeline that survives restart. */
class TxSourceSpec extends SparkSpec {

  private def freshTable(name: String): String =
    Files.createTempDirectory(s"txsrc_$name").resolve("t").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def pairs(d: DataFrame): Set[(Long, String)] =
    d.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("initial batch is the snapshot (rewrites folded in); appends tail on") {
    val t = freshTable("tail")
    TxLog.append(df(1L -> "a", 2L -> "b", 3L -> "c"), t, statsCol = Some("k"))
    TxLog.merge(df(2L -> "B"), t, "k") // pre-history rewrite: must NOT trip strict mode
    TxLog.append(df(4L -> "d"), t)
    val q = spark.readStream.format("txlog").load(t)
      .writeStream.format("memory").queryName("txsrc_tail")
      .option("checkpointLocation", Files.createTempDirectory("txsrc_tail_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(pairs(spark.table("txsrc_tail")) ==
        Set(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
      TxLog.append(df(5L -> "e"), t)
      TxLog.append(df(6L -> "f"), t)
      q.processAllAvailable()
      assert(pairs(spark.table("txsrc_tail")) ==
        Set(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d", 5L -> "e", 6L -> "f"))
    } finally q.stop()
  }

  test("exactly-once table-to-table pipeline survives restart") {
    val src = freshTable("pipe_src")
    val dst = freshTable("pipe_dst")
    val ckpt = Files.createTempDirectory("txsrc_pipe_ck").toString
    TxLog.append(df(1L -> "a", 2L -> "b"), src)
    def run() = EventStream.exactlyOnceTxLog(
      spark.readStream.format("txlog").load(src)
        .withColumn("v", upper(col("v"))),
      dst, ckpt, appId = "pipe")
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    assert(pairs(TxLog.snapshot(dst).read(spark)) == Set(1L -> "A", 2L -> "B"))

    // crash/redeploy: new data lands, old batches are not re-landed
    TxLog.append(df(3L -> "c"), src)
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(pairs(TxLog.snapshot(dst).read(spark)) ==
      Set(1L -> "A", 2L -> "B", 3L -> "C"))
    // a third restart with nothing new is a pure no-op
    val q3 = run()
    try q3.processAllAvailable() finally q3.stop()
    assert(pairs(TxLog.snapshot(dst).read(spark)) ==
      Set(1L -> "A", 2L -> "B", 3L -> "C"))
  }

  test("streaming CDF tails the exact feed; a restart resumes exactly-once") {
    import spark.implicits._
    val t = freshTable("cdf")
    val dst = freshTable("cdf_dst")
    val ckpt = Files.createTempDirectory("txsrc_cdf_ck").toString
    // ten rows so the DV fraction guard never forces a rewrite here
    TxLog.append(df((1L to 10L).map(i => i -> s"r$i"): _*)
      .repartition(1), t, statsCol = Some("k"))                           // v1
    TxLog.delete(spark, t, col("k") === 1L, useDV = true)                 // v2
    // memory sink cannot recover a checkpoint — land the feed in a txlog
    // table (the real downstream-consumer shape) for the restart proof
    def run() = spark.readStream.format("txlog")
      .option("readChangeFeed", "true").load(t)
      .writeStream.format("txlog").option("appId", "cdfpipe")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start(dst)
    def got: Set[(Long, String, String, Long)] =
      TxLog.snapshot(dst).read(spark)
        .select("k", "v", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val q1 = run()
    try {
      q1.processAllAvailable()
      val inserts = (1L to 10L).map(i => (i, s"r$i", "insert", 1L)).toSet
      assert(got == inserts + ((1L, "r1", "delete", 2L)))
    } finally q1.stop()
    // new changes while the stream is DOWN; the restart picks up ONLY them
    TxLog.update(spark, t, col("k") === 2L, Map("v" -> lit("B")),
      useDV = true)                                                       // v3
    val q2 = run()
    try {
      q2.processAllAvailable()
      val inserts = (1L to 10L).map(i => (i, s"r$i", "insert", 1L)).toSet
      assert(got == inserts ++ Set(
        (1L, "r1", "delete", 2L),
        (2L, "r2", "update_preimage", 3L), (2L, "B", "update_postimage", 3L)))
      // and the stream total matches the batch feed over the same range
      val batch = TxLog.readChangeFeed(spark, t, 0L)
        .select("k", "v", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      assert(got == batch)
    } finally q2.stop()
  }

  test("streaming CDF from startingVersion=latest emits only new changes") {
    import spark.implicits._
    val t = freshTable("cdftail")
    TxLog.append(df(1L -> "a"), t, statsCol = Some("k"))                  // v1
    val q = spark.readStream.format("txlog")
      .option("readChangeFeed", "true").option("startingVersion", "latest")
      .load(t)
      .writeStream.format("memory").queryName("txsrc_cdftail")
      .option("checkpointLocation",
        Files.createTempDirectory("txsrc_cdftail_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("txsrc_cdftail").count() == 0L, "history skipped")
      TxLog.append(df(2L -> "b"), t)                                      // v2
      q.processAllAvailable()
      val rows = spark.table("txsrc_cdftail")
        .select("k", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((2L, "insert", 2L)))
    } finally q.stop()
  }

  test("mid-stream rewrite fails strict mode; ignoreChanges re-emits its adds") {
    val t = freshTable("rewrite")
    TxLog.append(df(1L -> "a", 2L -> "b"), t, statsCol = Some("k"))
    val strict = spark.readStream.format("txlog").load(t)
      .writeStream.format("memory").queryName("txsrc_strict")
      .option("checkpointLocation", Files.createTempDirectory("txsrc_strict_ck").toString)
      .outputMode("append").start()
    try {
      strict.processAllAvailable()
      TxLog.merge(df(2L -> "B"), t, "k")
      val e = intercept[StreamingQueryException] { strict.processAllAvailable() }
      def causes(x: Throwable): List[Throwable] =
        if (x == null) Nil else x :: causes(x.getCause)
      assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("merge commit")),
        s"expected the rewrite refusal, got: ${causes(e).map(_.getMessage)}")
    } finally {
      // stop() rethrows the terminal failure of an already-failed query
      try strict.stop() catch { case _: StreamingQueryException => () }
    }

    // ignoreChanges: the merge's added files are emitted; untouched rows in
    // rewritten files re-emit (the documented Delta-ignoreChanges caveat)
    val loose = spark.readStream.format("txlog")
      .option("ignoreChanges", "true").load(t)
      .writeStream.format("memory").queryName("txsrc_loose")
      .option("checkpointLocation", Files.createTempDirectory("txsrc_loose_ck").toString)
      .outputMode("append").start()
    try {
      loose.processAllAvailable() // initial snapshot: (1,a) (2,B)
      TxLog.merge(df(1L -> "A"), t, "k")
      loose.processAllAvailable()
      val got = spark.table("txsrc_loose").select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got.contains(1L -> "A"), s"merge's new row must stream through, got $got")
      assert(TxLog.snapshot(t).read(spark).count() == 2)
    } finally loose.stop()
  }

  test("mid-stream RENAME fails the stream; ADD COLUMN (incl. generated) streams on") {
    // the stream pins the column mapping at start: a later DROP/RENAME of a
    // streamed column would silently serve stale names or dropped bytes, so
    // the source must fail loudly (restart adopts the new schema). Pure
    // additions keep every pinned (logical → physical) pair valid.
    import org.apache.spark.sql.types.IntegerType
    val t = freshTable("alter")
    TxLog.append(df(1L -> "a"), t, statsCol = Some("k"))
    val q = spark.readStream.format("txlog").load(t)
      .writeStream.format("memory").queryName("txsrc_alter")
      .option("checkpointLocation", Files.createTempDirectory("txsrc_alter_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // additive alters: plain ADD COLUMN and a generated column — both fine
      TxLog.addColumn(t, "w", org.apache.spark.sql.types.StringType)
      TxLog.addGeneratedColumn(spark, t, "v_len", IntegerType, "length(v)")
      TxLog.append(df(2L -> "b"), t)
      q.processAllAvailable()
      assert(spark.table("txsrc_alter").count() == 2L,
        "additive alters must not interrupt the stream")
      // non-additive: rename a streamed column → the stream must fail
      TxLog.renameColumn(t, "v", "val")
      TxLog.append(df(3L -> "c").withColumnRenamed("v", "val"), t)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def causes(x: Throwable): List[Throwable] =
        if (x == null) Nil else x :: causes(x.getCause)
      assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("non-additive schema change")),
        s"expected the rename refusal, got: ${causes(e).map(_.getMessage)}")
    } finally {
      try q.stop() catch { case _: StreamingQueryException => () }
    }
  }

  test("restart after RENAME replays an older additive alter without wedging") {
    // the r14 gate compared the mapping pinned at (re)start against the
    // mapping AS OF each replayed alter commit: after a RENAME, a restarted
    // stream whose uncommitted replay range contained any EARLIER (purely
    // additive) alter threw 'non-additive schema change' on that older
    // commit on every restart — the post-rename pin is never a subset of a
    // pre-rename as-of mapping, so the error's own remedy (restart) could
    // never succeed and the checkpoint was permanently wedged. The gate now
    // classifies each commit by its OWN delta, so the replay sails through
    // and the restarted stream serves the new schema.
    val t = freshTable("wedge")
    TxLog.append(df(1L -> "a"), t, statsCol = Some("k"))                   // v1
    val ck = Files.createTempDirectory("txsrc_wedge_ck").toString
    // memory sink cannot recover a checkpoint — land in txlog tables (the
    // restarted stream carries the NEW schema, so it lands in a second one)
    val out1 = freshTable("wedgeout1")
    val q1 = spark.readStream.format("txlog").load(t)
      .writeStream.format("txlog").option("checkpointLocation", ck)
      .outputMode("append").start(out1)
    try { q1.processAllAvailable() } finally q1.stop()                     // consumed v1
    TxLog.addColumn(t, "w", org.apache.spark.sql.types.StringType)         // v2 additive
    TxLog.renameColumn(t, "v", "val")                                      // v3 rename
    TxLog.append(df(2L -> "b").withColumnRenamed("v", "val"), t)           // v4
    val out2 = freshTable("wedgeout2")
    val q2 = spark.readStream.format("txlog").load(t)
      .writeStream.format("txlog").option("checkpointLocation", ck)
      .outputMode("append").start(out2)
    try {
      q2.processAllAvailable() // replay range (v1, v4] holds BOTH alters
      val got = TxLog.snapshot(out2).read(spark).select("k", "val").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set(2L -> "b"),
        s"restart must replay past the old additive alter and serve v4, got $got")
    } finally {
      try q2.stop() catch { case _: StreamingQueryException => () }
    }
  }

  test("mid-stream CHECK constraint add streams on (write-side gate; reads unaffected)") {
    // addConstraint changes what future WRITERS must prove, not what any
    // committed file means — a tailing reader is unaffected, so the source
    // skips the row-less commit and streams on (same discipline as the
    // additive-alter rule above; pinned here so a future refactor cannot
    // silently turn it into a stream-killer).
    val t = freshTable("consadd")
    TxLog.append(df(1L -> "a"), t, statsCol = Some("k"))
    val q = spark.readStream.format("txlog").load(t)
      .writeStream.format("memory").queryName("txsrc_consadd")
      .option("checkpointLocation", Files.createTempDirectory("txsrc_consadd_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      TxLog.addConstraint(spark, t, "v_nonempty", "length(v) > 0")
      TxLog.append(df(2L -> "b"), t)
      q.processAllAvailable()
      assert(spark.table("txsrc_consadd").count() == 2L,
        "a CHECK-constraint add must not interrupt the stream")
    } finally q.stop()
  }

  test("strict stream fails ignoreChanges message names the option") {
    // the refusal message must tell the operator the escape hatch
    val t = freshTable("msg")
    TxLog.append(df(1L -> "a"), t)
    TxLog.overwrite(df(1L -> "A"), t)
    val e = intercept[IllegalStateException] {
      new graft.sources.TxLogStreamSource(spark.sqlContext, t,
        TxLog.snapshot(t).read(spark).schema, ignoreChanges = false,
        maxVersionsPerTrigger = None)
        .getBatch(
          Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(1L)),
          org.apache.spark.sql.execution.streaming.runtime.LongOffset(2L))
    }
    assert(e.getMessage.contains("ignoreChanges=true"))
  }

  test("optimize compacts the streaming sink's small files; strict streams skip it") {
    val t = freshTable("opt")
    // the small-file swamp a micro-batch sink leaves behind: 6 tiny commits
    for (b <- 0L until 6L)
      TxLog.appendIdempotent(df(b -> s"v$b"), t, "writer", b, statsCol = Some("k"))
    val before = TxLog.snapshot(t)
    assert(before.files.size >= 6, s"expected one+ file per batch, got ${before.files.size}")

    // a strict tailing stream is live across the optimize
    val q = spark.readStream.format("txlog").load(t)
      .writeStream.format("memory").queryName("txsrc_opt")
      .option("checkpointLocation", Files.createTempDirectory("txsrc_opt_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("txsrc_opt").count() == 6)

      val v = TxLog.optimize(spark, t, targetBytes = 1L << 30, statsCol = Some("k"))
      assert(v == before.version + 1, "optimize must commit one new version")
      // rows unchanged, file count collapsed
      val after = TxLog.snapshot(t)
      assert(after.files.size < before.files.size)
      assert(pairs(after.read(spark)) == pairs(before.read(spark)))
      // content-neutral for the stream: no failure, no re-emission
      q.processAllAvailable()
      assert(spark.table("txsrc_opt").count() == 6)
      // and appends keep flowing afterwards
      TxLog.append(df(100L -> "new"), t)
      q.processAllAvailable()
      assert(spark.table("txsrc_opt").count() == 7)
    } finally q.stop()

    // time travel below the optimize still reads the pre-compaction files
    assert(pairs(TxLog.snapshot(t, before.version).read(spark)) ==
      (0L until 6L).map(b => b -> s"v$b").toSet)
    // compacted output keeps file stats, so file-scoped merge still prunes
    assert(TxLog.merge(df(0L -> "V0"), t, "k") > 0)
    assert(pairs(TxLog.snapshot(t).read(spark)) ==
      ((1L until 6L).map(b => b -> s"v$b").toSet + (0L -> "V0") + (100L -> "new")))
  }

  test("optimize below minFiles or target is a no-op") {
    val t = freshTable("optnoop")
    TxLog.append(df(1L -> "a"), t)
    assert(TxLog.optimize(spark, t) == 0L) // one file: nothing to compact
    TxLog.append(df(2L -> "b"), t)
    assert(TxLog.optimize(spark, t, targetBytes = 1L) == 0L) // none under target
    assert(TxLog.latestVersion(t) == 2L)
  }

  test("startingVersion=latest streams only commits after stream start") {
    val t = freshTable("tail_only")
    TxLog.append(df(1L -> "old"), t)
    TxLog.append(df(2L -> "old"), t)
    val q = spark.readStream.format("txlog")
      .option("startingVersion", "latest").load(t)
      .writeStream.format("memory").queryName("txsrc_tailonly")
      .option("checkpointLocation", Files.createTempDirectory("txsrc_to_ck").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("txsrc_tailonly").count() == 0,
        "history before the start must not be emitted")
      TxLog.append(df(3L -> "new"), t)
      q.processAllAvailable()
      assert(pairs(spark.table("txsrc_tailonly")) == Set(3L -> "new"))
    } finally q.stop()
  }

  test("upsertTxLog: streaming CDC merge keeps latest per key across restart") {
    import org.apache.spark.sql.types._
    val in = Files.createTempDirectory("txup_in")
    val ckpt = Files.createTempDirectory("txup_ck").toString
    val t = freshTable("upsert")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    def arrive(name: String, rows: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      val stage = Files.createTempDirectory("txup_stage").resolve("d")
      rows.toDF("k", "v").coalesce(1).write.parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = scala.util.Using.resource(Files.list(stage))(
        _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
      Files.move(part, in.resolve(s"$name.parquet")); ()
    }
    def run() = EventStream.upsertTxLog(
      spark.readStream.schema(schema).parquet(in.toString), t, ckpt, "k")

    arrive("c1", Seq(1L -> "a", 2L -> "b"))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    assert(pairs(TxLog.snapshot(t).read(spark)) == Set(1L -> "a", 2L -> "b"))

    // an update batch + an insert, across a restart: latest per key wins
    arrive("c2", Seq(1L -> "A", 3L -> "c"))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(pairs(TxLog.snapshot(t).read(spark)) ==
      Set(1L -> "A", 2L -> "b", 3L -> "c"))
    // replaying the same update by hand is semantically idempotent
    import spark.implicits._
    TxLog.merge(Seq(1L -> "A", 3L -> "c").toDF("k", "v"), t, "k")
    assert(pairs(TxLog.snapshot(t).read(spark)) ==
      Set(1L -> "A", 2L -> "b", 3L -> "c"))
  }

  test("maxFilesPerTrigger bounds files consumed per micro-batch") {
    // Delta-parity rate control (r15 verdict item 7): a backlog of commits
    // must not plan one giant batch. Offsets are version-granular, so the
    // cap admits whole commits oldest-first; each 1-file append here lands
    // its own batch under maxFilesPerTrigger=1.
    val t = freshTable("fcap")
    TxLog.append(df(1L -> "a"), t)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("txlog")
      .option("maxFilesPerTrigger", "1").load(t)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("txsrc_fcap_ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches.add(b.count()); ()
      }
      .start()
    try {
      q.processAllAvailable() // initial snapshot batch (uncapped, documented)
      TxLog.append(df(2L -> "b"), t)
      TxLog.append(df(3L -> "c"), t)
      TxLog.append(df(4L -> "d"), t)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val counts = batches.asScala.toSeq
      assert(counts.sum == 4, s"all rows exactly once, got $counts")
      assert(counts.count(_ == 1L) >= 3, s"expected per-file batches, got $counts")
    } finally q.stop()
  }

  test("maxBytesPerTrigger admits whole commits; oversized commits still consumable") {
    // byte cap of 1b: every data commit exceeds it, so each admits alone
    // (the first data-carrying version always admits — a commit larger
    // than the cap gets a batch to itself rather than wedging the stream)
    val t = freshTable("bcap")
    TxLog.append(df(1L -> "a"), t)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("txlog")
      .option("maxBytesPerTrigger", "1b").load(t)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("txsrc_bcap_ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches.add(b.count()); ()
      }
      .start()
    try {
      q.processAllAvailable()
      TxLog.append(df(2L -> "b"), t)
      // a metadata-only commit in the window is free and must not stall
      TxLog.addConstraint(spark, t, "v_ok", "length(v) > 0")
      TxLog.append(df(3L -> "c"), t)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val counts = batches.asScala.toSeq
      assert(counts.sum == 3, s"all rows exactly once, got $counts")
      assert(counts.count(_ == 1L) >= 2, s"expected per-commit batches, got $counts")
    } finally q.stop()
  }

  test("byte-string parsing and recorded add sizes") {
    import graft.sources.TxLogStreamSource.parseByteString
    assert(parseByteString("123") == 123L)
    assert(parseByteString("1b") == 1L && parseByteString("2k") == 2048L)
    assert(parseByteString("512m") == 512L * (1L << 20))
    assert(parseByteString("1G") == (1L << 30) && parseByteString("1tb") == (1L << 40))
    intercept[IllegalArgumentException](parseByteString("10x"))
    intercept[IllegalArgumentException](parseByteString("0"))
    // writers record add.size so byte admission reads the log, never stat
    val t = freshTable("sizes")
    TxLog.append(df(1L -> "a"), t)
    val c = TxLog.changes(t, 0L, 1L).head
    assert(c.addedSizes.length == c.added.length && c.addedSizes.forall(_.isDefined),
      s"every add must carry a recorded size, got ${c.addedSizes}")
    assert(c.addedSizes.flatten.head ==
      java.nio.file.Paths.get(c.added.head).toFile.length(),
      "recorded size must equal the on-disk byte size")
  }

  test("maxVersionsPerTrigger bounds versions consumed per micro-batch") {
    val t = freshTable("cap")
    TxLog.append(df(1L -> "a"), t)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("txlog")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("txsrc_cap_ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches.add(b.count()); ()
      }
      .start()
    try {
      q.processAllAvailable() // initial snapshot batch
      TxLog.append(df(2L -> "b"), t)
      TxLog.append(df(3L -> "c"), t)
      TxLog.append(df(4L -> "d"), t)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val counts = batches.asScala.toSeq
      assert(counts.sum == 4, s"all rows exactly once, got $counts")
      // capped: the three appended versions arrive as three 1-row batches
      assert(counts.count(_ == 1L) >= 3, s"expected per-version batches, got $counts")
    } finally q.stop()
  }
}
