package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.TxLog

/** Exactly-once streaming writes into the ACID table format: the Delta-log
  * `txn` pattern. The contract under test — a replayed micro-batch (same
  * application id + batch version) is a metadata no-op, zombie drivers racing
  * the same batch commit exactly once, and the txn watermark survives log
  * compaction — is what makes `EventStream.exactlyOnceTxLog` safe to restart
  * at any point without duplicating or losing rows. */
class TxSinkSpec extends SparkSpec {

  private def freshTable(name: String): String =
    Files.createTempDirectory(s"txsink_$name").resolve("t").toString

  private def keys(table: String): Seq[Long] = {
    val df = TxLog.snapshot(table).read(spark)
    if (df.columns.isEmpty) Seq.empty
    else df.select("k").collect().map(_.getLong(0)).toSeq.sorted
  }

  test("appendIdempotent commits once per (app, version) and skips replays") {
    import spark.implicits._
    val t = freshTable("replay")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(TxLog.appendIdempotent(b0, t, "q", 0L) == Some(1L))
    // crash-replay of the same micro-batch: metadata no-op, no duplicate rows
    assert(TxLog.appendIdempotent(b0, t, "q", 0L) == None)
    assert(keys(t) == Seq(1L, 2L))
    // the next batch commits normally…
    assert(TxLog.appendIdempotent(Seq((3L, "c")).toDF("k", "v"), t, "q", 1L) == Some(2L))
    // …and a DIFFERENT app's version 0 is independent, not deduped
    assert(TxLog.appendIdempotent(Seq((4L, "d")).toDF("k", "v"), t, "other", 0L) == Some(3L))
    assert(keys(t) == Seq(1L, 2L, 3L, 4L))
    assert(TxLog.lastTxnVersion(t, "q") == Some(1L))
    assert(TxLog.lastTxnVersion(t, "other") == Some(0L))
    assert(TxLog.lastTxnVersion(t, "never") == None)
  }

  test("txn watermarks survive checkpoint compaction") {
    import spark.implicits._
    val t = freshTable("ckpt")
    // 12 batches → auto-checkpoint at version 10; versions 11-12 are suffix
    for (b <- 0L until 12L)
      assert(TxLog.appendIdempotent(Seq((b, s"v$b")).toDF("k", "v"), t, "q", b).isDefined)
    TxLog.commitFilesReplayed.set(0L)
    assert(TxLog.lastTxnVersion(t, "q") == Some(11L))
    assert(TxLog.commitFilesReplayed.get == 2L,
      s"lastTxnVersion replayed ${TxLog.commitFilesReplayed.get} commit files; " +
        "the checkpoint should leave only the 2-commit suffix")
    // a replayed batch from below the checkpoint is still detected
    assert(TxLog.appendIdempotent(Seq((0L, "dup")).toDF("k", "v"), t, "q", 0L) == None)
  }

  test("zombie drivers racing the same batch commit exactly once") {
    import spark.implicits._
    val t = freshTable("zombie")
    TxLog.append(Seq((0L, "seed")).toDF("k", "v"), t)
    val batch = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Option[Long]]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => results.add(TxLog.appendIdempotent(batch, t, "q", 7L)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    assert(rs.count(_.isDefined) == 1, s"exactly one driver must win, got $rs")
    assert(keys(t) == Seq(0L, 1L, 2L), "the batch must land exactly once")
  }

  test("exactlyOnceTxLog: file-source stream lands exactly once across restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("txsink_in")
    val ckpt = Files.createTempDirectory("txsink_ckpt").toString
    val t = freshTable("e2e")
    val appId = "txsink-e2e"
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    // the standard file-source arrival pattern: write elsewhere, then move
    // the finished part file into the watched directory in one rename
    def arrive(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = Files.createTempDirectory("txsink_stage").resolve("d")
      rows.toDF("k", "v").coalesce(1).write.parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = scala.util.Using.resource(Files.list(stage))(
        _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
      Files.move(part, in.resolve(s"$name.parquet"))
      ()
    }
    def stream() = EventStream.exactlyOnceTxLog(
      spark.readStream.schema(schema).parquet(in.toString), t, ckpt, appId)

    arrive("f1", Seq((1L, "a"), (2L, "b")))
    val q1 = stream()
    try q1.processAllAvailable() finally q1.stop()
    assert(keys(t) == Seq(1L, 2L))

    // restart from the same Spark checkpoint: old batches are NOT re-landed,
    // new files are — the production crash/redeploy path
    arrive("f2", Seq((3L, "c")))
    val q2 = stream()
    try q2.processAllAvailable() finally q2.stop()
    assert(keys(t) == Seq(1L, 2L, 3L))

    // the table's commit log carries one txn watermark per landed batch;
    // replaying the tip batch by hand is a no-op
    val tip = TxLog.lastTxnVersion(t, appId).get
    assert(TxLog.appendIdempotent(Seq((3L, "c")).toDF("k", "v"), t, appId, tip) == None)
    assert(keys(t) == Seq(1L, 2L, 3L))
  }

  test("writeStream.format(\"txlog\"): the public sink is exactly-once across restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = freshTable("pubsink")
    val ckpt = Files.createTempDirectory("pubsink_ck").toString
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF().toDF("k", "v").writeStream
      .format("txlog").option("checkpointLocation", ckpt).option("stats", "k")
      .start(t)
    mem.addData((1L, "a"), (2L, "b"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(keys(t) == Seq(1L, 2L))
    // restart on the same checkpoint: committed batches are not re-landed
    mem.addData((3L, "c"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(keys(t) == Seq(1L, 2L, 3L))
    // the checkpointLocation IS the txn identity; recorded stats skip on read
    assert(TxLog.lastTxnVersion(t, ckpt).isDefined)
    assert(TxLog.prunedFiles(spark, t, "k", 3L, 3L).size == 1)
    // every micro-batch rode appendIdempotent: ops are all plain appends, so
    // the table tails cleanly as a stream source too
    assert(TxLog.history(t).forall(_.op == "append"))
  }

  test("the public sink refuses Update mode and a query with no stable identity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val t = freshTable("pubsink_refuse")
    // no appId and no checkpointLocation → refused at start (replayed
    // batches would silently duplicate without a stable identity)
    val e = intercept[Exception] {
      val q = mem.toDF().toDF("k", "v").writeStream.format("txlog").start(t)
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage != null)
    // partitionBy is refused rather than silently ignored
    val e3 = intercept[Exception] {
      val q = mem.toDF().toDF("k", "v").writeStream.format("txlog")
        .partitionBy("v")
        .option("appId", "x")
        .option("checkpointLocation", Files.createTempDirectory("p_ck").toString)
        .start(t)
      try q.processAllAvailable() finally q.stop()
    }
    assert(e3.getMessage != null)
    // Update mode is refused: a txlog append sink cannot merge
    val e2 = intercept[Exception] {
      val q = mem.toDF().toDF("k", "v").writeStream.format("txlog")
        .outputMode("update")
        .option("appId", "x")
        .option("checkpointLocation", Files.createTempDirectory("u_ck").toString)
        .start(t)
      try q.processAllAvailable() finally q.stop()
    }
    assert(e2.getMessage != null)
  }
}
