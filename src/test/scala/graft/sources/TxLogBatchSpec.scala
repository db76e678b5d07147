package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The public batch path onto a txlog table: `spark.read.format("txlog")`
  * (snapshot / time travel / batch CDF) and `df.write.format("txlog")` —
  * pure-SQL/DataFrame consumers need no graft imports. The snapshot read
  * must be a REAL parquet file relation (pushdown + codegen intact) whose
  * file list comes from the log and data-skips on recorded stats. */
class TxLogBatchSpec extends SparkSpec {

  private def freshTable(name: String): String =
    Files.createTempDirectory(s"txbatch_$name").resolve("t").toString

  private def scanOf(df: DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head

  test("format(\"txlog\") snapshot read ≡ snapshot.read, schema pinned across evolution") {
    import spark.implicits._
    val t = freshTable("snap")
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t, statsCol = Some("k"))
    TxLog.append(Seq((3L, "c", 7L)).toDF("k", "v", "extra"), t,
      statsCol = Some("k"), mergeSchema = true)
    val pub = spark.read.format("txlog").load(t)
    assert(pub.columns.toSeq == Seq("k", "v", "extra"), "log schema, log order")
    assert(pub.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(7L))))
    // it IS a file relation: predicate pushdown reaches the parquet scan
    val filtered = pub.where(col("k") === 3L)
    assert(scanOf(filtered).metadata("PushedFilters").contains("EqualTo(k,3)"),
      "the public reader must keep parquet pushdown intact")
  }

  test("versionAsOf time travel through the public reader") {
    import spark.implicits._
    val t = freshTable("tt")
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), t)
    assert(spark.read.format("txlog").option("versionAsOf", 1).load(t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "a")))
    assert(spark.read.format("txlog").load(t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == Set((9L, "z")))
  }

  test("the log-backed FileIndex data-skips on recorded stats") {
    import spark.implicits._
    val t = freshTable("skip")
    // four files with disjoint key ranges + recorded stats
    for (slice <- 0 until 4)
      TxLog.append((0 until 10).map(i => (slice * 100L + i, s"s$slice"))
        .toDF("k", "v").repartition(1), t, statsCol = Some("k"))
    val df = spark.read.format("txlog").load(t)
      .where(col("k") >= 100L && col("k") <= 109L).select("k")
    val got = df.collect().map(_.getLong(0)).toSet
    assert(got == (100L until 110L).toSet)
    // the scan opened ONE file, not four — skipping happened in the index
    val scan = scanOf(df)
    val index = scan.relation.location.asInstanceOf[TxLogFileIndex]
    assert(index.lastServedFiles == 1,
      s"expected 1 file after data skipping, served ${index.lastServedFiles}")
    assert(scan.metrics("numFiles").value == 1)
    // an unskippable predicate keeps everything — never changes answers
    assert(spark.read.format("txlog").load(t)
      .where(col("v") === "s2").count() == 10)
  }

  test("startingVersion reads the batch change feed; rewrites gated") {
    import spark.implicits._
    val t = freshTable("cdf")
    // v1 holds two rows in ONE file so a later delete rewrite has a survivor
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1), t)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)
    val feed = spark.read.format("txlog").option("startingVersion", 1).load(t)
    assert(feed.select("k", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((3L, 2L), (4L, 3L)))
    assert(spark.read.format("txlog")
      .option("startingVersion", 0).option("endingVersion", 1).load(t)
      .count() == 2)
    // a delete in range is refused without includeRewrites, like the API
    TxLog.delete(spark, t, col("k") === 1L)
    intercept[IllegalStateException](
      spark.read.format("txlog").option("startingVersion", 3).load(t))
    assert(spark.read.format("txlog").option("startingVersion", 3)
      .option("includeRewrites", true).load(t)
      .select("k", "_commit_op").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "delete")),
      "the delete rewrite re-emits its survivor row stamped with the delete")
  }

  test("readChangeFeed option serves the exact row-level feed on the public reader") {
    import spark.implicits._
    val t = freshTable("cdfexact")
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1), t) // v1
    TxLog.update(spark, t, col("k") === 2L, Map("v" -> lit("B")),
      changeFeed = true)                                                     // v2
    TxLog.delete(spark, t, col("k") === 1L, changeFeed = true)               // v3
    val feed = spark.read.format("txlog")
      .option("startingVersion", 0).option("readChangeFeed", "true").load(t)
      .select("k", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(feed == Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (2L, "b", "update_preimage", 2L), (2L, "B", "update_postimage", 2L),
      (1L, "a", "delete", 3L)))
    // includeRewrites belongs to the file-level feed only
    intercept[IllegalArgumentException](
      spark.read.format("txlog").option("startingVersion", 0)
        .option("readChangeFeed", "true").option("includeRewrites", "true").load(t))
    // a feed ask without a range is refused — a silent snapshot where
    // change events were expected would be a wrong answer
    intercept[IllegalArgumentException](
      spark.read.format("txlog").option("readChangeFeed", "true").load(t))
  }

  test("write path: SaveMode maps to the transactional verbs") {
    import spark.implicits._
    val t = freshTable("write")
    Seq((1L, "a")).toDF("k", "v").write.format("txlog")
      .option("stats", "k").mode(SaveMode.Append).save(t)
    Seq((2L, "b")).toDF("k", "v").write.format("txlog")
      .mode(SaveMode.Append).save(t)
    assert(TxLog.latestVersion(t) == 2L)
    assert(spark.read.format("txlog").load(t).count() == 2)
    // round-trip entirely through the public surface
    Seq((9L, "z")).toDF("k", "v").write.format("txlog")
      .mode(SaveMode.Overwrite).save(t)
    assert(spark.read.format("txlog").load(t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == Set((9L, "z")))
    // ErrorIfExists refuses a non-empty table; Ignore is a no-op on one
    intercept[IllegalStateException](
      Seq((7L, "q")).toDF("k", "v").write.format("txlog")
        .mode(SaveMode.ErrorIfExists).save(t))
    Seq((7L, "q")).toDF("k", "v").write.format("txlog")
      .mode(SaveMode.Ignore).save(t)
    assert(TxLog.latestVersion(t) == 3L, "Ignore on a non-empty table writes nothing")
    // appends recorded stats through options actually skip on read
    val t2 = freshTable("write2")
    for (s0 <- 0 until 3)
      (0 until 5).map(i => (s0 * 10L + i, "x")).toDF("k", "v").repartition(1)
        .write.format("txlog").option("stats", "k").mode(SaveMode.Append).save(t2)
    val df = spark.read.format("txlog").load(t2).where(col("k") === 11L)
    assert(df.count() == 1)
    assert(scanOf(df).relation.location.asInstanceOf[TxLogFileIndex].lastServedFiles == 1)
  }

  test("timestampAsOf time travel through the public reader") {
    import spark.implicits._
    val t = freshTable("ts_travel")
    TxLog.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), t)
    val Seq(t1, t2) = TxLog.history(t).sortBy(_.version).map(_.committedAtMs)
    // epoch-millis form resolves to the version committed at that instant
    def at(ts: String): Set[(Long, String)] =
      spark.read.format("txlog").option("timestampAsOf", ts).load(t)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at(t1.toString) == Set((1L, "a")))
    assert(at(t2.toString) == Set((9L, "z")))
    // ISO-8601 instant form
    assert(at(java.time.Instant.ofEpochMilli(t1).toString) == Set((1L, "a")))
    // before the first commit is an error, not an empty read
    intercept[Exception](at((t1 - 1L).toString))
    // versionAsOf and timestampAsOf refuse to combine
    intercept[IllegalArgumentException](
      spark.read.format("txlog").option("timestampAsOf", t1.toString)
        .option("versionAsOf", 1).load(t))
    // and neither combines with the change-feed read mode
    intercept[IllegalArgumentException](
      spark.read.format("txlog").option("startingVersion", 1)
        .option("timestampAsOf", t1.toString).load(t))
    // a malformed timestamp is refused, not guessed
    intercept[IllegalArgumentException](at("2026-08-15 12:00:00"))
  }

  test("clusterBy write: range-clustered files give near-perfect point skipping") {
    import spark.implicits._
    val t = freshTable("cluster")
    // 400 keys, shuffled input order, clustered into 4 range-disjoint files
    val df = new scala.util.Random(7).shuffle((0 until 400).toList)
      .map(i => (i.toLong, s"v$i")).toDF("k", "v")
    df.write.format("txlog")
      .option("clusterBy", "k").option("clusterFiles", "4")
      .mode(SaveMode.Append).save(t)
    assert(TxLog.snapshot(t).files.size == 4)
    // a point lookup opens exactly ONE of the four files — the cluster
    // columns' stats were recorded automatically
    val q = spark.read.format("txlog").load(t).where(col("k") === 250L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v250"))
    val idx = scanOf(q).relation.location.asInstanceOf[TxLogFileIndex]
    assert(idx.lastServedFiles == 1,
      s"expected a 1-file point lookup on clustered data, served ${idx.lastServedFiles}")
    // a range query spanning two adjacent clusters opens exactly two
    val q2 = spark.read.format("txlog").load(t)
      .where(col("k") >= 90L && col("k") <= 110L)
    assert(q2.count() == 21)
    assert(scanOf(q2).relation.location.asInstanceOf[TxLogFileIndex].lastServedFiles <= 2)
  }
}
