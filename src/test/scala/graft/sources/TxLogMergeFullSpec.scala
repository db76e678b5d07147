package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The full MERGE matrix: ordered conditional WHEN clauses, matched
  * update/delete, not-matched insert, and — the dimension-sync shape the
  * plain upsert cannot express — NOT MATCHED BY SOURCE delete/update. */
class TxLogMergeFullSpec extends SparkSpec {

  private def freshTable(name: String): String =
    Files.createTempDirectory(s"txmf_$name").resolve("t").toString

  import spark.implicits._
  import TxLog._

  private def kvs(t: String): Set[(Long, String, Long)] =
    TxLog.snapshot(t).read(spark).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("dimension sync: matched update, unmatched insert, missing-from-source delete") {
    val t = freshTable("sync")
    TxLog.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "v", "n").repartition(1), t, statsCol = Some("k"))
    val src = Seq((2L, "B", 200L), (4L, "d", 40L)).toDF("k", "v", "n")
    val v = TxLog.mergeFull(src, t, "k", Seq(
      MatchedUpdate(Map("v" -> col("s.v"), "n" -> col("s.n"))),
      NotMatchedInsert(),
      NotMatchedBySourceDelete()))
    assert(v == 2L)
    // 1 and 3 were missing from the source → deleted; 2 updated; 4 inserted
    assert(kvs(t) == Set((2L, "B", 200L), (4L, "d", 40L)))
  }

  test("clauses apply in order with conditions; unmatched-by-clause rows keep") {
    val t = freshTable("order")
    TxLog.append(Seq((1L, "keep", 1L), (2L, "del", 2L), (3L, "upd", 3L))
      .toDF("k", "v", "n").repartition(1), t, statsCol = Some("k"))
    val src = Seq((1L, "x", 0L), (2L, "x", 0L), (3L, "x", 99L))
      .toDF("k", "v", "n")
    TxLog.mergeFull(src, t, "k", Seq(
      // first clause wins: delete rows flagged 'del' BEFORE the update
      MatchedDelete(Some(col("t.v") === "del")),
      MatchedUpdate(Map("n" -> col("s.n")), Some(col("t.v") === "upd"))))
    // k=1 matched but satisfied no clause → kept byte-identical
    assert(kvs(t) == Set((1L, "keep", 1L), (3L, "upd", 99L)))
  }

  test("NOT MATCHED BY SOURCE UPDATE marks stale rows; conditions see only t") {
    val t = freshTable("stale")
    TxLog.append(Seq((1L, "live", 1L), (2L, "live", 2L), (3L, "live", 3L))
      .toDF("k", "v", "n").repartition(1), t, statsCol = Some("k"))
    val src = Seq((1L, "live", 1L)).toDF("k", "v", "n")
    TxLog.mergeFull(src, t, "k", Seq(
      NotMatchedBySourceUpdate(Map("v" -> lit("stale")),
        Some(col("t.n") < 3L))))
    assert(kvs(t) == Set((1L, "live", 1L), (2L, "stale", 2L), (3L, "live", 3L)))
  }

  test("without by-source clauses the rewrite scope stays file-scoped") {
    val t = freshTable("scope")
    for (slice <- 0 until 3)
      TxLog.append((0 until 5).map(i => (slice * 100L + i, "v", 0L))
        .toDF("k", "v", "n").repartition(1), t, statsCol = Some("k"))
    val before = TxLog.snapshot(t).files.toSet
    TxLog.mergeFull(Seq((101L, "U", 1L)).toDF("k", "v", "n"), t, "k", Seq(
      MatchedUpdate(Map("v" -> col("s.v"))), NotMatchedInsert()))
    val after = TxLog.snapshot(t).files.toSet
    // only the file holding key 101 was rewritten
    assert((before -- after).size == 1, s"rewrote ${(before -- after).size} files")
    assert(TxLog.snapshot(t).read(spark).where(col("k") === 101L)
      .select("v").as[String].head() == "U")
  }

  test("change-feed sidecars record the full matrix exactly") {
    val t = freshTable("cdc")
    TxLog.append(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "v", "n")
      .repartition(1), t, statsCol = Some("k"))
    TxLog.mergeFull(Seq((2L, "B", 20L), (9L, "i", 90L)).toDF("k", "v", "n"),
      t, "k", Seq(
        MatchedUpdate(Map("v" -> col("s.v"), "n" -> col("s.n"))),
        NotMatchedInsert(),
        NotMatchedBySourceDelete()), changeFeed = true)
    val feed = TxLog.readChangeFeed(spark, t, 1L)
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(feed == Set(
      (1L, "a", "delete"),
      (2L, "b", "update_preimage"), (2L, "B", "update_postimage"),
      (9L, "i", "insert")))
  }

  test("lossy SET types refuse; null-keyed source rows are insert candidates") {
    val t = freshTable("types")
    TxLog.append(Seq((1L, "a", 1L)).toDF("k", "v", "n").repartition(1), t)
    intercept[TxLog.SchemaMismatch](
      TxLog.mergeFull(Seq((1L, "x", 0L)).toDF("k", "v", "n"), t, "k",
        Seq(MatchedUpdate(Map("n" -> lit("text"))))))
    // a null-keyed source row matches nothing → inserts (SQL join semantics)
    TxLog.mergeFull(
      Seq((Option.empty[Long], "nullk", 0L)).toDF("k", "v", "n"),
      t, "k", Seq(MatchedUpdate(Map("v" -> col("s.v"))), NotMatchedInsert()))
    val got = TxLog.snapshot(t).read(spark).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (-1L, "nullk")))
  }
}
