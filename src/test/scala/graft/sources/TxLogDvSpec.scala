package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DELETION VECTORS: a point DELETE/UPDATE publishes a bitmap instead of
  * rewriting the file — O(affected rows) commit cost — and every read path
  * (snapshot, merge rewrite, pruned read, public reader, change feed)
  * masks exactly; OPTIMIZE absorbs; vacuum retains what the feed reaches.
  */
class TxLogDvSpec extends SparkSpec {

  private def freshTable(name: String): String =
    Files.createTempDirectory(s"txdv_$name").resolve("t").toString

  private def kvs(table: String): Set[(Long, String)] =
    TxLog.snapshot(table).read(spark)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def parquetCount(table: String): Long = {
    val d = Paths.get(table, "data")
    if (!Files.isDirectory(d)) 0L
    else scala.util.Using.resource(Files.walk(d))(
      _.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.count(_.toString.endsWith(".parquet")).toLong)
  }
  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }

  test("a point DV delete is O(deleted rows): no parquet staged, same file live") {
    import spark.implicits._
    val t = freshTable("point")
    TxLog.append((0L until 5000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))
    val filesBefore = TxLog.snapshot(t).files
    val bytesBefore = parquetCount(t)
    val v = TxLog.delete(spark, t, col("k") === 7L, useDV = true)
    assert(v == 2L)
    assert(TxLog.dvSwapFiles.get == 1L, "one file DV-swapped")
    // the data file did NOT move or copy: same live path, zero new parquet
    assert(TxLog.snapshot(t).files == filesBefore)
    assert(parquetCount(t) == bytesBefore, "a DV delete stages no parquet")
    // the sidecar exists and is small (the O(deleted rows) claim)
    val dv = TxLog.snapshot(t).dvs(filesBefore.head)
    assert(dv.card == 1L)
    assert(Files.size(Paths.get(dv.path)) < 1024L, "bitmap is bytes, not file bytes")
    // reads mask
    assert(!TxLog.snapshot(t).read(spark).where(col("k") === 7L).collect().nonEmpty)
    assert(TxLog.snapshot(t).read(spark).count() == 4999L)
    // time travel below the delete still sees the row (the file is immutable)
    assert(TxLog.snapshot(t, asOf = 1L).read(spark).where(col("k") === 7L).count() == 1L)
    // COUNT(*) from metadata subtracts the bitmap cardinality
    assert(TxLog.rowCount(t).contains(4999L))
  }

  test("successive DV deletes OR their bitmaps; checkpoint carries them") {
    import spark.implicits._
    val t = freshTable("merge2")
    TxLog.append((0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))
    TxLog.delete(spark, t, col("k") === 1L, useDV = true)
    TxLog.delete(spark, t, col("k").isin(2L, 3L), useDV = true)
    assert(TxLog.snapshot(t).read(spark).count() == 97L)
    assert(TxLog.rowCount(t).contains(97L))
    assert(TxLog.snapshot(t).dvs.values.map(_.card).sum == 3L)
    // a checkpoint replays the dv'd line verbatim — masking survives
    TxLog.checkpoint(t)
    assert(TxLog.snapshot(t).read(spark).count() == 97L)
    // intermediate version masks only ITS bitmap
    assert(TxLog.snapshot(t, asOf = 2L).read(spark).count() == 99L)
  }

  test("the fraction guard falls a too-dirty delete back to a rewrite") {
    import spark.implicits._
    val t = freshTable("guard")
    TxLog.append((0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))
    val before = TxLog.snapshot(t).files
    TxLog.delete(spark, t, col("k") < 90L && col("k") % 10L =!= 0L, useDV = true)
    assert(TxLog.dvSwapFiles.get == 0L, "81% deleted: rewrite, not DV")
    assert(TxLog.snapshot(t).files != before, "the file was rewritten")
    assert(TxLog.snapshot(t).dvs.isEmpty)
    assert(TxLog.snapshot(t).read(spark).count() == 19L)
  }

  test("DV update: postimages append, preimages mask, assignments are simultaneous") {
    import spark.implicits._
    val t = freshTable("upd")
    TxLog.append((0L until 1000L).map(i => (i, i * 10L)).toDF("k", "n")
      .repartition(1), t, statsCol = Some("k"))
    val before = TxLog.snapshot(t).files
    val v = TxLog.update(spark, t, col("k") === 5L,
      Map("n" -> (col("n") + col("k"))), useDV = true)
    assert(v == 2L)
    assert(TxLog.dvSwapFiles.get == 1L)
    // the old file is still live (swapped in place) plus one postimage file
    val after = TxLog.snapshot(t)
    assert(after.files.toSet.contains(before.head))
    assert(after.files.size == 2)
    assert(after.read(spark).where(col("k") === 5L).select("n")
      .as[Long].collect().toSeq == Seq(55L))
    assert(after.read(spark).count() == 1000L)
    // swap semantics through the DV path: SET a=b, b=a over OLD values
    val t2 = freshTable("swap")
    TxLog.append((0L until 50L).map(i => (i, i + 1000L)).toDF("a", "b")
      .repartition(1), t2, statsCol = Some("a"))
    TxLog.update(spark, t2, col("a") === 3L,
      Map("a" -> col("b"), "b" -> col("a")), useDV = true)
    val r = TxLog.snapshot(t2).read(spark).where(col("b") === 3L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((1003L, 3L)))
  }

  test("the change feed derives DV deletes and updates exactly, with no sidecars") {
    import spark.implicits._
    val t = freshTable("feed")
    TxLog.append((0L until 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))                         // v1
    TxLog.delete(spark, t, col("k") === 4L, useDV = true)               // v2
    TxLog.delete(spark, t, col("k") === 6L, useDV = true)               // v3
    TxLog.update(spark, t, col("k") === 2L, Map("v" -> lit("U")),
      useDV = true)                                                     // v4
    // no sidecars were written for any of these
    assert(!Files.isDirectory(Paths.get(t, "_change_data")))
    val feed = TxLog.readChangeFeed(spark, t, 1L)
      .select("k", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(feed == Set(
      (4L, "v4", "delete", 2L),            // ONLY the diff, not prior state
      (6L, "v6", "delete", 3L),
      (2L, "v2", "update_preimage", 4L),
      (2L, "U", "update_postimage", 4L)))
  }

  test("a covered drop after a DV delete feeds only the still-live rows") {
    import spark.implicits._
    val t = freshTable("covfeed")
    TxLog.append((0L until 3L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))                         // v1
    TxLog.delete(spark, t, col("k") === 1L, useDV = true)               // v2
    TxLog.delete(spark, t, col("k") >= 0L)                              // v3: covered
    assert(TxLog.deleteCoveredFiles.get == 1L)
    val feed = TxLog.readChangeFeed(spark, t, 2L)
      .select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // k=1 was already deleted at v2 — the covered drop must not re-emit it
    assert(feed == Set((0L, "delete", 3L), (2L, "delete", 3L)))
  }

  test("merge and pruned reads never resurrect DV-deleted rows") {
    import spark.implicits._
    val t = freshTable("nores")
    TxLog.append((0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))
    TxLog.delete(spark, t, col("k") === 50L, useDV = true)
    // merge rewrites the touched (DV'd) file: the masked read must drop 50
    TxLog.merge(Seq((51L, "M")).toDF("k", "v"), t, "k")
    assert(TxLog.snapshot(t).dvs.isEmpty, "rewrite absorbed the DV")
    val got = kvs(t)
    assert(!got.contains((50L, "v50")))
    assert(got.contains((51L, "M")) && got.size == 99)
    // pruned read masks too
    val t2 = freshTable("pruned")
    TxLog.append((0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t2, statsCol = Some("k"))
    TxLog.delete(spark, t2, col("k") === 5L, useDV = true)
    assert(TxLog.readPruned(spark, t2, "k", 0L, 9L).count() == 9L)
  }

  test("OPTIMIZE absorbs deletion vectors even for a lone large file") {
    import spark.implicits._
    val t = freshTable("opt")
    TxLog.append((0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))
    TxLog.delete(spark, t, col("k") === 123L, useDV = true)
    val v = TxLog.optimize(spark, t, statsCol = Some("k"))
    assert(v > 0L, "a DV'd file compacts regardless of size or count")
    assert(TxLog.snapshot(t).dvs.isEmpty)
    assert(TxLog.snapshot(t).read(spark).count() == 999L)
    assert(TxLog.snapshot(t).read(spark).where(col("k") === 123L).count() == 0L)
  }

  test("the public reader masks DVs; vacuum keeps reachable sidecars, collects superseded") {
    import spark.implicits._
    val t = freshTable("pub")
    TxLog.append((0L until 20L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))                         // v1
    TxLog.delete(spark, t, col("k") === 1L, useDV = true)               // v2
    TxLog.delete(spark, t, col("k") === 2L, useDV = true)               // v3 (supersedes v2's dv)
    assert(spark.read.format("txlog").load(t).count() == 18L)
    assert(spark.read.format("txlog").load(t)
      .where(col("k") < 5L).count() == 3L)
    def dvFiles: Set[String] = {
      val d = Paths.get(t, "_deletion_vectors")
      scala.util.Using.resource(Files.walk(d))(
        _.iterator().asScala.map(_.toString).filter(_.endsWith(".dv")).toSet)
    }
    assert(dvFiles.size == 2)
    // v2's superseded bitmap is retained while v2 is a retained snapshot OR
    // the feed-boundary predecessor; one more commit pushes it out of reach
    TxLog.append(Seq((100L, "x")).toDF("k", "v").repartition(1), t,
      statsCol = Some("k"))                                             // v4
    val deleted = TxLog.vacuum(t, retainVersions = 0L, graceMs = 0L)
    assert(deleted >= 1L)
    assert(dvFiles.size == 1, "superseded bitmap collected, live one kept")
    assert(TxLog.snapshot(t).read(spark).count() == 19L, "the live bitmap survived")
    // within retention the feed still reads exactly
    val feed = TxLog.readChangeFeed(spark, t, 3L)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == Set((100L, "insert")))
  }

  test("restore across DV commits re-applies the restored line's bitmap state") {
    import spark.implicits._
    val t = freshTable("restore")
    TxLog.append((0L until 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), t, statsCol = Some("k"))                         // v1
    TxLog.delete(spark, t, col("k") === 3L, useDV = true)               // v2
    TxLog.restore(t, 1L)                                                // v3: pre-delete
    assert(TxLog.snapshot(t).read(spark).count() == 10L, "restore resurrects")
    TxLog.restore(t, 2L)                                                // v4: DV'd state
    assert(TxLog.snapshot(t).read(spark).count() == 9L, "restore re-masks")
    assert(TxLog.snapshot(t).dvs.values.map(_.card).sum == 1L)
  }

  test("CLONE carries unabsorbed deletion vectors — no row resurrection") {
    import spark.implicits._
    val src = freshTable("clonesrc")
    TxLog.append((0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1), src, statsCol = Some("k"))                       // v1
    TxLog.delete(spark, src, col("k") < 10L, useDV = true)              // v2: DV
    val dst = freshTable("clonedst")
    TxLog.clone(src, dst)
    // the clone's add-line carries the dv ref: reads mask, count subtracts
    assert(TxLog.snapshot(dst).dvs.values.map(_.card).sum == 10L,
      "clone must carry the source's dv reference")
    assert(TxLog.snapshot(dst).read(spark).count() == 90L,
      "a clone of a DV'd table must not resurrect deleted rows")
    assert(TxLog.rowCount(dst).contains(90L), "metadata count masks too")
  }

  test("two DV deletes on disjoint files admit without re-derivation") {
    // the PROFITABLE positive case of disjoint-commit admission (r14
    // verdict item 7): concurrent retention jobs DV-deleting disjoint key
    // ranges must each pay exactly ONE derivation at 100 TB. The winner's
    // DV swap commits remove(p) + re-add(p with the bitmap ref) carrying
    // the ORIGINAL stats verbatim, so the loser's admission proof — the
    // re-added envelope provably excludes its predicate — goes through
    // and the SAME actions re-commit at the next slot. (r14 made metadata
    // commits defeat admission, correctly conservative; this pins that a
    // plain DV swap is NOT mistaken for one.)
    import spark.implicits._
    val t = freshTable("dvadmit")
    TxLog.append((1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k")), t, statsCol = Some("k"))        // v1
    // stamp the deletionVectors protocol feature BEFORE the race: the
    // FIRST DV delete on a table carries the protocol bump in its commit,
    // and protocol lines defeat admission (correctly — a protocol change
    // is a metadata interaction). Steady state — the 100 TB retention
    // scenario — has the feature stamped long before jobs race.
    TxLog.delete(spark, t, col("k") === 1L, statsCol = Some("k"), useDV = true) // v2
    val livePaths = TxLog.snapshot(t).files.toSet
    TxLog.deleteDerivations.set(0L)
    TxLog.deleteCommitHook = () => {
      TxLog.deleteCommitHook = () => ()
      // concurrent retention job: DV-deletes a key in a DIFFERENT file
      TxLog.delete(spark, t, col("k") === 5L, statsCol = Some("k"), useDV = true)
      ()
    }
    try {
      val v = TxLog.delete(spark, t, col("k") === 95L,
        statsCol = Some("k"), useDV = true)
      assert(v == 4L, "winner lands v3; the admitted DV delete lands v4")
    } finally TxLog.deleteCommitHook = () => ()
    // two derivations TOTAL: one per delete — the loser re-committed its
    // same actions, it did not re-derive
    assert(TxLog.deleteDerivations.get == 2L,
      s"disjoint DV winner must not force a re-derivation, saw ${TxLog.deleteDerivations.get}")
    val ks = TxLog.snapshot(t).read(spark).select("k").collect()
      .map(_.getLong(0)).toSet
    assert(!ks.contains(5L) && !ks.contains(95L) && ks.size == 97,
      s"all three deletes applied, got ${ks.size} rows")
    // both were DV swaps: every live path is an ORIGINAL file (no rewrite)
    assert(TxLog.snapshot(t).files.toSet == livePaths,
      "DV swaps keep file paths — a rewrite appeared where none should")
  }
}
