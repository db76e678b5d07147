package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The footer-stats fast path (r16 optimization: staging stats come from
  * parquet footers, not a second Spark scan) must be BYTE-IDENTICAL to the
  * scan path it replaces: same min/max strings, same null counts, same
  * "no envelope for an all-null column" rule — and must refuse (fall back)
  * on types whose rendering could diverge. */
class FooterStatsSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft_footer_$name").toFile
    d.deleteOnExit(); d.toString
  }

  /** Scan-path stats for one column over one parquet dir, exactly as the
    * old stageFiles computed them: (minStr, maxStr, nulls) per file. */
  private def scanStats(dir: String, c: String): Map[String, (String, String, Long)] =
    spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("__fp"), col(c))
      .groupBy("__fp")
      .agg(min(col(c)).cast("string").as("mn"), max(col(c)).cast("string").as("mx"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("nl"))
      .collect()
      .flatMap { r =>
        val p = new java.net.URI(r.getString(0)).getPath
        (Option(r.getAs[String]("mn")), Option(r.getAs[String]("mx"))) match {
          case (Some(mn), Some(mx)) => Some(p -> ((mn, mx, r.getAs[Long]("nl"))))
          case _                    => None
        }
      }.toMap

  private def footerStats(dir: String, c: String): Option[Map[String, (String, String, Long)]] = {
    import scala.jdk.CollectionConverters._
    val files = Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toList.sorted
    ParquetFooters.metaAll(spark, files, Seq(c)).map(_.collect {
      case (p, m) if m.stats.contains(c) => p -> m.stats(c)
    }.toMap)
  }

  test("footer stats equal scan stats for long, int, string, date, boolean") {
    val dir = tmpDir("types")
    spark.sql(
      """SELECT id AS k,
                CAST(id * 7 - 50 AS INT) AS i,
                CASE WHEN id % 5 = 0 THEN NULL
                     ELSE concat('s', lpad(CAST(id AS STRING), 3, '0')) END AS s,
                DATE_ADD(DATE'2020-06-15', CAST(id AS INT) * 13) AS dt,
                id % 3 = 0 AS b
         FROM range(0, 1000)""")
      .repartition(3).write.mode("overwrite").parquet(dir)
    for (c <- Seq("k", "i", "s", "dt", "b")) {
      val f = footerStats(dir, c)
      assert(f.isDefined, s"footer path refused supported column $c")
      assert(f.get === scanStats(dir, c), s"column $c diverged")
    }
  }

  test("all-null column records no envelope on either path; null counts exact") {
    val dir = tmpDir("nulls")
    spark.sql(
      """SELECT id AS k, CAST(NULL AS STRING) AS dead,
                CASE WHEN id < 3 THEN NULL ELSE id END AS holey
         FROM range(0, 10)""")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    assert(footerStats(dir, "dead").get === Map.empty)
    val h = footerStats(dir, "holey").get
    assert(h === scanStats(dir, "holey"))
    assert(h.values.head._3 === 3L)
  }

  test("unsupported types (double, decimal, timestamp) fall back — metaAll refuses") {
    val dir = tmpDir("unsup")
    spark.sql(
      """SELECT CAST(id AS DOUBLE) / 3 AS dbl,
                CAST(id AS DECIMAL(10,2)) AS dec,
                timestamp_millis(id * 1000) AS ts
         FROM range(0, 10)""")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    for (c <- Seq("dbl", "dec", "ts"))
      assert(footerStats(dir, c).isEmpty, s"footer path should refuse $c")
  }

  test("TxLog.append records identical stats through the fast path and the fallback") {
    // same rows appended twice: once with a footer-supported stats column
    // (long — fast path) and once with a double column (fallback scan);
    // both logs' add-lines must carry exact envelopes for their column
    val src = spark.sql(
      """SELECT id AS k, CAST(id AS DOUBLE) / 4 AS v,
                CASE WHEN id % 4 = 0 THEN NULL ELSE concat('t', id) END AS t
         FROM range(0, 100)""").coalesce(1)
    val fast = tmpDir("txfast")
    TxLog.append(src, fast, statsCol = Some("k,t"))
    val slow = tmpDir("txslow")
    TxLog.append(src, slow, statsCol = Some("v"))
    def statLines(tbl: String): String = {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(java.nio.file.Paths.get(tbl, "_txlog", "00000000000000000001.json"))
        .asScala.filter(_.contains("\"add\"")).mkString("\n")
    }
    val fastLine = statLines(fast)
    assert(fastLine.contains(""""col":"k","min":"0","max":"99","nulls":0"""), fastLine)
    assert(fastLine.contains(""""col":"t","min":"t1","max":"t99","nulls":25"""), fastLine)
    val slowLine = statLines(slow)
    assert(slowLine.contains(""""col":"v","min":"0.0","max":"24.75","nulls":0"""), slowLine)
    // and the snapshot answers COUNT from metadata on both
    assert(TxLog.rowCount(fast).contains(100L))
    assert(TxLog.rowCount(slow).contains(100L))
  }

  test("maxLong answers from footers and equals agg(max) on real testdata") {
    val path = sf("sf0.001") + "/orders.parquet"
    val viaFooter = ParquetFooters.maxLong(spark, path, "o_orderkey")
    val viaScan = spark.read.parquet(path).agg(max("o_orderkey")).head.getLong(0)
    assert(viaFooter.contains(viaScan))
    // unsupported column type → None (callers keep their scan fallback)
    assert(ParquetFooters.maxLong(spark, path, "o_totalprice").isEmpty)
  }
}
