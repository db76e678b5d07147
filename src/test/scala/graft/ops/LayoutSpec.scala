package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: the pruning win is MEASURED against the file-statistics
  * model, not asserted — the same min/max-per-file arithmetic a lakehouse
  * scan planner runs against its manifest.
  */
class LayoutSpec extends SparkSpec {
  private lazy val events = graft.Tables.events(spark, sf("sf0.001"))
    .select(col("event_id"), col("user_id"),
      floor(col("value") * lit(100.0) + lit(0.5)).as("cents"))

  private val Files = 16
  private val statCols = Seq("user_id", "cents")

  test("zorderBy bounds BOTH dimensions per file; a 2-D box reads fewer files") {
    // Three layouts of the same rows into the same number of "files"
    // (partitions stand in for files; each is one writer task's output):
    // arrival order (range by event_id — uncorrelated with either dim),
    // single-column sort (perfect on user_id, blind on cents), and Z-order.
    val byArrival = events.repartitionByRange(Files, col("event_id"))
    val byUser = events.repartitionByRange(Files, col("user_id"), col("event_id"))
    // persisted: the soundness check below evaluates byZ twice (fileStats and
    // the __file-tagged frame), and repartitionByRange samples its range
    // boundaries per execution — without one materialization, boundary rows
    // could land in different partitions across the two evaluations and the
    // prunedRows == fullRows assert would flake (the same cross-evaluation
    // hazard Sampling.inclusiveRunningSum persists against)
    val byZ = Layout.zorderBy(events, col("user_id"), col("cents"), Files).persist()

    val sArrival = Layout.fileStats(byArrival, statCols).persist()
    val sUser = Layout.fileStats(byUser, statCols).persist()
    val sZ = Layout.fileStats(byZ, statCols).persist()
    try {
      // A cents-narrow, user-wide box: the second dimension is the only
      // selective one. The user-sorted layout cannot prune it at all; the
      // Z-order layout concentrates small-cents rows in the low-z files.
      val valueBox = Map("user_id" -> (0L, 200L), "cents" -> (0L, 1000L))
      val zReads = Layout.filesRead(sZ, valueBox)
      assert(zReads < Layout.filesRead(sArrival, valueBox),
        "z-order must beat the arrival-order layout on a 2-D box")
      assert(zReads < Layout.filesRead(sUser, valueBox),
        "z-order must prune the dimension a single-column sort is blind on")

      // A box selective in BOTH dims still prunes under z-order.
      val tightBox = Map("user_id" -> (10L, 19L), "cents" -> (0L, 2000L))
      assert(Layout.filesRead(sZ, tightBox) < Files.toLong)

      // Pruning is sound: reading only surviving files yields exactly the
      // rows an unpruned scan finds (no box row lives in a pruned file).
      val surviving = sZ.filter(col("max_cents") >= 0 && col("min_cents") <= 1000)
        .select("__file").collect().map(_.getInt(0)).toSet
      val withFile = byZ.withColumn("__file", spark_partition_id())
      val prunedRows = withFile
        .filter(col("__file").isin(surviving.toSeq.map(x => x: Any): _*))
        .filter(col("cents") <= 1000)
        .count()
      val fullRows = events.filter(col("cents") <= 1000).count()
      assert(prunedRows == fullRows, "pruned scan must not lose rows")
    } finally { sArrival.unpersist(); sUser.unpersist(); sZ.unpersist(); byZ.unpersist() }
  }

  test("zorderBy preserves the row multiset (layout only, never content)") {
    val before = events.groupBy("event_id").count()
    val after = Layout.zorderBy(events, col("user_id"), col("cents"), Files)
      .groupBy("event_id").count()
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty)
  }
}
