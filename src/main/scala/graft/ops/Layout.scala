package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.MortonCode2

/** Multi-dimensional data layout (Z-order clustering) + the file-statistics
  * pruning model that makes it pay.
  *
  * A 100 TB table is read through per-file min/max column statistics
  * (parquet footers / lakehouse manifests): a scan skips every file whose
  * [min, max] range cannot intersect the predicate. A single-column sort
  * gives perfect pruning on ONE column and none on the others; sorting by
  * the Morton interleave of two keys ([[graft.expressions.MortonCode2]])
  * bounds BOTH dimensions per file, so 2-D box predicates prune on each —
  * the OPTIMIZE ZORDER trade (Morton 1966, as productized by Delta Lake /
  * Iceberg; public docs, original implementation).
  *
  * The layout op itself is one range exchange + a local sort — exactly a
  * shuffle-write pass, no driver state; [[fileStats]]/[[filesRead]] model
  * the pruning so the win is MEASURED (LayoutSpec), not asserted.
  */
object Layout {
  /** Z-curve clustering key of two dimension columns (each cast to long;
    * must be in [0, 2^31) — MortonCode2 throws loudly otherwise). */
  def zValue(x: Column, y: Column): Column =
    MortonCode2(x.cast("long"), y.cast("long"))

  /** Cluster `df` on the Z-curve of (x, y) into `files` output partitions:
    * range-partition by the interleaved key, then sort locally — each
    * partition becomes one tight Z-curve segment (= one parquet file under
    * a writer). Returns the clustered frame with the key dropped, ordering
    * preserved. */
  def zorderBy(df: DataFrame, x: Column, y: Column, files: Int): DataFrame =
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** The per-file statistics a lakehouse manifest would store for this
    * layout: one row per partition with [min, max] of each listed column.
    * Runs as one partial-agg pass — no extra shuffle beyond the layout's. */
  def fileStats(df: DataFrame, statCols: Seq[String]): DataFrame = {
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    df.withColumn("__file", spark_partition_id())
      .groupBy("__file").agg(aggs.head, aggs.tail: _*)
  }

  /** How many files a conjunctive box predicate must read under `stats`
    * (from [[fileStats]]): a file survives pruning iff every queried
    * column's [min, max] intersects its [lo, hi]. Stats frames are
    * files-sized (tiny); this is driver-side planning arithmetic, the same
    * computation a lakehouse scan planner runs against the manifest. */
  def filesRead(stats: DataFrame, box: Map[String, (Long, Long)]): Long = {
    val pred = box.map { case (c, (lo, hi)) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    stats.filter(pred).count()
  }
}
