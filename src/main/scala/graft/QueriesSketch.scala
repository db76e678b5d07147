package graft

import org.apache.spark.sql.functions._

import graft.Tables._

/** Approximate-aggregation (sketch) operators. These are in the catalog
  * WITHOUT oracle SQL: Spark's HLL++ / DataSketches / KLL implementations are
  * deterministic for a given input but algorithm-specific, so no DuckDB query
  * computes the same values (the driver records the weaker rows-only check;
  * SketchSpec bounds the estimates against exact answers instead).
  *
  * Scale posture: sketches are the 100 TB answer to distinct-count and
  * quantile questions — fixed-size mergeable state, partial (map-side)
  * aggregation, and re-aggregation without touching raw data again
  * (demonstrated by the per-nation → per-region merge below).
  */
object SketchQueries {

  // Approximate distinct customers per return flag (HLL++, rsd 1%), with the
  // exact distinct alongside for scale-free contexts.
  private val aggApproxDistinct = Q(
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    None)

  // Approximate quantiles per group (scalar outputs; accuracy 10000).
  private val aggApproxQuantile = Q(
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"))
        .orderBy("l_linestatus"),
    None)

  // Mergeable-sketch re-aggregation: build one DataSketches HLL sketch of
  // customer keys per nation, then MERGE the nation sketches up to regions
  // and estimate — the raw rows are read once; the rollup reuses sketch
  // state. This is the shape that makes 100 TB distinct-count rollups cheap.
  private val aggHllMerge = Q(
    (s, d) => {
      val perNation = customer(s, d)
        .groupBy("c_nationkey")
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      perNation
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_cust"))
        .orderBy("n_regionkey")
    },
    None)

  val all: List[(String, Q)] = List(
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_approx_quantile" -> aggApproxQuantile,
    "agg_hll_merge" -> aggHllMerge)
}
