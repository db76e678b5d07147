package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregation (sketch) behavior: HLL distinct counts within
  * their error bound vs exact, approx quantiles bracket exact medians.
  * Engine-specific sketches have no cross-engine oracle, so the catalog
  * entries (SketchQueries) are rows-only checked by the driver and
  * accuracy-bounded here against exact answers.
  */
class SketchSpec extends SparkSpec {
  private val dir = sf("sf0.01")

  test("catalog sketch queries: estimates within bounds of exact answers") {
    val li = Tables.lineitem(spark, dir)
    val got = SparkEntry.queries("agg_approx_distinct")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val err = math.abs(got(k) - ex).toDouble / ex
      assert(err < 0.05, s"flag=$k exact=$ex approx=${got(k)} err=$err")
    }

    val q = SparkEntry.queries("agg_approx_quantile")(spark, dir).collect()
    assert(q.forall(r => r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3)),
      "p50 <= p95 <= p99 ordering violated")

    val merged = SparkEntry.queries("agg_hll_merge")(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val exactRegion = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey").agg(countDistinct(col("c_custkey")).as("x"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    exactRegion.foreach { case (k, ex) =>
      val err = math.abs(merged(k) - ex) / ex
      assert(err < 0.05, s"region=$k exact=$ex merged-est=${merged(k)} err=$err")
    }
  }

  test("approx_count_distinct is within rsd bound of exact") {
    val li = Tables.lineitem(spark, dir)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02)).head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"exact=$exact approx=$approx err=$err")
  }

  test("approx quantile brackets the exact median") {
    val o = Tables.orders(spark, dir)
    val Array(approxMed) = o.stat.approxQuantile("o_totalprice", Array(0.5), 0.01)
    val n = o.count()
    val below = o.filter(col("o_totalprice") <= approxMed).count().toDouble / n
    assert(below > 0.45 && below < 0.55, s"approx median at quantile $below")
  }
}
