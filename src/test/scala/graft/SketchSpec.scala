package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregation (sketch) behavior: HLL distinct counts within
  * their error bound vs exact, approx quantiles bracket exact medians.
  * These are engine-specific sketches (no cross-engine oracle possible),
  * so they live as specs rather than catalog queries.
  */
class SketchSpec extends SparkSpec {
  private val dir = sf("sf0.01")

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
