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
    // percentile_approx(accuracy=10000) guarantees rank error <= N/accuracy.
    // Check the actual rank of each returned p50 against that bound (plus a
    // couple of rows of slack for ties at the boundary value).
    q.foreach { r =>
      val status = r.getString(0)
      val grp = li.filter(col("l_linestatus") === status)
      val n = grp.count().toDouble
      val below = grp.filter(col("l_extendedprice") <= r.getDouble(1)).count() / n
      val bound = 1.0 / 10000 + 4 / n
      assert(math.abs(below - 0.5) <= bound,
        s"status=$status p50 rank ${below} outside 0.5±$bound (accuracy=10000)")
    }

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

  test("serialized sketch state is deterministic: identical bytes across runs") {
    // Re-aggregation at 100 TB relies on sketches being stable artifacts: the
    // same input must produce byte-identical state so persisted rollups are
    // reproducible. HLL register state is a per-register max — commutative
    // and order-insensitive — so two independent runs over the same
    // deterministic scan must agree byte-for-byte, both for the per-group
    // sketches and for the merged (union) sketch.
    def perNation(): Seq[(Int, Seq[Byte])] = Tables.customer(spark, dir)
      .groupBy("c_nationkey")
      .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      .orderBy("c_nationkey").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]]("sk").toSeq).toSeq
    val run1 = perNation()
    val run2 = perNation()
    assert(run1 == run2, "per-group HLL sketch bytes differ across identical runs")

    def mergedBytes(): Seq[Byte] = Tables.customer(spark, dir)
      .groupBy("c_nationkey")
      .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      .agg(hll_union_agg(col("sk")).as("u"))
      .head().getAs[Array[Byte]]("u").toSeq
    assert(mergedBytes() == mergedBytes(), "merged HLL union bytes differ across runs")

    // estimate-level determinism for the other two catalog sketches
    def distinctRun() = SparkEntry.queries("agg_approx_distinct")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(distinctRun() == distinctRun(), "approx_count_distinct not deterministic")
    def quantileRun() = SparkEntry.queries("agg_approx_quantile")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(quantileRun() == quantileRun(), "percentile_approx not deterministic")
  }

  test("approx_count_distinct is within 3x rsd of exact") {
    // rsd is the standard deviation of the HLL++ estimator; 3σ is the
    // tightest bound that holds deterministically-per-input without being
    // flaky across register-hash luck on other columns.
    val li = Tables.lineitem(spark, dir)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02)).head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 3 * 0.02, s"exact=$exact approx=$approx err=$err (3x rsd=0.06)")
  }

  test("approx quantile respects the configured relativeError rank bound") {
    // approxQuantile(relativeError=0.01) guarantees the returned value's rank
    // is within 0.01*N of the target rank — assert that actual bound (plus
    // tie slack), not a loose ±0.05 window.
    val o = Tables.orders(spark, dir)
    val Array(approxMed) = o.stat.approxQuantile("o_totalprice", Array(0.5), 0.01)
    val n = o.count().toDouble
    val below = o.filter(col("o_totalprice") <= approxMed).count() / n
    val bound = 0.01 + 4 / n
    assert(math.abs(below - 0.5) <= bound,
      s"approx median at quantile $below, outside 0.5±$bound")
  }
}
