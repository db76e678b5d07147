package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Edge-case semantics of the hand-rolled time-series operators (the gate
  * checks them against DuckDB on real data; these pin the corner cases the
  * synthetic tables may not cover).
  */
class TimeQueriesSpec extends SparkSpec {

  private def asof(clicks: Seq[(Long, Int)], purchases: Seq[(Long, Int, Long)]) = {
    // Re-implements the join_asof union+window formulation over handcrafted
    // rows: (user, minute) clicks, (user, minute, purchase_id) purchases.
    import spark.implicits._
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val l = clicks.zipWithIndex
      .map { case ((u, m), i) => (u, ts(m), 1, i.toLong, Option.empty[Long]) }
      .toDF("user_id", "ts", "side", "event_id", "pe_id")
    val r = purchases.map { case (u, m, pid) => (u, ts(m), 0, -1L, Some(pid)) }
      .toDF("user_id", "ts", "side", "event_id", "pe_id")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("m_pe", last(col("pe_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("m_pe"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
  }

  test("as-of semantics: no prior purchase -> null; equal ts matches; latest wins") {
    val m = asof(
      clicks = Seq((1L, 5), (1L, 10), (2L, 3)),
      purchases = Seq((1L, 5, 100L), (1L, 8, 200L)))
    assert(m(0L).contains(100L)) // click at :05 matches purchase AT :05 (>= semantics)
    assert(m(1L).contains(200L)) // click at :10 takes the latest prior (:08), not :05
    assert(m(2L).isEmpty)        // user 2 has no purchases -> null
  }

  test("range-join bucketing covers band edges exactly (half-open intervals)") {
    import spark.implicits._
    val W = 10L
    val bands = Seq((0L, 10L, "a"), (10L, 30L, "b")).toDF("lo", "hi", "band")
    val expanded = bands.withColumn("bucket",
      explode(sequence(floor(col("lo") / W), floor((col("hi") - 1) / W))))
    val vals = Seq(0L, 9L, 10L, 29L).toDF("v")
      .withColumn("bucket", floor(col("v") / W))
    val got = vals.join(expanded, Seq("bucket"))
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("v", "band").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "a", 9L -> "a", 10L -> "b", 29L -> "b"))
  }
}
