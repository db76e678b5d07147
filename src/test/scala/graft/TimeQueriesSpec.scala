package graft

import org.apache.spark.sql.functions._

/** Edge-case semantics of the hand-rolled time-series operators, exercised
  * through the SAME helpers the catalog queries use (TimeQueries.asofJoin /
  * expandBands) so a regression in the production formulation fails here.
  */
class TimeQueriesSpec extends SparkSpec {

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("as-of semantics: no prior right row -> null; equal ts matches; latest wins") {
    import spark.implicits._
    val clicks = Seq((1L, ts(5), 0L), (1L, ts(10), 1L), (2L, ts(3), 2L))
      .toDF("user_id", "ts", "event_id")
    val purchases = Seq((1L, ts(5), 100L), (1L, ts(8), 200L))
      .toDF("user_id", "ts", "pe_id")
    val got = TimeQueries.asofJoin(clicks, purchases, "user_id", "ts", Seq("pe_id"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.get(r.fieldIndex("pe_id"))).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(0L).contains(100L)) // click at :05 matches purchase AT :05 (>= semantics)
    assert(got(1L).contains(200L)) // click at :10 takes the latest prior (:08), not :05
    assert(got(2L).isEmpty)        // user 2 has no purchases -> null
  }

  test("range-join bucketing covers band edges exactly (half-open intervals)") {
    import spark.implicits._
    val W = 10L
    val bands = Seq((0L, 10L, "a"), (10L, 30L, "b")).toDF("lo", "hi", "band")
    val expanded = TimeQueries.expandBands(bands, W)
    val vals = Seq(0L, 9L, 10L, 29L).toDF("v")
      .withColumn("bucket", floor(col("v") / W))
    val got = vals.join(expanded, Seq("bucket"))
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("v", "band").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "a", 9L -> "a", 10L -> "b", 29L -> "b"))
  }
}
