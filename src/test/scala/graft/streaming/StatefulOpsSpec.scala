package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StatefulOpsSpec extends SparkSpec {
  import StatefulOps._

  test("streaming dedup suppresses duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FpDoc]
    val q = streamingDedup(mem.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(FpDoc(1, "fpA", "hello"), FpDoc(2, "fpB", "world"), FpDoc(3, "fpA", "hello"))
      q.processAllAvailable()
      val b1 = spark.table("dedup_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(b1 == Set(1L, 2L))
      mem.addData(FpDoc(4, "fpA", "hello"), FpDoc(5, "fpC", "new"))
      q.processAllAvailable()
      val b2 = spark.table("dedup_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(b2 == Set(1L, 2L, 5L)) // the cross-batch fpA duplicate is dropped
    } finally q.stop()
  }

  test("running totals accumulate state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("totals_out").outputMode("append").start()
    try {
      mem.addData(UserEvent(7, 1.5), UserEvent(7, 2.5), UserEvent(8, 10.0))
      q.processAllAvailable()
      mem.addData(UserEvent(7, 6.0))
      q.processAllAvailable()
      val rows = spark.table("totals_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Double]("total")))
      assert(rows.contains((7L, 2L, 4.0)))  // batch 1 state
      assert(rows.contains((7L, 3L, 10.0))) // batch 2 accumulates on it
      assert(rows.contains((8L, 1L, 10.0)))
    } finally q.stop()
  }
}
