package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

class EventStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly windowed aggregation over a real stream (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.hourlyByType(mem.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      mem.addData(
        Ev(ts("2024-01-01 10:05:00"), "click", 1.5, 1),
        Ev(ts("2024-01-01 10:55:00"), "click", 2.5, 2),
        Ev(ts("2024-01-01 11:05:00"), "view", 4.0, 1))
      q.processAllAvailable()
      val out = spark.table("hourly").collect()
      assert(out.length == 2)
      val clicks = out.find(_.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n_events") == 2)
      assert(clicks.getAs[Double]("total_value") == 4.0)
      assert(clicks.getAs[Timestamp]("ws") == ts("2024-01-01 10:00:00"))
    } finally q.stop()
  }

  test("streaming and batch events_window agree on the same input") {
    val batch = graft.SparkEntry.queries("events_window")(spark, sf("sf0.001"))
    val viaStreamingLogic = EventStream.hourlyByType(
        graft.Tables.events(spark, sf("sf0.001")))
      .orderBy("ws", "event_type")
    assert(batch.collect().map(_.toSeq.drop(0)).toSeq ==
      viaStreamingLogic.collect().map(_.toSeq).toSeq)
  }

  test("exactly-once parquet sink: streams commit per batch, replayed batch does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = "target/stream-spec/exactly_once"
    val ckpt = "target/stream-spec/exactly_once_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val mem = MemoryStream[Ev]
    val q = EventStream.exactlyOnceParquet(mem.toDF(), out, ckpt)
    try {
      mem.addData(Ev(ts("2024-01-01 10:05:00"), "click", 1.5, 1))
      q.processAllAvailable()
      mem.addData(
        Ev(ts("2024-01-01 10:55:00"), "click", 2.5, 2),
        Ev(ts("2024-01-01 11:05:00"), "view", 4.0, 1))
      q.processAllAvailable()
      val sunk = spark.read.parquet(out)
      assert(sunk.count() == 3)
      assert(sunk.select("batch_id").distinct().count() == 2)
      // failure replay: the engine re-runs the SAME micro-batch with the same
      // id; the dynamic-partition overwrite must replace, not duplicate
      val replay = Seq(
        Ev(ts("2024-01-01 10:55:00"), "click", 2.5, 2),
        Ev(ts("2024-01-01 11:05:00"), "view", 4.0, 1)).toDF()
      EventStream.writeBatch(replay, out, 1L)
      assert(spark.read.parquet(out).count() == 3, "replayed batch duplicated rows")
      // and the overwrite is scoped to its own partition: batch 0 intact
      assert(spark.read.parquet(out).filter(col("batch_id") === 0).count() == 1)
    } finally q.stop()
  }

  test("sessionize merges events within the gap") {
    import spark.implicits._
    val df = Seq(
      Ev(ts("2024-01-01 10:00:00"), "click", 1.0, 7),
      Ev(ts("2024-01-01 10:10:00"), "view", 1.0, 7),
      Ev(ts("2024-01-01 12:00:00"), "click", 1.0, 7)).toDF()
    val sessions = EventStream.sessionize(df).collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-stream attribution join matches the batch join across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class E(user_id: Long, event_id: Long, ts: Timestamp)
    val views = Seq(
      (7L, 100L, ts("2024-01-01 10:00:00")),
      (7L, 101L, ts("2024-01-01 10:20:00")),
      (8L, 102L, ts("2024-01-01 10:00:00")))
    val clicks = Seq(
      (7L, 200L, ts("2024-01-01 10:05:00")), // attributes to view 100
      (7L, 201L, ts("2024-01-01 10:25:00")), // attributes to view 101 only
      (8L, 202L, ts("2024-01-01 11:00:00")), // outside gap: no attribution
      (9L, 203L, ts("2024-01-01 10:05:00"))) // no view at all
    val vMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.toDF("user_id", "event_id", "ts")
    val q = EventStream.attributionJoin(shape(vMem.toDF()), shape(cMem.toDF()))
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    try {
      // views arrive in one batch, clicks in a LATER one: matches must come
      // from buffered stream-stream join state, not intra-batch locality
      vMem.addData(views: _*)
      q.processAllAvailable()
      cMem.addData(clicks: _*)
      q.processAllAvailable()
      val got = spark.table("attr_out").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id"))).toSet
      val want = EventStream.attributionJoin(
          shape(views.toDF()), shape(clicks.toDF())).collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id"))).toSet
      assert(want == Set((200L, 100L), (201L, 101L)),
        s"batch reference surprised us: $want")
      assert(got == want,
        s"streaming attribution diverges from batch: $got vs $want")
    } finally q.stop()
  }
}
