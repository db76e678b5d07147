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

  test("event-time-timeout sessionization closes sessions behind the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime + min * 60000L)
    val mem = MemoryStream[TimedEvent]
    val withWm = mem.toDS().withWatermark("ts", "0 seconds").as[TimedEvent]
    val q = sessionizeWithTimeout(withWm, gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      mem.addData(TimedEvent(1, ts(0), 1.0), TimedEvent(1, ts(2), 2.0), TimedEvent(2, ts(1), 5.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // nothing closed yet
      // advance event time far past both sessions' gap → both time out
      mem.addData(TimedEvent(3, ts(30), 9.0))
      q.processAllAvailable()
      mem.addData(TimedEvent(3, ts(31), 1.0)) // extra batch so timeouts fire
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total")))
        .toSet
      assert(rows.contains((1L, 2L, 3.0)), s"got $rows")
      assert(rows.contains((2L, 1L, 5.0)), s"got $rows")
    } finally q.stop()
  }

  test("gap-separated events close the open session even before its timeout fires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime + min * 60000L)
    val mem = MemoryStream[TimedEvent]
    val withWm = mem.toDS().withWatermark("ts", "0 seconds").as[TimedEvent]
    val q = sessionizeWithTimeout(withWm, gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_gap_out").outputMode("append").start()
    try {
      mem.addData(TimedEvent(1, ts(0), 1.0))
      q.processAllAvailable()
      // next event for the SAME user lands 20 min later (> gap) in the next
      // batch — it must start a second session, not extend the first
      mem.addData(TimedEvent(1, ts(20), 2.0))
      q.processAllAvailable()
      // flush: advance the watermark far past both sessions, twice so the
      // timeout batch runs
      mem.addData(TimedEvent(9, ts(50), 0.0))
      q.processAllAvailable()
      mem.addData(TimedEvent(9, ts(51), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_gap_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total")))
        .toSet
      assert(rows.contains((1L, 1L, 1.0)), s"first session missing: $rows")
      assert(rows.contains((1L, 1L, 2.0)), s"second session missing: $rows")
      assert(!rows.contains((1L, 2L, 3.0)), s"gap-separated sessions were fused: $rows")
    } finally q.stop()
  }

  test("a late event more than gap before the open session becomes its own session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime + min * 60000L)
    val mem = MemoryStream[TimedEvent]
    // generous watermark delay so the late event is still delivered
    val withWm = mem.toDS().withWatermark("ts", "30 minutes").as[TimedEvent]
    val q = sessionizeWithTimeout(withWm, gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_late_out").outputMode("append").start()
    try {
      mem.addData(TimedEvent(1, ts(30), 3.0)) // open session started 10:30
      q.processAllAvailable()
      // late events at 10:06/10:07: > gap before the open session's start ->
      // they form their OWN session (merged together), not fused into 10:30
      mem.addData(TimedEvent(1, ts(7), 1.0), TimedEvent(1, ts(6), 0.5))
      q.processAllAvailable()
      // flush: advance the watermark past every session, twice so the
      // timeout batch runs (30-minute watermark delay)
      mem.addData(TimedEvent(9, ts(90), 0.0))
      q.processAllAvailable()
      mem.addData(TimedEvent(9, ts(91), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_late_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total")))
        .toSet
      assert(rows.contains((1L, 2L, 1.5)), s"late events not merged into own session: $rows")
      assert(rows.contains((1L, 1L, 3.0)), s"original session missing: $rows")
      assert(!rows.exists(r => r._1 == 1L && r._2 == 3L), s"late events fused into open session: $rows")
    } finally q.stop()
  }

  test("streaming LSH near-dup matches the batch operator across batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (nBands, bits) = (8, 5)
    val rnd = new scala.util.Random(13)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val v1 = vec()
    val docs = Seq(1L -> v1, 2L -> vec(), 4L -> vec(), 3L -> v1.clone())
    // the same BandKeys projection the batch index uses, one row per band
    def banded(ds: org.apache.spark.sql.Dataset[(Long, Array[Float])]) =
      ds.toDF("doc_id", "embedding")
        .select(col("doc_id"), col("embedding"),
          posexplode(graft.expressions.BandKeys(col("embedding"), nBands, bits))
            .as(Seq("band", "key")))
        .select("doc_id", "band", "key", "embedding").as[BandedDoc]
    val mem = MemoryStream[(Long, Array[Float])]
    val q = streamingNearDupLsh(banded(mem.toDS()), tau = 0.9)
      .writeStream.format("memory").queryName("lsh_out").outputMode("append").start()
    try {
      mem.addData(docs(0), docs(1)) // batch 1: docs 1, 2 — no pair yet
      q.processAllAvailable()
      assert(spark.table("lsh_out").count() == 0)
      mem.addData(docs(2), docs(3)) // batch 2: doc 3 is doc 1's exact copy
      q.processAllAvailable()
      val got = spark.table("lsh_out").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      // batch reference over the full corpus: exactly the planted pair
      val want = graft.api.Similarity.lshCosineNearDup(
          docs.toDF("vec_id", "embedding"), "vec_id", "embedding", 0.9, nBands, bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want == Set((1L, 3L)), s"batch reference surprised us: $want")
      assert(got == want,
        s"streaming pairs $got diverge from the batch operator's $want")
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

  test("streaming budget admission matches the batch mixture prefix rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val budgets = Map("en" -> 1200L, "zh" -> 600L)
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("lang"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    // the batch op over the FULL corpus (its own admission order)
    val batchAdmitted = graft.ops.Sampling.mixtureByBudget(
        docs, "doc_id", "lang", "n_tok", budgets, salt = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // feed the stream the first 30 docs of the batch admission order, one
    // micro-batch each (iterator order within a group is only pinned this
    // way; a real stream has no global order — the op's documented contract)
    val fed = docs
      .withColumn("__o", graft.ops.Sampling.bucketOf(col("doc_id"), 7L, 1000000))
      .orderBy("__o", "doc_id")
      .select("doc_id", "lang", "n_tok").limit(30).collect()
      .map(r => BudgetDoc(r.getLong(0), r.getString(1), r.getLong(2)))
    val mem = MemoryStream[BudgetDoc]
    val q = streamingBudgetAdmission(mem.toDS(), budgets)
      .writeStream.format("memory").queryName("budget_out").outputMode("append").start()
    try {
      for (d <- fed) { mem.addData(d); q.processAllAvailable() }
      val got = spark.table("budget_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_tok")).toMap
      // same admitted set as the batch op restricted to the fed prefix
      // (a fed doc's inclusive cum depends only on its in-group
      // predecessors, all of which are in the prefix)
      val fedIds = fed.map(_.doc_id).toSet
      assert(got.keySet == (batchAdmitted & fedIds))
      // and the cumulative totals are the true inclusive running sums
      val byGroup = fed.groupBy(_.group)
      for ((g, ds) <- byGroup; budget = budgets.get(g)) {
        var cum = 0L
        for (d <- ds) {
          cum += d.n_tok
          if (budget.exists(cum <= _)) assert(got(d.doc_id) == cum,
            s"cum mismatch for doc ${d.doc_id} in group $g")
        }
      }
      // unlisted groups (de/fr/es) are dropped entirely
      assert(got.keySet.forall(id => fed.find(_.doc_id == id).get.group match {
        case "en" | "zh" => true; case _ => false
      }))
    } finally q.stop()
  }

  test("streaming hamming near-dup matches the batch pigeonhole operator") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (bits, maxDist) = (32, 3)
    // clustered fingerprints so ≤3-bit pairs occur, like HammingSpec's corpus
    val rnd = new scala.util.Random(99)
    val seeds = Seq.fill(6)(rnd.nextInt().toLong & 0xffffffffL)
    val fps = (0 until 80).map { i =>
      val base = seeds(rnd.nextInt(seeds.size))
      (i.toLong, (0 until rnd.nextInt(5)).foldLeft(base)((f, _) => f ^ (1L << rnd.nextInt(32))))
    }
    // the same bandRows projection the batch join builds candidates from
    def banded(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Hamming.bandRows(df, "doc_id", "fp", bits, maxDist)
        .select(col("__id").as("doc_id"), col("__band").as("band"),
          col("__key").as("key"), col("__fp").as("fp"))
        .as[BandedFp]
    val mem = MemoryStream[(Long, Long)]
    val q = streamingNearDupHamming(
      banded(mem.toDS().toDF("doc_id", "fp")), bits, maxDist)
      .writeStream.format("memory").queryName("ham_out").outputMode("append").start()
    try {
      // several micro-batches: matches must span batch boundaries via state
      fps.grouped(25).foreach { chunk => mem.addData(chunk: _*); q.processAllAvailable() }
      val got = spark.table("ham_out").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      val want = graft.ops.Hamming.nearDupPairs(
          fps.toDF("doc_id", "fp"), "doc_id", "fp", bits, maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty, "test corpus must contain close pairs")
      assert(got == want,
        s"streaming pairs diverge from batch: extra=${got -- want} missing=${want -- got}")
    } finally q.stop()
  }

}
