package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.{CorpusPipeline, Dedup}

case class RawDoc(doc_id: Long, text: String, lang: String)

/** The corpus pipeline's front end — clean → quality filter → exact dedup —
  * runs as a Structured Streaming job with NO code changes: stages 1–2 are
  * stateless per-row expressions (CorpusPipeline.cleanQuality), and the
  * exact-dedup stage maps onto the keyed-state streamingDedup operator.
  * This is the 100 TB ingest posture: filter and dedup at the crawl
  * frontier, continuously, instead of materializing junk for a nightly
  * batch to delete — while provably keeping the batch path's semantics.
  */
class StreamingPipelineSpec extends SparkSpec {

  private val cfg = CorpusPipeline.Config(minTokens = 5L)

  // Stopword-bearing texts so the quality floor passes; one doc fails it.
  private val docs = Seq(
    RawDoc(1L, "the quick brown fox jumps over the lazy dog", "en"),
    RawDoc(2L, "<p>the   quick brown fox</p> jumps over the lazy dog", "en"), // dup of 1 after clean
    RawDoc(3L, "a stitch in time saves nine they always say", "en"),
    RawDoc(4L, "too short", "en"), // fails the token floor
    RawDoc(5L, "every good boy deserves fruit and the band played on", "en"),
    RawDoc(6L, "the QUICK brown FOX jumps over the LAZY dog", "en")) // dup of 1 normalized

  test("clean→quality→exact-dedup streams with batch-identical survivors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[RawDoc]
    val front = CorpusPipeline.cleanQuality(mem.toDF(), "doc_id", "text", "lang", cfg)
    val fpd = front.select(col("id").as("doc_id"),
        md5(Dedup.normalized(col("text"))).as("fp"), col("text"))
      .as[StatefulOps.FpDoc]
    val q = StatefulOps.streamingDedup(fpd)
      .writeStream.format("memory").queryName("pipe_front").outputMode("append").start()
    try {
      // duplicates arrive in LATER batches than their originals (ids in
      // arrival order), so first-seen == smallest id, the batch contract
      mem.addData(docs.take(3): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("pipe_front").select("doc_id")
        .collect().map(_.getLong(0)).toSet

      val batchFront = CorpusPipeline.cleanQuality(
        docs.toDF(), "doc_id", "text", "lang", cfg)
      val batch = Dedup.normalizedDedup(batchFront, "id", "text")
        .select("id").collect().map(_.getLong(0)).toSet

      assert(streamed == batch,
        s"streaming front end $streamed diverged from batch $batch")
      assert(streamed == Set(1L, 3L, 5L), s"unexpected survivor set $streamed")
    } finally q.stop()
  }

  test("inline decontamination streams in append mode, matching the batch flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val shingles = graft.ops.Decontaminate.benchmarkShingles(bench, "text")
    assert(shingles.nonEmpty)

    val mem = MemoryStream[RawDoc]
    val q = graft.ops.Decontaminate
      .flagsInline(mem.toDF(), "doc_id", "text", shingles, minOverlap = 3L)
      .writeStream.format("memory").queryName("decontam_out")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(3): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("decontam_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val batch = graft.ops.Decontaminate
        .flags(docs.toDF(), "doc_id", "text", bench, "text", minOverlap = 3L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(streamed == batch,
        s"streaming decontamination $streamed diverged from batch $batch")
      // docs 1 and 6 carry the benchmark text (doc 6 differs only by case —
      // shingles are case-sensitive, so only the lowercase tokens collide)
      assert(streamed.exists { case (id, _, c) => id == 1L && c })
    } finally q.stop()
  }

  test("OOV scoring with a frozen vocab is stateless on a stream, batch-identical") {
    import spark.implicits._
    import graft.functions.TextFns
    implicit val sqlCtx = spark.sqlContext

    // freeze the vocab from the batch corpus (top-5 by count desc, token) —
    // the same deterministic rule as text_oov_rate's top-1000
    val tok = docs.toDF().select(col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("tok"))
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(5)
      .select("tok").as[String].collect().toSeq

    // batch twin: the catalog entry's broadcast-join shape
    val batchScores = tok
      .join(vocab.toDF("tok").withColumn("__v", lit(1L)), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(coalesce(col("__v"), lit(0L))).as("n_in"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // stream: per-row expression only — no join, no state, no shuffle
    val mem = MemoryStream[RawDoc]
    val q = mem.toDF().select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tok"),
        TextFns.inVocabCount(TextFns.tokens(col("text")), vocab)
          .cast("long").as("n_in"))
      .writeStream.format("memory").queryName("oov_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("oov_stream")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(streamed == batchScores,
        s"streaming OOV $streamed diverged from batch $batchScores")
    } finally q.stop()
  }

  test("flagsInline refuses a corpus-sized 'benchmark' set instead of OOMing the driver") {
    import spark.implicits._
    val docs1 = Seq((1L, "a b c d")).toDF("doc_id", "text")
    // one past the documented ceiling (80 MB of zeros — allocatable here,
    // but the typedLit/broadcast it would become is the failure mode)
    val oversized = new Array[Long]((graft.ops.Decontaminate.MaxInlineShingles + 1).toInt)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Decontaminate.flagsInline(docs1, "doc_id", "text", oversized, 3L)
    }
    assert(e.getMessage.contains("MaxInlineShingles"))
    // at the ceiling exactly: accepted (the require is a bound, not a cliff
    // below it) — plan construction must not throw
    val atCeiling = graft.ops.Decontaminate.flagsInline(
      docs1, "doc_id", "text", Array(1L, 2L, 3L), 3L)
    assert(atCeiling.columns.toSeq == Seq("id", "n_hits", "contaminated"))
  }
}
