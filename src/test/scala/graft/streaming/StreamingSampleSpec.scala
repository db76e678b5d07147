package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.Sampling

case class SDoc(doc_id: Long, lang: String)

/** The sampling/splitting ops are stateless hash expressions, so they run
  * UNCHANGED on a stream — the same split assignment a batch backfill
  * computes, with no state store and no watermark. That is the operational
  * point of hash-based splitting at 100 TB: the streaming ingest path and
  * the batch path cannot disagree about which side of train/test a
  * document lands on. */
class StreamingSampleSpec extends SparkSpec {

  test("hashSplit and stratifiedSample run on a stream and match batch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 300L).map(i => SDoc(i, if (i % 3 == 0) "en" else "zh"))
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

    val mem = MemoryStream[SDoc]
    val streamed = Sampling.stratifiedSample(
      Sampling.hashSplit(mem.toDF(), "doc_id", w),
      "doc_id", "lang", Map("en" -> 0.5), defaultRate = 0.25, salt = 1L)
    val q = streamed.writeStream.format("memory").queryName("split_out")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(100): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(100): _*) // second batch: same rules, no state
      q.processAllAvailable()
      val got = spark.table("split_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val want = Sampling.stratifiedSample(
          Sampling.hashSplit(docs.toDF(), "doc_id", w),
          "doc_id", "lang", Map("en" -> 0.5), defaultRate = 0.25, salt = 1L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == want, "streaming and batch split/mix assignments diverged")
      assert(got.nonEmpty && got.size < docs.size)
    } finally q.stop()
  }
}
