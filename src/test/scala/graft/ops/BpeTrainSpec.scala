package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BpeTrain vs a sequential reference implementation of Sennrich-style BPE
  * (word-frequency table, overlapping pair counts, leftmost-nonoverlapping
  * merges, (count desc, pair asc) argmax), plus bit-determinism under
  * repartitioning and train/tokenize agreement. */
class BpeTrainSpec extends SparkSpec {

  // ---- sequential reference ------------------------------------------------
  private def refMergeWord(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: refMergeWord(rest, l, r)
      case a :: rest => a :: refMergeWord(rest, l, r)
      case Nil => Nil
    }

  private def refFit(words: Map[String, Long], k: Int): List[(String, String)] = {
    var vocab = words.map { case (w, f) => (w.map(_.toString).toList, f) }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    while (merges.size < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        vocab = vocab.map { case (syms, f) => (refMergeWord(syms, best._1, best._2), f) }
      }
    }
    merges.toList
  }

  private def corpus = Seq(
    (1L, "low low low lower lower lowest"),
    (2L, "new newer newest new new"),
    (3L, "wide wider widest low new"))

  test("fit learns the same merges as the sequential reference") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val words = corpus.flatMap(_._2.split("\\s+")).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val expected = refFit(words, k = 6)
    val (merges, vocab) = BpeTrain.fit(docs, "text", k = 6)
    try assert(merges == expected, s"got $merges, reference $expected")
    finally vocab.unpersist()
  }

  test("fit is deterministic under repartitioning") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val (m1, v1) = BpeTrain.fit(docs, "text", k = 5)
    val (m2, v2) = BpeTrain.fit(docs.repartition(7), "text", k = 5)
    try assert(m1 == m2)
    finally { v1.unpersist(); v2.unpersist() }
  }

  test("tokenize replays the merges to the trained vocabulary's symbols") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val (merges, vocab) = BpeTrain.fit(docs, "text", k = 6)
    try {
      val trained = vocab.collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      // tokenizing each distinct word alone must reproduce its final syms
      val words = trained.keys.toSeq.sorted
      val got = BpeTrain.tokenize(words.toDF("text"), "text", merges, "toks")
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      for (w <- words) assert(got(w) == trained(w),
        s"word '$w': tokenize ${got(w)} != trained ${trained(w)}")
    } finally vocab.unpersist()
  }

  test("merge semantics: overlapping run merges leftmost-first") {
    import spark.implicits._
    // "aaaa" with merge (a,a): leftmost non-overlap -> (aa)(aa); then
    // merge (aa,aa) -> (aaaa). The reference and the fold must agree.
    val docs = Seq((1L, "aaaa aaaa aa")).toDF("doc_id", "text")
    val (merges, vocab) = BpeTrain.fit(docs, "text", k = 2)
    try {
      assert(merges == List(("a", "a"), ("aa", "aa")), s"got $merges")
      val syms = vocab.filter(col("word") === "aaaa")
        .collect()(0).getSeq[String](1).toList
      assert(syms == List("aaaa"))
    } finally vocab.unpersist()
  }
}
