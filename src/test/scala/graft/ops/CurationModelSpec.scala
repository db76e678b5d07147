package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties of the corpus-trained model gates (unigram-LM surprisal, DSIR
  * importance weights) and cluster canonicalization that the DuckDB oracle
  * can't express: brute-force agreement on a hand-built corpus,
  * partitioning-independence, and the target≡raw fixed point. */
class CurationModelSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def corpus(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("UnigramLM.surprisal matches a driver-side brute force") {
    val rows = Seq(
      1L -> "the the the cat",
      2L -> "the cat sat here",
      3L -> "zyzzyva qwerty plugh xyzzy")
    val got = UnigramLM.surprisal(corpus(rows), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // brute force: N = 12 tokens; c(the)=4, c(cat)=2, rest 1
    val counts = rows.flatMap(_._2.split("\\s+")).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = counts.values.sum
    def s(t: String): Long = java.lang.Long.toBinaryString(n / counts(t)).length.toLong
    for ((id, text) <- rows) {
      val toks = text.split("\\s+").toSeq
      val expect = toks.map(s).sum.toDouble / toks.size
      assert(got(id)._1 == toks.size, s"n_tok mismatch for doc $id")
      assert(got(id)._2 == expect, s"surprisal mismatch for doc $id: ${got(id)._2} vs $expect")
    }
    // rare-token doc must out-score the common-token doc
    assert(got(3L)._2 > got(1L)._2)
  }

  test("UnigramLM.surprisal is partitioning-independent") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text")
    val a = UnigramLM.surprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = UnigramLM.surprisal(docs.repartition(13), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("Dsir: target ≡ raw gives every doc exactly the fixed-point unit weight") {
    val docs = corpus(Seq(1L -> "alpha beta", 2L -> "gamma gamma delta"))
    val w = Dsir.importanceWeights(docs, docs, "doc_id", "text")
      .collect().map(r => r.getDouble(1))
    assert(w.forall(_ == Dsir.fixedPoint.toDouble),
      s"self-weights must all be ${Dsir.fixedPoint}: ${w.toSeq}")
  }

  test("Dsir ranks target-vocabulary docs above off-target docs; deterministic") {
    // target speaks only {aa bb cc}; raw has two docs in-vocabulary and two off
    val target = corpus(Seq(100L -> "aa bb cc aa bb", 101L -> "cc aa bb"))
    val raw = corpus(Seq(
      1L -> "aa bb cc",
      2L -> "bb cc aa aa",
      3L -> "xx yy zz",
      4L -> "qq rr ss xx"))
    val top2 = Dsir.topKByImportance(raw, target, "doc_id", "text", k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(1L, 2L), s"expected in-vocabulary docs to win: $top2")
    val a = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Dsir.importanceWeights(raw.repartition(7), target.repartition(3),
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("Dedup.bestPerCluster keeps the argmax-score doc, ties to smallest id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster")
    val scores = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 7L), (5L, 2L), (6L, 2L))
      .toDF("doc_id", "n_tok")
    val kept = graft.api.Dedup.bestPerCluster(clusters, "doc_id", scores, "n_tok")
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    // cluster 1: 2 and 3 tie at 30 → smallest id 2; cluster 4: singleton;
    // cluster 5: 5 and 6 tie at 2 → 5
    assert(kept == Map(1L -> 2L, 4L -> 4L, 5L -> 5L))
  }
}
