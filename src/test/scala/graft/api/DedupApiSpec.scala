package graft.api

import graft.SparkSpec

/** The public Dedup DataFrame API must agree with the oracle-verified
  * catalog entries on the same corpus — the no-drift contract. */
class DedupApiSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("nearDupPairs matches the catalog's dedup_ngram_jaccard") {
    val api = Dedup.nearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val catalog = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(api == catalog)
  }

  test("nearDupClusters matches the catalog's dedup_cluster") {
    val api = Dedup.nearDupClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val catalog = graft.SparkEntry.queries("dedup_cluster")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(api == catalog)
  }

  test("incrementalNearDup admits exactly the batch docs without a corpus near-dup") {
    import org.apache.spark.sql.functions._
    // split the corpus on doc_id parity so both sides are non-trivial
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val admitted = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // reference: full pairwise near-dup over the union — a batch doc is
    // admissible iff none of its pairs crosses into the corpus
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val rejected = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a).collect {
        case (x, y) if batchIds(x) && !batchIds(y) => x
      }
    }.toSet
    assert(admitted == (batchIds -- rejected))
    assert(rejected.nonEmpty, "fixture should exercise at least one rejection")
  }

  test("incrementalNearDup admits shingle-less (short) batch docs") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val batch = Seq((2L, "alpha beta"), (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 2 has < 3 tokens → no shingles → admitted; doc 3 is an exact dup → dropped
    assert(got == Set(2L))
  }

  test("exact and normalized dedup shrink the corpus monotonically") {
    val n = docs.count()
    val exact = Dedup.exactDedup(docs, "doc_id", "text").count()
    val norm = Dedup.normalizedDedup(docs, "doc_id", "text").count()
    assert(norm <= exact && exact <= n)
    assert(norm > 0)
  }
}
