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

  test("exact and normalized dedup shrink the corpus monotonically") {
    val n = docs.count()
    val exact = Dedup.exactDedup(docs, "doc_id", "text").count()
    val norm = Dedup.normalizedDedup(docs, "doc_id", "text").count()
    assert(norm <= exact && exact <= n)
    assert(norm > 0)
  }
}
