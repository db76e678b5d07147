package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

class JaccardPrefixSpec extends SparkSpec {

  private def shingleRows(d: String) =
    spark.read.parquet(s"$d/documents.parquet")
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(graft.expressions.ShingleHashes(TextFns.tokens(col("text"))))).as("s"))

  test("prefix filtering is lossless: identical pairs to the catalog's inverted-index join") {
    for (d <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val viaCatalog = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaPrefix = JaccardPrefix.nearDupPairs(shingleRows(d), "doc_id", "s", 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaPrefix == viaCatalog,
        s"$d: missing=${(viaCatalog -- viaPrefix).size} extra=${(viaPrefix -- viaCatalog).size}")
    }
  }

  /** 3000 docs, each with ~30 unique shingles, plus ONE shingle present in
    * all of them (boilerplate header). The inverted-index join would emit
    * C(3000,2) ≈ 4.5M rows for that shingle alone (≈45x the corpus's total
    * shingle rows, growing quadratically with corpus size); the prefix index
    * sorts it last (df = 3000) so it never generates a candidate. True
    * near-dup pairs: docs 3i and 3i+1 share 29 of 31 shingles (J ≈ 0.88).
    */
  private def hostileCorpus = {
    import spark.implicits._
    (0 until 3000).flatMap { i =>
      val base = (0 until 30).map(j => (i / 3 * 1000 + j).toLong) // trio shares a base pool
      val mine =
        if (i % 3 == 2) (0 until 30).map(j => (10000000L + i * 100 + j)) // unrelated doc, disjoint id space
        else base.drop(1) :+ (800000L + i) // near-dup twins differ in 2 shingles
      mine.map(s => (i.toLong, s)) :+ ((i.toLong, 424242L)) // the hot shingle
    }.toDF("doc_id", "s").distinct()
  }
  private val hostileExpected = (0 until 1000).map(t => (3L * t, 3L * t + 1)).toSet

  test("hot shingle shared by EVERY document: candidate volume stays linear, answer exact") {
    val pairs = JaccardPrefix.nearDupPairs(hostileCorpus, "doc_id", "s", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == hostileExpected,
      s"missing=${(hostileExpected -- pairs).size} extra=${(pairs -- hostileExpected).size}")
  }

  test("auto-select: hostile corpus routes through the prefix path, benign through the inverted index") {
    // benign: 50-doc real corpus — no shingle df can reach the hot cutoff
    val (benignPairs, benignHot) = JaccardPrefix.nearDupPairsAutoChosen(
      shingleRows(sf("sf0.001")), "doc_id", "s", 0.6, hotDf = 256L)
    assert(!benignHot, "benign corpus took the prefix path")
    val viaPrefix = JaccardPrefix.nearDupPairs(shingleRows(sf("sf0.001")), "doc_id", "s", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(benignPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == viaPrefix)
    // hostile: the 424242 boilerplate shingle has df=3000 > 256 → prefix path,
    // same exact answer (the guard is performance-only, lossless either way)
    val (hotPairs, hotHot) = JaccardPrefix.nearDupPairsAutoChosen(
      hostileCorpus, "doc_id", "s", 0.6, hotDf = 256L)
    assert(hotHot, "hostile corpus took the inverted-index path")
    assert(hotPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == hostileExpected)
  }
}
