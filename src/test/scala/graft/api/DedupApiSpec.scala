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

  test("dedupSegments equals a driver-side keep-first brute force") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b c d x y z w"),        // segs (w=2): "a b","c d","x y","z w"
      (2L, "a b c d q r"),            // "a b","c d" are later copies → dropped
      (3L, "q r a b"),                // "q r" duplicates doc 2's third seg
      (4L, "a b"),                    // entirely a later copy → empty clean_text
      (5L, "solo")                    // short doc, one 1-token segment
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSegments(fixture, "doc_id", "text", segTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // brute force: first (doc_id, seg_idx) occurrence of each segment wins
    val segsByDoc = Seq(
      1L -> Seq("a b", "c d", "x y", "z w"),
      2L -> Seq("a b", "c d", "q r"),
      3L -> Seq("q r", "a b"),
      4L -> Seq("a b"),
      5L -> Seq("solo"))
    val firstOwner = scala.collection.mutable.Map.empty[String, (Long, Int)]
    for ((id, segs) <- segsByDoc; (s, i) <- segs.zipWithIndex)
      if (!firstOwner.contains(s)) firstOwner(s) = (id, i)
    val want = segsByDoc.map { case (id, segs) =>
      val kept = segs.zipWithIndex.collect {
        case (s, i) if firstOwner(s) == (id, i) => s
      }
      (id, kept.mkString(" "), segs.size.toLong, (segs.size - kept.size).toLong)
    }
    assert(got.toSeq == want)
    assert(got.find(_._1 == 4L).get._2 == "", "fully-duplicated doc keeps empty text")
  }

  test("dedupSegments on a dup-free corpus is whitespace normalization") {
    import spark.implicits._
    val fixture = Seq((1L, "  p q  r s  t "), (2L, "u v w")).toDF("doc_id", "text")
    val got = Dedup.dedupSegments(fixture, "doc_id", "text", segTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "p q r s t", 0L), (2L, "u v w", 0L)))
  }

  test("CDC segments survive a head insertion where fixed-width reframes everything") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 200 distinct tokens; doc 2 = doc 1 with ONE token prepended
    val base = (0 until 200).map(i => s"w$i").mkString(" ")
    val docs = Seq(1L -> base, 2L -> s"inserted $base").toDF("doc_id", "text")
    def dropped(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("doc_id") === 2L).select("n_dropped").collect()(0).getLong(0)
    val cdcDrop = dropped(Dedup.dedupSegmentsCDC(docs, "doc_id", "text"))
    val fixedDrop = dropped(Dedup.dedupSegments(docs, "doc_id", "text"))
    // fixed-width: the +1 offset reframes every segment of doc 2 → ~no
    // repeats found; CDC: every boundary after the first cut realigns, so
    // most of doc 2's segments are exact repeats of doc 1's
    assert(cdcDrop > fixedDrop,
      s"CDC should beat fixed-width under insertion: $cdcDrop vs $fixedDrop")
    val nSegs = Dedup.dedupSegmentsCDC(docs, "doc_id", "text")
      .filter(col("doc_id") === 2L).select("n_segs").collect()(0).getLong(0)
    assert(cdcDrop >= nSegs / 2,
      s"most CDC segments must dedup away: $cdcDrop of $nSegs")
  }

  test("exact and normalized dedup shrink the corpus monotonically") {
    val n = docs.count()
    val exact = Dedup.exactDedup(docs, "doc_id", "text").count()
    val norm = Dedup.normalizedDedup(docs, "doc_id", "text").count()
    assert(norm <= exact && exact <= n)
    assert(norm > 0)
  }
}
