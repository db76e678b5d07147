package graft.api

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact-substring span dedup (Lee et al. 2022 ExactSubstr as a distributed
  * k-gram inverted index): repeatedSpans against a driver-side brute force,
  * plus planted boilerplate / within-doc repetition / scrub behavior.
  */
class ExactSubstrSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Brute force on raw token strings (no hashing): dup = k-gram occurring
    * ≥2 times anywhere; spans = merged [p, p+k-1] hit ranges per doc. */
  private def bruteSpans(rows: Seq[(Long, String)], k: Int): Set[(Long, Int, Int)] = {
    val toks = rows.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val grams = toks.flatMap { case (id, ts) =>
      (0 to ts.length - k).map(i => (id, i + 1, ts.slice(i, i + k).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val hits = grams.filter(g => counts(g._3) >= 2)
      .map { case (id, p, _) => (id, p, p + k - 1) }
    hits.groupBy(_._1).toSeq.flatMap { case (id, hs) =>
      val sorted = hs.sortBy(_._2)
      val merged = scala.collection.mutable.ListBuffer[(Int, Int)]()
      for ((_, s0, e0) <- sorted) {
        if (merged.nonEmpty && s0 <= merged.last._2 + 1)
          merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, e0))
        else merged += ((s0, e0))
      }
      merged.map { case (s0, e0) => (id, s0, e0) }
    }.toSet
  }

  private def opSpans(d: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Int, Int)] =
    Dedup.repeatedSpans(d, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  test("repeatedSpans matches the brute force on the test corpus") {
    for (dDir <- Seq(sf("sf0.001"), sf("sf0.01")); k <- Seq(4, 8)) {
      val docs = spark.read.parquet(s"$dDir/documents.parquet")
      val rows = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val brute = bruteSpans(rows, k)
      val got = opSpans(docs, k)
      assert(got == brute,
        s"$dDir k=$k: missing=${(brute -- got).size} extra=${(got -- brute).size}")
    }
  }

  test("planted cross-doc boilerplate becomes exactly one span per doc; unique docs stay clean") {
    val boiler = "all rights reserved contact the site administrator for details"
    val d = df(
      1L -> s"alpha beta gamma delta $boiler epsilon zeta",
      2L -> s"one two three four five six seven eight nine $boiler",
      3L -> "totally unique words that appear nowhere else in this tiny corpus ok")
    val spans = opSpans(d, 8)
    // boiler = 9 tokens -> two overlapping 8-gram hits merged into one span
    assert(spans == Set((1L, 5, 13), (2L, 10, 18)), s"got $spans")
  }

  test("within-doc repetition is caught (count >= 2 includes same-doc occurrences)") {
    val rep = "the quick brown fox jumps over the lazy dog" // 9 tokens
    val d = df(1L -> s"$rep intermission tokens here $rep",
      2L -> "completely different text with no duplicated runs at all today")
    val spans = opSpans(d, 8)
    assert(spans.map(_._1) == Set(1L), s"got $spans")
    assert(spans == Set((1L, 1, 9), (1L, 13, 21)), s"got $spans")
  }

  test("scrubRepeatedSpans removes exactly the spanned tokens and keeps other columns") {
    val boiler = "all rights reserved contact the site administrator for details"
    val d = df(
      1L -> s"alpha beta gamma delta $boiler epsilon zeta",
      2L -> s"one two three four five six seven eight nine $boiler",
      3L -> "totally unique words that appear nowhere else in this tiny corpus ok")
      .withColumn("extra", col("doc_id") * 2)
    val out = Dedup.scrubRepeatedSpans(d, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text"), r.getAs[Long]("extra"))).toSet
    assert(out == Set(
      (1L, "alpha beta gamma delta epsilon zeta", 2L),
      (2L, "one two three four five six seven eight nine", 4L),
      (3L, "totally unique words that appear nowhere else in this tiny corpus ok", 6L)),
      s"got $out")
  }

  test("docs shorter than k tokens emit no grams and survive scrub unchanged") {
    val d = df(1L -> "short doc", 2L -> "short doc")
    assert(opSpans(d, 8).isEmpty)
    val out = Dedup.scrubRepeatedSpans(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "short doc"), (2L, "short doc")))
  }
}
