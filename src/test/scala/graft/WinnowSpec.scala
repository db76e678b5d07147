package graft

import org.apache.spark.sql.functions._

/** The MOSS winnowing guarantee the oracle can't express as a property:
  * any two docs sharing a token run of ≥ w+k−1 tokens share at least one
  * fingerprint, and the fingerprint set is partitioning-independent. */
class WinnowSpec extends SparkSpec {

  private def fps(rows: Seq[(Long, String)], parts: Int = 1): Map[Long, Set[Long]] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
    val in = if (parts > 1) df.repartition(parts) else df
    val gh = graft.expressions.GramHashes(
      graft.functions.TextFns.tokens(col("text")), 3)
    in.select(col("doc_id"), gh.as("gh"))
      .filter(size(col("gh")) >= 4)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("gh")) - 3),
        i => array_min(slice(col("gh"), i, lit(4))))).as("fp"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  test("docs sharing a >= w+k-1 token run share a fingerprint; disjoint docs don't") {
    // shared run of 6 tokens = w+k-1 (w=4 windows of k=3 grams) embedded in
    // otherwise disjoint text
    val run = "alpha beta gamma delta epsilon zeta"
    val a = s"one two three $run four five six"
    val b = s"seven eight nine ten $run eleven twelve"
    val c = "completely different words with zero overlap here at all"
    val m = fps(Seq(1L -> a, 2L -> b, 3L -> c))
    assert((m(1L) & m(2L)).nonEmpty, "shared run must share a winnow fingerprint")
    assert((m(1L) & m(3L)).isEmpty && (m(2L) & m(3L)).isEmpty,
      "disjoint docs must not collide")
  }

  test("fingerprint sets are partitioning-independent on the real corpus") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(fps(docs) == fps(docs, parts = 13))
  }
}
