package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** TextFns.hashedModelScore — the fastText-shaped hashed linear quality
  * scorer. The weights are an arithmetic table, so a driver-side brute
  * force can reproduce the exact doubles (same left-fold order). */
class TextModelSpec extends SparkSpec {

  private val P = 1000000007L

  private def tokHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % P)

  private def weight(h: Long, dim: Long = 4096L): Double =
    (((h % dim) * 2654435761L + 7L) % P % 2001L - 1000L).toDouble / 1000.0

  private def score(text: String): Double = {
    val toks = text.trim.split("\\s+", -1).toSeq
    toks.foldLeft(0.0)((a, t) => a + weight(tokHash(t))) / toks.size
  }

  test("hashedModelScore equals the driver-side brute force bit-exactly") {
    import spark.implicits._
    val texts = Seq(
      "key agg row scan slow fast",
      "the a of and to in is",
      "solo",
      "x y z x y z x y z")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextFns.hashedModelScore(TextFns.tokens(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(got(i.toLong) == score(t), s"doc $i: ${got(i.toLong)} != ${score(t)}")
  }

  test("scoring is a pure per-row projection — no shuffle in the plan") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
      .select(col("id"), TextFns.hashedModelScore(TextFns.tokens(col("text"))).as("s"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
