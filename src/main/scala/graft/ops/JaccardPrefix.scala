package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered n-gram Jaccard self-join (Bayardo et al. "Scaling Up All
  * Pairs Similarity Search", WWW'07; PPJoin, Xiao et al.): under a global
  * rarest-first shingle order, any pair with J ≥ τ must collide within each
  * side's first |A| − ⌈τ·|A|⌉ + 1 shingles (the minimum overlap is
  * ⌈τ/(1+τ)·(|A|+|B|)⌉ ≥ ⌈τ·|A|⌉ for size-compatible pairs), so only those
  * prefixes are indexed. The filter is LOSSLESS: output is identical to the
  * naive inverted-index join.
  *
  * When to use WHICH Jaccard join (both ship in this library; measured in
  * BASELINE.md r3):
  *  - The catalog's `dedup_ngram_jaccard` (inverted index over shared
  *    shingles + pair counting) is leaner on benign corpora — fewer passes
  *    over the shingle rows, and it won the sf0.1/sf10 benchmarks where no
  *    shingle is hot.
  *  - THIS operator is the 100 TB safety path: the inverted-index join emits
  *    C(df, 2) rows per shingle, so one boilerplate shingle shared by 1M
  *    docs produces ~5·10¹¹ join rows and the job never finishes. Here
  *    high-df shingles sort LAST in the canonical (df, shingle) order and
  *    essentially never enter a prefix — candidate volume is bounded by the
  *    rare-shingle collisions only. JaccardPrefixSpec drives a corpus with a
  *    shingle shared by EVERY document through both shapes' math to prove
  *    the point.
  *
  * `shingles` must be (id, shingle-hash) rows, DISTINCT per document.
  */
object JaccardPrefix {

  def nearDupPairs(shingles: DataFrame, idCol: String, shingleCol: String,
      tau: Double): DataFrame = {
    require(tau > 0 && tau < 1, s"tau must be in (0,1), got $tau")
    val shd = shingles.select(col(idCol).as("doc_id"), col(shingleCol).as("s"))
    val dfs = shd.groupBy("s").agg(count(lit(1)).as("df"))
    val ordered = shd.join(dfs, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"),
        collect_list(col("s")).as("hs"),
        count(lit(1)).as("n"))
    val pre = ordered.select(col("doc_id"), col("hs"), col("n"),
      explode(expr(s"slice(ord, 1, cast(n - ceil($tau * n) + 1 as int))")).as("p"))
      // a df=1 shingle occupies its prefix slot (the slice is over the full
      // ordered set) but can never produce a pair — dropping it AFTER the
      // slice is free, lossless index pruning
      .filter(col("p.df") > 1)
      .select(col("doc_id"), col("hs"), col("n"), col("p.s").as("s"))
    val a = pre.select(col("s"), col("doc_id").as("id1"), col("hs").as("hs1"), col("n").as("n1"))
    val b = pre.select(col("s"), col("doc_id").as("id2"), col("hs").as("hs2"), col("n").as("n2"))
    a.join(b, Seq("s"))
      .filter(col("id1") < col("id2") &&
        greatest(col("n1"), col("n2")) * tau <= least(col("n1"), col("n2")))
      .select(col("id1"), col("id2"), col("n1"), col("n2"),
        size(array_intersect(col("hs1"), col("hs2"))).cast("long").as("c"))
      .filter(col("c").cast("double") /
        (col("n1") + col("n2") - col("c")).cast("double") >= tau)
      .select("id1", "id2")
      .distinct() // a pair may collide on several prefix shingles
  }
}
