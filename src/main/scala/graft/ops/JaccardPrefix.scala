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

  /** Pick the join shape from the data: one cheap pass computes the max
    * shingle document frequency; a corpus with a hot shingle (df above
    * `hotDf`, e.g. shared boilerplate) routes through the prefix-filtered
    * join — whose candidate volume is bounded by rare-shingle collisions —
    * while a benign corpus takes the leaner inverted-index join. Both shapes
    * are lossless (identical output; JaccardPrefixSpec), so the guard is a
    * pure performance decision made per-corpus, not per-config. The shingle
    * df table is computed once, shared by the decision and the chosen path,
    * and released before return (the result materializes eagerly).
    */
  def nearDupPairsAuto(shingles: DataFrame, idCol: String, shingleCol: String,
      tau: Double, hotDf: Long): DataFrame =
    nearDupPairsAutoChosen(shingles, idCol, shingleCol, tau, hotDf)._1

  /** nearDupPairsAuto plus which path ran (true = prefix-filtered) — the
    * spec-observable decision. */
  private[graft] def nearDupPairsAutoChosen(shingles: DataFrame, idCol: String,
      shingleCol: String, tau: Double, hotDf: Long): (DataFrame, Boolean) = {
    require(hotDf > 1, s"hotDf must be > 1, got $hotDf")
    val shd = shingles.select(col(idCol).as("doc_id"), col(shingleCol).as("s"))
    val dfs = shd.groupBy("s").agg(count(lit(1)).as("df")).persist()
    try {
      val row = dfs.agg(max(col("df"))).head
      val maxDf = if (row.isNullAt(0)) 0L else row.getLong(0)
      val hot = maxDf > hotDf
      val pairs = if (hot) pairsWithDfs(shd, dfs, tau)
                  else invertedIndexPairs(shd, dfs, tau)
      // materialize while dfs is cached; no cache outlives the call
      (pairs.localCheckpoint(true), hot)
    } finally dfs.unpersist()
  }

  /** The inverted-index join shape (the catalog's historical
    * dedup_ngram_jaccard): join documents on shared shingles, count
    * intersections, |A∪B| = |A|+|B|−|A∩B|. Leaner than the prefix join on
    * benign corpora (fewer passes over the shingle rows) but emits C(df, 2)
    * rows per shingle — nearDupPairsAuto guards against that. `dfs` is the
    * (s, df) document-frequency table over `shd`'s (doc_id, s) rows.
    */
  private[graft] def invertedIndexPairs(shd: DataFrame, dfs: DataFrame,
      tau: Double): DataFrame = {
    val sizes = shd.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // df-1 shingles cannot produce a pair: dropping them BEFORE the
    // self-join is a semantic no-op that removes the bulk of the join input
    // (sizes still count all shingles).
    val shared = dfs.filter(col("df") > 1).select("s")
    val shdShared = shd.join(shared, "s")
    val inter = shdShared.as("a")
      .join(shdShared.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("id2") === col("s2.doc_id"))
      .filter(col("c").cast("double") /
        (col("s1.n") + col("s2.n") - col("c")).cast("double") >= tau)
      .select("id1", "id2")
  }

  def nearDupPairs(shingles: DataFrame, idCol: String, shingleCol: String,
      tau: Double): DataFrame = {
    require(tau > 0 && tau < 1, s"tau must be in (0,1), got $tau")
    val shd = shingles.select(col(idCol).as("doc_id"), col(shingleCol).as("s"))
    val dfs = shd.groupBy("s").agg(count(lit(1)).as("df"))
    pairsWithDfs(shd, dfs, tau)
  }

  /** Prefix-filtered join body over precomputed (s, df) frequencies. */
  private def pairsWithDfs(shd: DataFrame, dfs: DataFrame, tau: Double): DataFrame = {
    require(tau > 0 && tau < 1, s"tau must be in (0,1), got $tau")
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
