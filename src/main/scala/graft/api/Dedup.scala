package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public dedup API: the thresholds and normalization rules the operator
  * catalog runs with, plus the DataFrame front door to the whole dedup
  * family — exact, normalized, near-dup pairs (auto-selected join shape)
  * and near-dup clustering — over any (id, text) table. The catalog
  * entries exercise the same code paths with these defaults, so
  * driver-verified behavior and the public API cannot drift apart.
  */
object Dedup {

  /** Embedding-cosine near-dup threshold (X5/Y7 catalog entries). 0.45 sits
    * inside the synthetic corpus's similarity range so the operators have
    * output to verify; real corpora dedup at 0.8+ where LSH banding pays
    * (see [[Similarity.bandGeometry]]).
    */
  val cosineTau: Double = 0.45

  /** n-gram Jaccard near-dup threshold (X4 catalog entries). */
  val jaccardTau: Double = 0.6

  /** Document-frequency cutoff for the Jaccard hot-shingle guard: when any
    * shingle is shared by more than this many documents, the inverted-index
    * self-join would emit C(df, 2) candidate rows for it (a boilerplate
    * shingle shared by 1M docs → ~5·10¹¹ rows), so the catalog routes
    * through the lossless prefix-filtered join instead
    * (ops.JaccardPrefix). Below the cutoff the plain inverted index is
    * cheaper (fewer passes; measured in BASELINE.md).
    */
  val hotShingleDf: Long = 256L

  /** Text normalization applied before fingerprinting in normalized dedup:
    * lowercase, collapse whitespace runs, trim. */
  def normalized(text: Column): Column = graft.functions.TextFns.normalized(text)

  /** Exact dedup: one survivor (smallest id) per byte-identical text. One
    * hash shuffle on the text — the 100 TB shape. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(textCol).agg(min(col(idCol)).as(idCol)).select(idCol, textCol)

  /** Normalized dedup: one survivor (smallest id) per md5 of the
    * normalized text. Output: (idCol, fp). */
  def normalizedDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(normalized(col(textCol))).as("fp"))
      .groupBy("fp").agg(min(col(idCol)).as(idCol))
      .select(idCol, "fp")

  /** Per-doc distinct 3-gram shingle-hash sets — the shared upstream of the
    * Jaccard family (one compiled hashing pass per doc, no exploded
    * intermediate). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      array_distinct(graft.expressions.ShingleHashes(
        graft.functions.TextFns.tokens(col(textCol)))).as("hs"))

  /** Near-duplicate (id1, id2) pairs at Jaccard ≥ tau over 3-gram shingles,
    * with the join shape auto-selected per corpus (inverted index vs the
    * hot-shingle-safe prefix join — ops.JaccardPrefix). Checkpoint-backed. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double = jaccardTau, hotDf: Long = hotShingleDf): DataFrame =
    graft.ops.JaccardPrefix.nearDupPairsAutoSets(
      shingleSets(df, idCol, textCol), idCol, "hs", tau, hotDf)

  /** Incremental (batch-vs-corpus) near-dup admission — the ingestion shape
    * a 100 TB pipeline actually runs: a new crawl slice is admitted doc by
    * doc iff it has NO near-duplicate (n-gram Jaccard ≥ tau) already in the
    * corpus. The inverted shingle index is joined batch×corpus ONLY — the
    * corpus is never re-paired against itself, so cost is linear in the
    * batch's shingle volume times matched index rows, independent of
    * corpus-internal duplication. Returns the admitted batch rows
    * unchanged.
    *
    * At deployment scale the corpus side is a persisted index bucketed by
    * shingle hash, so the join reads only the buckets the batch's shingles
    * touch; here it is derived from the corpus frame on the fly. Batch
    * docs with fewer than 3 tokens have no shingles and are always
    * admitted (nothing to compare — same contract as [[nearDupPairs]]).
    *
    * Hot-shingle guard (same auto-decision as [[nearDupPairs]], driven by
    * the CORPUS-side max shingle df — the 100 TB side): past `hotDf` the
    * candidate join routes through the lossless prefix filter
    * (ops.JaccardPrefix.crossPairsAutoSets), so one boilerplate shingle
    * ("all rights reserved…") present in 10⁶ corpus docs cannot emit 10⁶
    * join rows per batch doc; below it the leaner inverted cross join runs,
    * with cost ≤ hotDf index rows per batch shingle occurrence — the linear
    * contract above, now enforced rather than assumed.
    */
  def incrementalNearDup(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, tau: Double = jaccardTau,
      hotDf: Long = hotShingleDf): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    val pairs = graft.ops.JaccardPrefix.crossPairsAutoSets(
      shingleSets(batch, idCol, textCol), shingleSets(corpus, idCol, textCol),
      idCol, "hs", tau, hotDf)
    batch.join(pairs.select(col("bid").as(idCol)).distinct(), Seq(idCol), "left_anti")
  }

  /** Near-duplicate clusters: connected components over [[nearDupPairs]],
    * every doc labeled with the smallest reachable id (singletons label
    * themselves). Output: (idCol, cluster). */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      tau: Double = jaccardTau, hotDf: Long = hotShingleDf): DataFrame = {
    val labels = graft.ops.ConnectedComponents.labels(
      nearDupPairs(df, idCol, textCol, tau, hotDf))
    val singletons = df.select(col(idCol).as("id"))
      .join(labels.select("id"), Seq("id"), "left_anti")
      .withColumn("label", col("id"))
    labels.union(singletons)
      .select(col("id").as(idCol), col("label").as("cluster"))
  }
}
