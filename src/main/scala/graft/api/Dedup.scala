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
