package graft.api

import org.apache.spark.sql.Column

/** Public dedup-policy API: the thresholds and normalization rules the
  * operator catalog runs with. Library users tune their corpus here (or pass
  * explicit values to the operators in [[Similarity]] / graft.ops); the
  * catalog entries read these defaults so driver-verified behavior and the
  * public API cannot drift apart.
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
}
