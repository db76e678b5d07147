package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed n-gram importance weights (Xie et
  * al. 2023, "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): score every raw-corpus document by how much its hashed
  * token-feature distribution looks like a TARGET corpus (the domain you
  * want more of) relative to the raw corpus itself, then keep the top
  * scorers. DSIR's weight is Π_f p_target(f)/p_raw(f) over a doc's hashed
  * features; this implementation ranks by the per-token MEAN of the
  * add-one-smoothed count ratio in fixed-point integer arithmetic —
  *
  *   q(b) = ((ct(b)+1) · 10⁶) div (cr(b)+1),   score(doc) = Σ n_b·q(b) / Σ n_b
  *
  * — so the score is exact (integer ratios, BIGINT sums, one final correctly
  * rounded division) and the DuckDB oracle hash-verifies the whole path,
  * where a log-space product would inherit libm's cross-engine rounding.
  * Ranking is what resampling consumes; the arithmetic mean replaces the
  * geometric one as the published recipe's monotone stand-in (constant
  * normalization factors cancel in ranking).
  *
  * Scale posture (100 TB): the model is the point — hashed features mean the
  * weight table is AT MOST `dim` rows (4096), so both distributions reduce
  * via map-side-combined hash aggs to broadcastable size, and scoring is one
  * broadcast join over per-(doc, bucket) counts (themselves one linear
  * shuffle with no hot keys). The target corpus is scanned once; nothing
  * corpus-sized ever reaches the driver or a broadcast.
  */
object Dsir {

  /** Hashed feature dimension (Xie et al. use 10⁴ buckets; 4096 matches the
    * repo's fastText-shaped scorer so the two model-based gates share a
    * feature space). */
  val featureBuckets: Int = 4096

  /** Fixed-point scale for the smoothed count ratio: 6 decimal digits. */
  val fixedPoint: Long = 1000000L

  private def bucketCounts(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.TextFns.tokens(col(textCol))).as("__t"))
      .select(col(idCol),
        pmod(graft.expressions.PolyHash(col("__t")), lit(dim.toLong)).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))

  /** (idCol, weight): per-doc importance weight of every `raw` document
    * toward `target`'s hashed-unigram distribution. Higher = more
    * target-like. Deterministic on any cluster size. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int = featureBuckets): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val rawCounts = bucketCounts(raw, idCol, textCol, dim)
    val bucketRaw = rawCounts.groupBy("__b").agg(sum("__c").as("__cr"))
    val bucketTgt = bucketCounts(target, idCol, textCol, dim)
      .groupBy("__b").agg(sum("__c").as("__ct"))
    val ratio = bucketRaw.join(bucketTgt, Seq("__b"), "left")
      .select(col("__b"),
        expr(s"((coalesce(__ct, 0L) + 1L) * ${fixedPoint}L) div (__cr + 1L)").as("__q"))
    rawCounts.join(broadcast(ratio), "__b")
      .groupBy(col(idCol))
      .agg((sum(col("__c") * col("__q")).cast("double") /
            sum(col("__c")).cast("double")).as("weight"))
  }

  /** The k most target-like raw docs, ties to the smallest id — a
    * distributed TakeOrdered, never a global sort. */
  def topKByImportance(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, dim: Int = featureBuckets): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    importanceWeights(raw, target, idCol, textCol, dim)
      .orderBy(col("weight").desc, col(idCol)).limit(k)
  }
}
