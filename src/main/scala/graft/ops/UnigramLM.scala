package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model surprisal scoring — the CCNet-style
  * LM quality gate (Wenzek et al. 2020, arXiv:1911.00359 run a KenLM and keep
  * low-perplexity documents) re-expressed with a QUANTIZED, bit-exact
  * surprisal so the DuckDB oracle can hash-verify it: instead of −ln p(tok)
  * (libm `log` is not identically rounded across engines, and double sums
  * across a shuffle are order-dependent), each token instance scores its
  * inverse probability's binary digit count,
  *
  *   bits(N div c(tok)) = ⌊log2(N / c(tok))⌋ + 1   (exactly, via `bin()`),
  *
  * i.e. its surprisal −log2 p quantized to whole bits — the same monotone
  * rarity signal, computed entirely in exact integer arithmetic (BIGINT
  * `div`, binary-string length), summed as BIGINT (order-independent), and
  * divided once at the end (IEEE division is correctly rounded). A doc of
  * common words scores low, a doc of rare/garbled tokens scores high — the
  * gate keeps the low end exactly as CCNet's perplexity filter does.
  * Swapping in a true −ln p (or a trained KenLM via a model join) changes
  * one expression; the distributed shape is identical.
  *
  * Scale posture (100 TB): per-(doc, token) counts are one hash shuffle with
  * map-side combine (no hot keys — "the" spreads across doc ids); the vocab
  * count is a second hash agg whose output is |vocab| rows; the corpus total
  * is a 1-row broadcast joined on a constant key (BroadcastHashJoin, never a
  * cartesian); the count join back to (doc, token) rows is keyed by token —
  * its worst-case skew ("the" = one partition) is bounded by docs-per-token
  * and AQE's skew-join split, and each probe matches exactly one build row
  * (no fan-out). Final per-doc agg is a third linear shuffle. No driver
  * collects, no corpus-sized broadcasts.
  */
object UnigramLM {

  /** Catalog keep-threshold: mean whole-bit surprisal ≤ tau keeps the doc
    * (CCNet keeps LOW perplexity). On the sf0.01 corpus scores run 5.0–5.5
    * bits/token; 5.05 keeps ≈75% — see the catalog entry. */
  val surprisalTau: Double = 5.05

  /** Per-document mean whole-bit surprisal under the corpus's own unigram
    * LM. Output: (idCol, n_tok, surprisal, keep) — one row per input doc.
    * `keep` = surprisal ≤ tau. */
  def surprisal(df: DataFrame, idCol: String, textCol: String,
      tau: Double = surprisalTau): DataFrame = {
    val inst = df.select(col(idCol),
      explode(graft.functions.TextFns.tokens(col(textCol))).as("__t"))
    val docTok = inst.groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val vocab = docTok.groupBy("__t").agg(sum("__c").as("__dfc"))
    // 1-row corpus total, joined on pmod(x, 1) — always 0 but non-foldable,
    // so the plan stays a BroadcastHashJoin (the repo's dummy-key
    // convention), never a nested-loop/cartesian.
    val total = vocab.agg(sum("__dfc").as("__n"))
      .withColumn("__k", pmod(col("__n"), lit(1L)))
    docTok.join(vocab, "__t")
      .withColumn("__k", pmod(col("__c"), lit(1L)))
      .join(broadcast(total), "__k")
      .withColumn("__s", length(bin(expr("__n div __dfc"))).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__ntok"), sum(col("__c") * col("__s")).as("__ssum"))
      .select(col(idCol), col("__ntok").as("n_tok"),
        (col("__ssum").cast("double") / col("__ntok").cast("double")).as("surprisal"))
      .withColumn("keep", col("surprisal") <= tau)
  }
}
