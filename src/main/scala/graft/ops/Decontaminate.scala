package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns.tokens

/** Benchmark decontamination: flag training documents that overlap an
  * evaluation/benchmark corpus at the n-gram level, so eval data can be
  * excluded from a training set before it leaks into the model.
  *
  * Overlap is counted over the repo's canonical 3-token shingle hashes
  * (expressions.ShingleHashes — the same inventory the Jaccard dedup
  * family uses, so "contaminated" composes with the dedup thresholds and
  * the DuckDB oracle twin reuses the existing shingle CTEs verbatim).
  *
  * Scale posture: the benchmark side (an eval suite — thousands of docs,
  * not billions) reduces to a DISTINCT shingle-hash set and broadcasts;
  * the corpus side is one scan → explode → broadcast-hash semi-join →
  * per-doc count. Nothing corpus-sized shuffles, so a 100 TB sweep costs
  * one pass over the text exactly like the other text metrics.
  */
object Decontaminate {

  /** Ceiling on the benchmark shingle inventory the inline/driver-side path
    * will materialize: 10⁷ longs ≈ 80 MB on the driver and as a broadcast
    * literal — generous for any real eval suite (thousands of docs), and a
    * LOUD `require` failure for a caller who feeds a training corpus as the
    * "benchmark" (which would otherwise OOM the driver far less legibly).
    * The bounded-benchmark premise is the contract; this makes it enforced
    * rather than assumed — same posture as Sampling.bucketOf's negative-id
    * check. */
  val MaxInlineShingles: Long = 10L * 1000 * 1000

  /** Per-document overlap flags: (id, n_hits, contaminated) for EVERY row
    * of `docs` — `n_hits` = how many of the doc's distinct shingles appear
    * anywhere in the benchmark corpus, `contaminated` = n_hits ≥
    * `minOverlap`. Docs too short to form a shingle (< 3 tokens) count 0.
    * A benchmark doc present in the corpus flags itself (n_hits = its
    * whole inventory) — exactly the leak the op exists to catch. */
  def flags(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, minOverlap: Long): DataFrame = {
    require(minOverlap > 0, s"minOverlap must be positive, got $minOverlap")
    val docSh = docs.select(col(idCol).as("id"),
      explode(array_distinct(
        graft.expressions.ShingleHashes(tokens(col(textCol))))).as("__h"))
    val benchSh = bench.select(explode(array_distinct(
        graft.expressions.ShingleHashes(tokens(col(benchTextCol))))).as("__h"))
      .distinct()
    val hits = docSh.join(broadcast(benchSh), "__h")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minOverlap)
  }

  /** [[flags]] as a STATELESS per-row transform: the benchmark shingle set
    * is materialized once (eval suites are bounded — thousands of docs —
    * which is the same premise that lets [[flags]] broadcast it) and the
    * per-doc overlap becomes `size(array_intersect(...))` against that
    * constant, so there is no explode, no join and no aggregation. That
    * makes it legal in a Structured Streaming ingest in append mode —
    * decontamination at the crawl frontier — where [[flags]]' groupBy
    * would demand an aggregation output mode. StreamingPipelineSpec
    * proves row-for-row parity with [[flags]]. */
  def flagsInline(docs: DataFrame, idCol: String, textCol: String,
      benchShingles: Array[Long], minOverlap: Long): DataFrame = {
    require(minOverlap > 0, s"minOverlap must be positive, got $minOverlap")
    require(benchShingles.length <= MaxInlineShingles,
      s"benchmark shingle set (${benchShingles.length}) exceeds MaxInlineShingles " +
        s"($MaxInlineShingles): this looks like a corpus, not an eval suite — " +
        "use Decontaminate.flags (broadcast semi-join) instead")
    docs.select(col(idCol).as("id"),
        size(array_intersect(
          array_distinct(graft.expressions.ShingleHashes(tokens(col(textCol)))),
          typedLit(benchShingles.toSeq))).cast("long").as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minOverlap)
  }

  /** EMBEDDING-space decontamination: flag corpus rows whose cosine to ANY
    * benchmark embedding reaches `tau` — the semantic complement of the
    * n-gram [[flags]]: a paraphrased or translated eval question shares few
    * 3-gram shingles with its source but sits close in embedding space, so
    * n-gram decontamination alone leaks reworded benchmarks into training
    * sets. Output mirrors [[flags]]: (id, n_hits, contaminated) for EVERY
    * corpus row, `n_hits` = how many benchmark embeddings clear `tau`.
    *
    * Scale posture: identical to [[flags]] with vectors in place of
    * shingles — the benchmark side is bounded (an eval suite) and rides a
    * dummy-key BroadcastHashJoin (the [[graft.api.Similarity.cosineTopK]]
    * pattern, so the codegen'd VecDot probe never leaves whole-stage
    * codegen and the corpus never shuffles); the per-doc count shuffles
    * only (id, partial count) and zeros re-attach by one id-keyed left
    * join. All cosine math is double with array-order summation, so the
    * DuckDB twin is bit-exact. */
  def semanticFlags(corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchVecCol: String, tau: Double): DataFrame = {
    import graft.expressions.VecDot
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    val e = corpus.select(col(idCol).as("id"), col(vecCol).as("__e"),
      VecDot(col(vecCol), col(vecCol)).as("__nn"))
    val b = bench.select(col(benchVecCol).as("__be"),
      VecDot(col(benchVecCol), col(benchVecCol)).as("__bn"))
    // the dummy key must be DATA-DEPENDENT on both sides: a literal key
    // constant-folds and Catalyst downgrades the equi join to a
    // BroadcastNestedLoopJoin (plan-linted in ScaleSpec)
    val hits = e.withColumn("__z", pmod(col("id").cast("long"), lit(1L)))
      .join(broadcast(b.withColumn("__z",
        pmod(size(col("__be")).cast("long"), lit(1L)))), Seq("__z"))
      .filter(VecDot(col("__e"), col("__be")) /
        (sqrt(col("__nn")) * sqrt(col("__bn"))) >= tau)
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= 1)
  }

  /** The distinct benchmark shingle inventory [[flagsInline]] consumes —
    * collected to the driver, so call it on the (bounded) benchmark side
    * only; fails loudly past [[MaxInlineShingles]] BEFORE the collect (the
    * count is a cheap distinct-agg job, the guard that makes the bounded
    * premise enforceable). Sorted for deterministic ordering. */
  def benchmarkShingles(bench: DataFrame, benchTextCol: String): Array[Long] = {
    val spark = bench.sparkSession
    import spark.implicits._
    val sh = bench.select(explode(array_distinct(
        graft.expressions.ShingleHashes(tokens(col(benchTextCol))))).as("h"))
      .distinct()
    val n = sh.count()
    require(n <= MaxInlineShingles,
      s"benchmark shingle set ($n) exceeds MaxInlineShingles ($MaxInlineShingles): " +
        "this looks like a corpus, not an eval suite — use Decontaminate.flags " +
        "(broadcast semi-join) instead")
    sh.as[Long].collect().sorted
  }
}
