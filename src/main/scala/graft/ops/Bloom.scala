package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.expressions.{BloomAgg, BloomContains}

/** Approximate membership for ingestion-scale dedup: build a Bloom filter
  * over a corpus's fingerprints in ONE distributed aggregation (partials
  * OR-merge — the native [[graft.expressions.BloomAgg]]), broadcast the
  * packed bits, and probe each new batch row inside whole-stage codegen.
  *
  * This is the shape a 100 TB ingest actually runs when the exact corpus
  * index is too expensive to join per batch: the filter is n·~10 BITS
  * regardless of document size (1.2 GB for 10⁹ docs at 1% FP — broadcast
  * range), the build is one corpus pass that never shuffles anything but
  * partial bitmaps, and the probe is a map-side expression. The contract
  * is asymmetric by construction: NO false negatives (a known duplicate is
  * always caught) and a tunable false-positive rate (a novel doc is
  * wrongly dropped with probability ~(1−e^(−kn/m))^k — the classic bound),
  * which is the right direction for dedup: losing ~1% of novel crawl is
  * cheap, admitting duplicates is not. Exact twin: `Dedup.incrementalNearDup`.
  */
object Bloom {

  /** Aggregate Column: packed Bloom filter (binary) over a BIGINT column. */
  def bloomAgg(c: Column, numBits: Int, numHashes: Int): Column =
    GraftBridge.column(BloomAgg(GraftBridge.expression(c), numBits, numHashes)
      .toAggregateExpression())

  /** Membership probe Column against a packed-filter Column (a plan literal
    * via `lit(bytes)` — fine for spec-sized filters; production callers
    * should prefer the broadcast overload below). */
  def mightContain(filter: Column, c: Column, numHashes: Int): Column =
    GraftBridge.column(BloomContains(
      GraftBridge.expression(filter), GraftBridge.expression(c), numHashes))

  /** Membership probe Column against a `SparkContext.broadcast` filter: the
    * bits ship once per executor instead of riding inside every task's
    * serialized expression tree — the only executable shape at the design
    * ceiling (128 MB of filter). Probe stays whole-stage codegen. */
  def mightContain(filter: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      c: Column, numHashes: Int): Column =
    GraftBridge.column(graft.expressions.BloomContainsBroadcast(
      filter, GraftBridge.expression(c), numHashes))

  /** Hard ceiling on a single filter: 2³⁰ bits = 128 MB of packed bits —
    * ≈ 1.1×10⁸ items at 1% FP (9.6 bits/item). [[geometry]] REFUSES sets
    * that need more instead of silently clamping (a clamp would quietly
    * degrade the FP rate, which for dedup means quietly dropping novel
    * docs); beyond the ceiling, partition the corpus and build one filter
    * per partition (the probe ORs across them), or raise `fpRate`. */
  val MaxBits: Int = 1 << 30

  /** Geometry for a target false-positive rate: optimal bits/element is
    * −ln(p)/ln(2)², k = bits/element·ln(2) — the textbook sizing. Throws if
    * the sized filter would exceed [[MaxBits]] (see there). */
  def geometry(expectedItems: Long, fpRate: Double): (Int, Int) = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpRate > 0 && fpRate < 1, s"fpRate must be in (0,1), got $fpRate")
    val bitsPerItem = -math.log(fpRate) / (math.log(2) * math.log(2))
    val needed = math.max(64.0, math.ceil(expectedItems * bitsPerItem))
    require(needed <= MaxBits.toDouble,
      f"$expectedItems%d items at fpRate=$fpRate%g need ${needed.toLong}%d bits > " +
        s"the $MaxBits-bit (128 MB) single-filter ceiling — partition the corpus " +
        "into per-partition filters or raise fpRate")
    val k = math.max(1, math.round(bitsPerItem * math.log(2)).toInt)
    (needed.toLong.toInt, math.min(16, k))
  }

  /** Build the packed filter over `df(col)` (BIGINT fingerprints): one
    * aggregation job; only the packed bits (numBits/8 bytes) reach the
    * driver. */
  def build(df: DataFrame, c: Column, numBits: Int, numHashes: Int): Array[Byte] = {
    val rows = df.select(bloomAgg(c, numBits, numHashes).as("f")).collect()
    rows(0).getAs[Array[Byte]](0)
  }

  /** Approximate incremental EXACT dedup — the Bloom twin of
    * `Dedup.incrementalNearDup` at fingerprint granularity: admit a batch
    * doc iff its normalized-text fingerprint is (probably) NOT in the
    * corpus. One corpus aggregation builds the filter sized for `fpRate`
    * at the measured corpus count; the batch probe is a map-side codegen
    * filter against the broadcast bits — no join, no shuffle, the
    * streaming-legal shape (the probe column is stateless, so it also
    * drops into a `readStream` ingest unchanged). Known duplicates are
    * NEVER admitted (no false negatives); a novel batch doc is wrongly
    * dropped with probability ~`fpRate`. */
  def incrementalExactDedup(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, fpRate: Double = 0.01): DataFrame = {
    def fp(t: Column) = xxhash64(graft.api.Dedup.normalized(t))
    val n = math.max(1L, corpus.count())
    val (numBits, numHashes) = geometry(n, fpRate)
    val filter = build(corpus, fp(col(textCol)), numBits, numHashes)
    // broadcast handle, not lit(filter): at the 128 MB ceiling a literal is
    // re-serialized into every task binary; the broadcast ships per executor
    val bc = corpus.sparkSession.sparkContext.broadcast(filter)
    batch.filter(!mightContain(bc, fp(col(textCol)), numHashes))
  }
}
