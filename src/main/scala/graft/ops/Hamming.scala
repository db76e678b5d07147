package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Hamming-distance near-dup over fixed-width integer fingerprints
  * (SimHash signatures, image perceptual hashes) via pigeonhole banding.
  *
  * The classic Manku/Jain/Sarma trick (WWW 2007, "Detecting Near-Duplicates
  * for Web Crawling"): to find all pairs at Hamming distance ≤ d over
  * `bits`-wide fingerprints, split the fingerprint into d+1 disjoint bit
  * blocks — a pair differing in at most d bits MUST agree exactly on at
  * least one block (pigeonhole), so an equi join on (block index, block
  * bits) generates a candidate superset, and an exact popcount(xor) verify
  * keeps precisely the true pairs. Unlike MinHash/hyperplane LSH this is
  * LOSSLESS: recall is 1.0 by construction, which is why the DuckDB oracle
  * for the catalog entry can be the plain brute-force predicate.
  *
  * Scale posture (100 TB): fingerprints are one long per row; banding
  * explodes each row into d+1 (block, key, id) rows and the ONLY shuffle is
  * the equi join on (block, key) — candidate volume per key is C(df, 2)
  * where df is the number of fingerprints sharing a (block, key) bucket,
  * 2^{bits/(d+1)} buckets per block (256 per block at 32/4 — widen `bits`
  * or shrink `d` as the corpus grows, exactly the SimHash-paper geometry of
  * 64-bit prints at d=3). The verify join re-attaches the two longs by id
  * and runs popcount in codegen; no broadcast grows with the corpus, no
  * driver collects.
  *
  * The band geometry ([[blocks]]/[[bandKey]]) is shared with the STREAMING
  * twin (`streaming.StatefulOps.streamingNearDupHamming`), so the online
  * ingest path shards state across exactly the buckets this batch join
  * would build — the two paths cannot disagree about candidate generation.
  */
object Hamming {

  /** (lo, width) of each pigeonhole block: d+1 near-equal blocks covering
    * the low `bits` bits (the last block may be narrower). */
  private[graft] def blocks(bits: Int, maxDist: Int): Seq[(Int, Int)] = {
    require(bits > 0 && bits <= 64, s"bits must be in 1..64, got $bits")
    require(maxDist >= 0 && maxDist < bits,
      s"maxDist must be in 0..${bits - 1}, got $maxDist")
    val nBands = maxDist + 1
    val width = (bits + nBands - 1) / nBands
    (0 until nBands).map { b =>
      val lo = b * width
      (lo, math.min(width, bits - lo))
    }
  }

  /** Scalar block key — the streaming path's per-row twin of the banded
    * Column expression below. `w` ≤ 63 by [[blocks]]' construction, so the
    * mask is exact. */
  private[graft] def bandKey(fp: Long, lo: Int, w: Int): Long =
    (fp >>> lo) & ((1L << w) - 1)

  /** One (id, fp, band, key) row per pigeonhole block of every input row —
    * the shared candidate-bucket projection of the batch join and the
    * streaming state sharding. */
  def bandRows(df: DataFrame, idCol: String, fpCol: String,
      bits: Int, maxDist: Int): DataFrame =
    df.select(col(idCol).cast("long").as("__id"), col(fpCol).cast("long").as("__fp"))
      .select(col("__id"), col("__fp"),
        posexplode(array(blocks(bits, maxDist).map { case (lo, w) =>
          shiftrightunsigned(col("__fp"), lo).bitwiseAND(lit((1L << w) - 1))
        }: _*)).as(Seq("__band", "__key")))

  /** All (id1, id2) pairs (id1 < id2) whose fingerprints differ in at most
    * `maxDist` of the low `bits` bits. `df` must expose `idCol` (numeric)
    * and `fpCol` (integral fingerprint; only the low `bits` bits are
    * significant). Distinct pairs, exact by the pigeonhole guarantee.
    *
    * Eager, like the Jaccard family's pair builders: the fingerprint frame
    * is PERSISTED (2 longs/row — upstream fingerprints like SimHash's
    * 32-sum aggregation or an image decode are the expensive part, and a
    * plain self-join would run that pipeline once per side), the pair set
    * materializes to a local checkpoint while the cache is live, and the
    * cache is released before returning. */
  def nearDupPairs(df: DataFrame, idCol: String, fpCol: String,
      bits: Int, maxDist: Int): DataFrame = {
    val fps = df.select(col(idCol).cast("long").as("__id"),
      col(fpCol).cast("long").as("__fp")).persist()
    try {
      val bands = bandRows(fps, "__id", "__fp", bits, maxDist)
      val cand = bands.as("a").join(bands.as("b"),
          col("a.__band") === col("b.__band") && col("a.__key") === col("b.__key") &&
            col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("id1"), col("a.__fp").as("fp1"),
          col("b.__id").as("id2"), col("b.__fp").as("fp2"))
        .distinct()
      val mask = if (bits == 64) lit(-1L) else lit((1L << bits) - 1)
      cand.filter(bit_count(col("fp1").bitwiseXOR(col("fp2")).bitwiseAND(mask)) <= maxDist)
        .select("id1", "id2")
        .localCheckpoint(true)
    } finally fps.unpersist()
  }
}
