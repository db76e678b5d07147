package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hamming.nearDupPairs vs a driver-side brute force: the pigeonhole band
  * join must be LOSSLESS (recall 1.0) and the popcount verify exact, on
  * random fingerprints, on adversarial fingerprints whose differing bits
  * all land inside one block, and at the 64-bit width where the block mask
  * arithmetic must not overflow. */
class HammingSpec extends SparkSpec {

  private def reference(fps: Seq[(Long, Long)], bits: Int, maxDist: Int): Set[(Long, Long)] = {
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    (for {
      (i1, f1) <- fps; (i2, f2) <- fps if i1 < i2
      if java.lang.Long.bitCount((f1 ^ f2) & mask) <= maxDist
    } yield (i1, i2)).toSet
  }

  private def run(fps: Seq[(Long, Long)], bits: Int, maxDist: Int): Set[(Long, Long)] = {
    import spark.implicits._
    Hamming.nearDupPairs(fps.toDF("id", "fp"), "id", "fp", bits, maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("random 32-bit fingerprints match brute force at d=3") {
    val rnd = new scala.util.Random(42)
    // cluster around a few seeds so distances ≤ 3 actually occur
    val seeds = Seq.fill(8)(rnd.nextInt().toLong & 0xffffffffL)
    val fps = (0 until 200).map { i =>
      val base = seeds(rnd.nextInt(seeds.size))
      val flips = (0 until rnd.nextInt(5)).map(_ => 1L << rnd.nextInt(32))
      (i.toLong, flips.foldLeft(base)(_ ^ _))
    }
    val expected = reference(fps, 32, 3)
    assert(expected.nonEmpty, "test corpus must contain close pairs")
    assert(run(fps, 32, 3) == expected)
  }

  test("adversarial: all differing bits inside one block still verified exactly") {
    // blocks at 32/4 are 8 bits wide; pairs differing in 3 bits of block 0
    // must pass (agree on blocks 1-3), pairs differing in 4 bits must not
    val base = 0x5a5a5a5aL
    val fps = Seq(
      0L -> base,
      1L -> (base ^ 0x07L), // 3 bits, all in block 0 → distance 3, kept
      2L -> (base ^ 0x0fL), // 4 bits, all in block 0 → distance 4, dropped
      3L -> (base ^ 0x01010100L)) // 3 bits spread across blocks 1-3, kept
    val got = run(fps, 32, 3)
    assert(got == reference(fps, 32, 3))
    assert(got.contains((0L, 1L)) && got.contains((0L, 3L)))
    assert(!got.contains((0L, 2L)))
  }

  test("64-bit width: mask arithmetic exact, top-bit fingerprints survive") {
    val fps = Seq(
      0L -> -1L,                   // all 64 bits set
      1L -> (-1L ^ (1L << 63)),    // differs only in the sign bit
      2L -> 0L,
      3L -> 3L)
    val got = run(fps, 64, 3)
    assert(got == reference(fps, 64, 3))
    assert(got.contains((0L, 1L)) && got.contains((2L, 3L)))
  }

  test("d=0 degenerates to exact fingerprint dedup") {
    val fps = Seq(0L -> 7L, 1L -> 7L, 2L -> 8L, 3L -> 7L)
    assert(run(fps, 32, 0) == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }
}
