package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom build/probe contracts: zero false negatives (the dedup-safety
  * half), measured false-positive rate near the designed bound, OR-merge
  * determinism under repartitioning, and the composed incremental dedup. */
class BloomSpec extends SparkSpec {

  test("no false negatives: every inserted fingerprint probes true") {
    import spark.implicits._
    val vals = (0L until 5000L).map(_ * 2654435761L)
    val (bits, k) = Bloom.geometry(vals.size, 0.01)
    val filter = Bloom.build(vals.toDF("v"), col("v"), bits, k)
    val misses = vals.toDF("v")
      .filter(!Bloom.mightContain(lit(filter), col("v"), k))
      .count()
    assert(misses == 0L, s"$misses inserted values probed false")
  }

  test("false-positive rate lands near the designed 1%") {
    import spark.implicits._
    val inserted = (0L until 20000L).map(_ * 31L + 7L)
    val (bits, k) = Bloom.geometry(inserted.size, 0.01)
    val filter = Bloom.build(inserted.toDF("v"), col("v"), bits, k)
    // disjoint probe set (odd multiples of a different stride)
    val probes = (0L until 20000L).map(i => i * 1000003L + 999983L)
    assert(probes.toSet.intersect(inserted.toSet).isEmpty)
    val fps = probes.toDF("v")
      .filter(Bloom.mightContain(lit(filter), col("v"), k))
      .count()
    val rate = fps.toDouble / probes.size
    assert(rate < 0.03, f"measured FP rate $rate%.4f far above the 0.01 design")
  }

  test("build is deterministic under repartitioning (OR-merge)") {
    import spark.implicits._
    val vals = (0L until 3000L).map(i => i * i + 13L)
    val (bits, k) = Bloom.geometry(vals.size, 0.01)
    val f1 = Bloom.build(vals.toDF("v"), col("v"), bits, k)
    val f2 = Bloom.build(vals.toDF("v").repartition(17), col("v"), bits, k)
    assert(java.util.Arrays.equals(f1, f2))
  }

  test("incremental exact dedup: known duplicates never admitted, novel mostly kept") {
    import spark.implicits._
    val corpus = (0L until 2000L).map(i => (i, s"corpus document number $i body"))
      .toDF("doc_id", "text")
    val dupBatch = (0L until 200L).map(i => (10000L + i, s"corpus document number $i body"))
    val novelBatch = (0L until 200L).map(i => (20000L + i, s"novel fresh content $i payload"))
    val batch = (dupBatch ++ novelBatch).toDF("doc_id", "text")
    val admitted = Bloom.incrementalExactDedup(corpus, batch, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.forall(_ >= 20000L), "a known duplicate was admitted")
    assert(admitted.size >= 190, s"only ${admitted.size}/200 novel docs kept " +
      "(FP rate far above design)")
  }

  test("bloom join prefilter: exact result, fact side shrunk to ~matches before the join") {
    // The runtime-filter contract behind join_bloom_prefilter: probing the
    // build side's Bloom filter map-side keeps every matching fact row (no
    // false negatives ⇒ the exact join result is unchanged) while passing
    // only ~|matches|·(1 + fp) rows into the shuffle.
    val d = sf("sf0.001")
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val li = spark.read.parquet(s"$d/lineitem.parquet").select("l_orderkey")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val (bits, k) = Bloom.geometry(math.max(1L, urgent.count()), 0.01)
    val filter = Bloom.build(urgent, col("o_orderkey"), bits, k)
    val pre = li.filter(Bloom.mightContain(lit(filter), col("l_orderkey"), k))

    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    val filtered = pre.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    assert(filtered == plain, "prefilter changed the exact join result")

    val total = li.count()
    val matches = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    val survivors = pre.count()
    assert(survivors >= matches, "a matching row was dropped (false negative)")
    // survivors = matches + FP; FP bounded well under the non-matching bulk
    assert(survivors - matches <= math.max(50L, (total - matches) / 10),
      s"prefilter passed $survivors of $total rows for $matches matches — " +
        "FP rate far above design")
  }

  test("geometry refuses sets beyond the 128 MB single-filter ceiling instead of clamping") {
    // at 1% FP (9.6 bits/item): 10⁸ items fit under the 2³⁰-bit cap, 2×10⁸
    // do not — and the failure must STEER (partition the corpus / raise
    // fpRate), because a silent clamp would quietly degrade the FP rate,
    // i.e. quietly drop novel documents
    assert(Bloom.geometry(100000000L, 0.01)._1 <= Bloom.MaxBits)
    val e = intercept[IllegalArgumentException] { Bloom.geometry(200000000L, 0.01) }
    assert(e.getMessage.contains("partition the corpus"))
    // the documented escape hatch works: the same set sized for a looser
    // FP rate fits
    assert(Bloom.geometry(200000000L, 0.1)._1 <= Bloom.MaxBits)
  }

  test("broadcast probe is bit-identical to the literal probe (no false negatives)") {
    import spark.implicits._
    val vals = (0L until 5000L).map(_ * 2654435761L)
    val (bits, k) = Bloom.geometry(vals.size, 0.01)
    val filter = Bloom.build(vals.toDF("v"), col("v"), bits, k)
    val bc = spark.sparkContext.broadcast(filter)
    val probes = ((0L until 20000L).map(i => i * 1000003L) ++ vals).toDF("v")
    val viaLit = probes.filter(Bloom.mightContain(lit(filter), col("v"), k))
      .collect().map(_.getLong(0)).toSet
    val viaBc = probes.filter(Bloom.mightContain(bc, col("v"), k))
      .collect().map(_.getLong(0)).toSet
    assert(viaBc == viaLit, "broadcast and literal probes disagree")
    assert(vals.toSet.subsetOf(viaBc), "broadcast probe dropped an inserted value")
  }

  test("normalization flows through: case/whitespace variants count as duplicates") {
    import spark.implicits._
    val corpus = Seq((1L, "Hello   World example")).toDF("doc_id", "text")
    val batch = Seq((2L, "hello world EXAMPLE"), (3L, "something else")).toDF("doc_id", "text")
    val admitted = Bloom.incrementalExactDedup(corpus, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(!admitted.contains(2L), "normalized duplicate slipped through")
    assert(admitted.contains(3L))
  }
}
