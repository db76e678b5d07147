package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sampling/splitting/packing properties the oracle can't express:
  * partitioning-independence, leakage-safety as an invariant, composition
  * with near-dup cluster labels, prefix-sum correctness vs a single-
  * partition reference, and the no-shuffle plan shape of map-side ops. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("hashSplit: deterministic, partitioning-independent, weights respected") {
    import spark.implicits._
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(docs.select("doc_id"), "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs.select("doc_id").repartition(13), "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split must not depend on physical partitioning")
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1 && frac("val") > 0.02 && frac("test") > 0.02,
      s"split fractions far from weights: $frac")
    // salts decorrelate: a different salt must move SOME assignments
    val c = Sampling.hashSplit(docs.select("doc_id"), "doc_id", w, salt = 99L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.exists { case (k, v) => c(k) != v })
  }

  test("map-side ops shuffle nothing: no Exchange in the split/sample plans") {
    val w = Seq("train" -> 0.8, "test" -> 0.2)
    for (df <- Seq(
        Sampling.hashSplit(docs.select("doc_id"), "doc_id", w),
        Sampling.stratifiedSample(docs.select("doc_id", "lang"), "doc_id", "lang",
          Map("en" -> 0.5), 0.1),
        Sampling.uniformSample(docs.select("doc_id"), "doc_id", 0.25))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected a pure scan+project plan:\n$plan")
    }
  }

  test("groupSafeSplit: a group never straddles splits; composes with CC labels") {
    import spark.implicits._
    // synthetic clusters: 60 docs in 20 groups of 3
    val grouped = (0L until 60L).map(i => (i, i % 20)).toDF("doc_id", "cluster")
    val split = Sampling.groupSafeSplit(grouped, "cluster",
      Seq("train" -> 0.5, "test" -> 0.5)).collect()
    val perGroup = split.groupBy(_.getLong(1)).view.mapValues(_.map(_.getString(2)).toSet)
    assert(perGroup.values.forall(_.size == 1), "leakage: a cluster saw two splits")
    // real composition: dedup_cluster labels from the catalog
    val labels = graft.SparkEntry.queries("dedup_cluster")(spark, sf("sf0.001"))
    val safe = Sampling.groupSafeSplit(labels, "cluster", Seq("train" -> 0.8, "test" -> 0.2))
    val byCluster = safe.groupBy("cluster").agg(countDistinct("split").as("nsplits"))
    assert(byCluster.filter(col("nsplits") > 1).count() == 0)
  }

  test("stratifiedSample: per-stratum rates within tolerance, deterministic") {
    val rates = Map("en" -> 0.5, "zh" -> 0.2)
    val sampled = Sampling.stratifiedSample(docs.select("doc_id", "lang"),
      "doc_id", "lang", rates, defaultRate = 0.1, salt = 1L)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((langName, rate) <- rates ++ Map("de" -> 0.1)) {
      val observed = kept.getOrElse(langName, 0L).toDouble / total(langName)
      assert(math.abs(observed - rate) < 0.2,
        s"$langName: observed $observed vs rate $rate")
    }
  }

  test("kSampleByHash: exactly k, deterministic, partitioning-independent") {
    val a = Sampling.kSampleByHash(docs.select("doc_id"), "doc_id", 25)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.kSampleByHash(docs.select("doc_id").repartition(7), "doc_id", 25)
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 25 && a == b)
    // plan shape: distributed top-k (per-partition heaps + one k-row
    // reduce), never a global sort of the corpus
    val plan = Sampling.kSampleByHash(docs.select("doc_id"), "doc_id", 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"k-sample should plan as TakeOrderedAndProject:\n$plan")
  }

  test("bucketOf: negative ids fail loudly; huge ids don't overflow; nulls stay null") {
    import spark.implicits._
    // negative id → raise_error, not a silently-divergent bucket
    val neg = intercept[Exception] {
      Seq(-1L, 5L).toDF("id")
        .select(Sampling.bucketOf(col("id")).as("b")).collect()
    }
    assert(neg.getMessage != null)
    // ids past the old 64-bit overflow point (~3.47e9 before the mod-first
    // reduction) compute fine under ANSI and match the portable formula
    val big = Seq(5000000000L, Long.MaxValue - 1).toDF("id")
      .select(col("id"), Sampling.bucketOf(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ref(id: Long): Long =
      ((BigInt(id) % 1000000007L) * 2654435761L % 1000000007L % 1000L).toLong
    assert(big.forall { case (id, b) => b == ref(id) })
    // null ids pass through as null (SQL semantics: dropped by filters)
    val withNull = Seq[java.lang.Long](3L, null).toDF("id")
      .select(Sampling.bucketOf(col("id")).as("b")).collect()
    assert(withNull.count(_.isNullAt(0)) == 1)
    // salts outside [0, P) are rejected at build time
    intercept[IllegalArgumentException] {
      Sampling.bucketOf(col("id"), salt = -1L)
    }
  }

  test("chunkOffsets: distributed prefix sum matches the sequential reference") {
    import spark.implicits._
    val rows = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tok"))
    val got = Sampling.chunkOffsets(rows, "doc_id", "n_tok", budget = 512L)
      .select("doc_id", "n_tok", "start_offset", "chunk_first", "chunk_last")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // sequential reference on the driver
    var off = 0L
    val want = rows.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).map {
      case (id, tok) =>
        val start = off; off += tok
        (id, tok, start, start / 512, (start + math.max(tok, 1) - 1) / 512)
    }
    assert(got.toSeq == want.toSeq)
    // offsets are a contiguous concatenation: each start = previous end
    val ends = got.scanLeft(0L) { case (acc, (_, tok, _, _, _)) => acc + tok }
    assert(got.map(_._3).toSeq == ends.init.toSeq)
    // partitioning-independence (different partition count, same answer)
    val got13 = Sampling.chunkOffsets(rows.repartition(13), "doc_id", "n_tok", 512L,
        partitions = 5)
      .select("doc_id", "start_offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, _, start, _, _) => got13(id) == start })
  }

  test("takeTokenBudget: greedy hash-order prefix, budgets nest, partitioning-independent") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val rows = (1L to 300L).map(i => (i, (i % 37 + 3).toInt)).toDF("id", "n_tok")
    // sequential reference: greedy prefix in (bucket, id) order on the driver
    val order = rows
      .withColumn("__h", Sampling.bucketOf(col("id"), salt = 5L, buckets = 1000000))
      .select("id", "n_tok", "__h").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    def greedy(budget: Long): Set[Long] = {
      var cum = 0L
      order.iterator.takeWhile { case (_, tok, _) => cum += tok; cum <= budget }
        .map(_._1).toSet
    }
    def run(budget: Long, parts: Int = 0) =
      Sampling.takeTokenBudget(rows, "id", "n_tok", budget, salt = 5L,
          partitions = parts)
        .select("id").collect().map(_.getLong(0)).toSet
    val small = run(500L)
    val big = run(4000L)
    assert(small == greedy(500L) && big == greedy(4000L),
      "distributed selection diverges from the sequential greedy reference")
    // nesting: a smaller budget at the same salt is a prefix of a larger one
    assert(small.subsetOf(big))
    // partitioning-independence
    assert(run(4000L, parts = 7) == big)
  }

  test("mixtureByBudget: per-group budgets hold, nest, and drop unlisted groups") {
    import spark.implicits._
    val rows = (0L until 120L)
      .map(i => (i, Seq("web", "books", "code", "junk")((i % 4).toInt), 10 + (i % 7).toInt))
      .toDF("id", "src", "n_tok")
    val budgets = Map("web" -> 90L, "books" -> 55L, "code" -> 1000000L)
    val got = Sampling.mixtureByBudget(rows, "id", "src", "n_tok", budgets, salt = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // budget respected per group; unlisted group fully dropped
    val byGroup = got.groupBy(_._2)
    assert(!byGroup.contains("junk"))
    for ((g, b) <- budgets if byGroup.contains(g))
      assert(byGroup(g).map(_._3.toLong).sum <= b, s"group $g over budget")
    // a group with a huge budget keeps every row
    assert(byGroup("code").length == 30)
    // greedy: the NEXT doc in each group's hash order would burst the budget
    val P = 1000000007L
    def bucket(id: Long) = ((id % P) * 2654435761L + 3L) % P % 1000000L
    for (g <- Seq("web", "books")) {
      val inOrder = (0L until 120L).filter(i => Seq("web", "books", "code", "junk")((i % 4).toInt) == g)
        .sortBy(i => (bucket(i), i)).map(i => (i, 10 + (i % 7).toInt))
      val kept = got.filter(_._2 == g).map(_._1).toSet
      val prefix = inOrder.takeWhile { var c = 0L; p => { c += p._2; c <= budgets(g) } }
      assert(kept == prefix.map(_._1).toSet, s"group $g is not the greedy hash-order prefix")
    }
    // nesting: halving one group's budget yields a prefix of the larger run
    val smaller = Sampling.mixtureByBudget(rows, "id", "src", "n_tok",
        budgets.updated("web", 45L), salt = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(smaller.filter(_._2 == "web").map(_._1).toSet
      .subsetOf(got.filter(_._2 == "web").map(_._1).toSet))
    // partitioning-independence
    val reparted = Sampling.mixtureByBudget(rows.repartition(7), "id", "src", "n_tok", budgets, salt = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(reparted.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("rankBy: distributed global rank equals row_number, partitioning-independent") {
    import spark.implicits._
    val rows = Seq(30, 7, 30, 12, 99, 1, 7, 55).zipWithIndex
      .map { case (len, id) => (id.toLong, len) }.toDF("id", "len")
      .withColumn("__ord", -col("len"))
    // reference: 1-based rank under (len DESC, id)
    val want = Seq(30, 7, 30, 12, 99, 1, 7, 55).zipWithIndex
      .map { case (len, id) => (id.toLong, len) }
      .sortBy { case (id, len) => (-len, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    for (parts <- Seq(1, 3, 4)) {
      val got = Sampling.rankBy(rows.repartition(parts), Seq("__ord", "id"))
        .select("id", "rn").as[(Long, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("domainCap keeps the deterministic top-cap rows per domain") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, s"dom${i % 3}")).toDF("id", "dom")
    val got = Sampling.domainCap(rows, "id", "dom", cap = 5, salt = 6L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // every domain capped, ranks within [1, cap]
    val byDom = got.groupBy(_._2)
    assert(byDom.values.forall(g => g.length <= 5 && g.map(_._3).sorted.sameElements(1 to g.length)))
    // brute force with the same (bucket, id) order
    val P = 1000000007L
    def bucket(id: Long) = ((id % P) * 2654435761L + 6L) % P % 1000L
    val want = (0L until 40L).groupBy(i => s"dom${i % 3}").flatMap { case (d, ids) =>
      ids.sortBy(i => (bucket(i), i)).take(5).map(i => (i, d))
    }.toSet
    assert(got.map(t => (t._1, t._2)).toSet == want)
    // a hot domain cannot exceed the cap either
    val skew = (0L until 100L).map(i => (i, if (i < 95) "big" else "tail")).toDF("id", "dom")
    val capped = Sampling.domainCap(skew, "id", "dom", cap = 7, salt = 0L)
      .groupBy("dom").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped == Map("big" -> 7L, "tail" -> 5L))
  }

  test("temperatureCap flattens group sizes at floor(scale*sqrt(count))") {
    import spark.implicits._
    // groups of very different sizes: 144 / 36 / 4 / 1
    val sizes = Map("big" -> 144, "mid" -> 36, "small" -> 4, "one" -> 1)
    val rows = sizes.toSeq.flatMap { case (g, n) => (0 until n).map(i => (g, i)) }
      .zipWithIndex.map { case ((g, _), id) => (id.toLong, g) }.toDF("id", "grp")
    val got = Sampling.temperatureCap(rows, "id", "grp", scale = 2L, salt = 9L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("grp"), r.getAs[Int]("rn")))
    val kept = got.groupBy(_._2).view.mapValues(_.length).toMap
    // caps: floor(2*sqrt(n)), min 1 — 24 / 12 / 4 / 1; small groups pass whole
    assert(kept == Map("big" -> 24, "mid" -> 12, "small" -> 4, "one" -> 1))
    // keep RATE decreases as count grows (the flattening property)
    assert(24.0 / 144 < 12.0 / 36 && 12.0 / 36 < 4.0 / 4)
    // exact membership: brute force with the same (bucket, id) order
    val P = 1000000007L
    def bucket(id: Long) = ((id % P) * 2654435761L + 9L) % P % 1000000L
    val byGrp = rows.collect().map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    val want = byGrp.flatMap { case (g, ids) =>
      val cap = math.max(math.floor(2.0 * math.sqrt(ids.length.toDouble)).toLong, 1L)
      ids.map(_._1).sortBy(i => (bucket(i), i)).take(cap.toInt).map(i => (i, g)).toSeq
    }.toSet
    assert(got.map(t => (t._1, t._2)).toSet == want)
    // partitioning-independence
    val reparted = Sampling.temperatureCap(rows.repartition(7), "id", "grp", 2L, salt = 9L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("grp"), r.getAs[Int]("rn")))
    assert(reparted.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }
}
