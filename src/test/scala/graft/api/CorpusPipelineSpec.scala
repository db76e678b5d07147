package graft.api

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end corpus preparation: every stage's contract holds after
  * composition, and the whole flow is deterministic under repartitioning. */
class CorpusPipelineSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  private lazy val prepared =
    CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config(mixRates = Map("en" -> 0.8), defaultRate = 0.5))

  test("stage contracts survive composition") {
    val out = prepared.documents
    val rows = out.count()
    assert(rows > 0 && rows <= docs.count())
    // quality floor: no surviving doc below the token minimum
    assert(out.filter(col("n_tok") < 10).count() == 0)
    // exact dedup: normalized fingerprints are unique among survivors
    val fps = out.select(md5(graft.functions.TextFns.normalized(col("text"))).as("fp"))
    assert(fps.distinct().count() == fps.count())
    // leakage safety: no cluster straddles splits
    val straddlers = out.groupBy("cluster").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1)
    assert(straddlers.count() == 0)
    // split labels are exactly the configured ones
    val labels = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
  }

  test("train chunks are a contiguous concatenation in id order") {
    val chunks = prepared.trainChunks.orderBy("id")
      .select("id", "n_tok", "start_offset", "chunk_first", "chunk_last")
      .collect()
    assert(chunks.nonEmpty)
    var expected = 0L
    for (r <- chunks) {
      assert(r.getLong(2) == expected, s"gap at id ${r.getLong(0)}")
      expected += r.getLong(1)
      assert(r.getLong(3) == r.getLong(2) / 2048 &&
        r.getLong(4) == (r.getLong(2) + math.max(r.getLong(1), 1) - 1) / 2048)
    }
    // chunk ids only ever move forward across the train stream
    val firsts = chunks.map(_.getLong(3))
    assert(firsts.zip(firsts.tail).forall { case (a, b) => a <= b })
  }

  test("trainLabel names the packed split regardless of weight order") {
    // weights reordered so 'train' is NOT first: the packed chunks must
    // still be the train split (the old positional head-of-weights rule
    // would silently pack 'val' here)
    val reordered = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config(
        splitWeights = Seq("val" -> 0.1, "train" -> 0.8, "test" -> 0.1)))
    val trainIds = reordered.documents.filter(col("split") === "train")
      .select("id").collect().map(_.getLong(0)).toSet
    val chunkIds = reordered.trainChunks.select("id").collect().map(_.getLong(0)).toSet
    assert(chunkIds.nonEmpty && chunkIds == trainIds)
    // a trainLabel that names no split weight is rejected at config time
    intercept[IllegalArgumentException] {
      CorpusPipeline.Config(trainLabel = "nope")
    }
  }

  test("repetition ceiling drops degenerate docs, keeps diverse ones") {
    import spark.implicits._
    val degenerate = ("the " * 40) + "end"             // top token frac ≈ 0.98
    val diverse = (1 to 40).map(i => s"the word$i").mkString(" ") // frac ≈ 0.5
    val corpus = Seq((1L, degenerate, "en"), (2L, diverse, "en"))
      .toDF("doc_id", "text", "lang")
    val strict = CorpusPipeline.prepare(corpus, "doc_id", "text", "lang",
      CorpusPipeline.Config(maxTopTokenFrac = 0.6))
    assert(strict.documents.select("id").collect().map(_.getLong(0)).toSet == Set(2L))
    val lax = CorpusPipeline.prepare(corpus, "doc_id", "text", "lang",
      CorpusPipeline.Config())
    assert(lax.documents.count() == 2, "default (1.0) must disable the ceiling")
  }

  test("semantic dedup stage: identical embeddings cluster lexically-unrelated docs") {
    import spark.implicits._
    // 20 quality-passing docs, pairwise lexically dissimilar (distinct word
    // stems, no shared shingles beyond stopwords)
    val corpus = (1 to 20).map { i =>
      (i.toLong,
        s"the quick brown topic$i fox jumps over a lazy dog near river$i " +
          s"and the story about subject$i continues with more detail here",
        "en")
    }.toDF("doc_id", "text", "lang")
    // docs 3 and 17: same embedding (a paraphrase pair in semantic space);
    // everyone else orthogonal-ish deterministic vectors
    val rnd = new scala.util.Random(11)
    val vecs = (1 to 20).map { i =>
      val v = if (i == 17) null else Array.fill(32)(rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val v3 = vecs(2)._2
    val emb = vecs.map { case (id, v) => (id, if (v == null) v3.clone() else v) }
      .toDF("vec_id", "embedding")
    val cfg = CorpusPipeline.Config()
    val without = CorpusPipeline.prepare(corpus, "doc_id", "text", "lang", cfg)
    val withEmb = CorpusPipeline.prepare(corpus, "doc_id", "text", "lang",
      emb, "vec_id", "embedding", cfg)
    def clusterOf(p: CorpusPipeline.Prepared, id: Long): Long =
      p.documents.filter(col("id") === id).select("cluster").head().getLong(0)
    // lexical-only: unrelated texts -> different clusters
    assert(clusterOf(without, 3L) != clusterOf(without, 17L))
    // with embeddings: identical vectors (cosine 1.0, found at any
    // geometry) merge the pair -> same cluster, same split side
    assert(clusterOf(withEmb, 3L) == clusterOf(withEmb, 17L))
    val splits = withEmb.documents.filter(col("id").isin(3L, 17L))
      .select("split").distinct().count()
    assert(splits == 1, "semantic near-dups straddle the leakage-safe split")
    // everyone else is untouched by the semantic stage (orthogonal vectors
    // produce no tau=0.85 pairs): cluster sets agree off the planted pair
    val offPair = withEmb.documents.filter(!col("id").isin(3L, 17L))
      .select("id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val offPairBase = without.documents.filter(!col("id").isin(3L, 17L))
      .select("id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(offPair == offPairBase)
  }

  test("decontamination stage: benchmark-overlapping docs are dropped before dedup") {
    import spark.implicits._
    // no generic-word run of 3: every 3-token shingle contains an i-specific
    // word, so docs share ZERO shingles with each other — the only overlap
    // possible is a genuine leak of a whole text
    def story(i: Int) =
      s"the story$i begins when hero$i walks toward castle$i and the " +
        s"dragon$i waits beside gate$i while wizard$i watches"
    val corpus = (1 to 12).map(i => (i.toLong, story(i), "en"))
      .toDF("doc_id", "text", "lang")
    // benchmark = doc 5's exact text (an eval item that leaked into the
    // corpus) plus an unrelated prompt that overlaps nobody
    val bench = Seq(story(5),
      "completely unrelated benchmark prompt mentioning nothing shared")
      .toDF("text")
    val out = CorpusPipeline.prepareFull(corpus, "doc_id", "text", "lang",
      embeddings = None, benchmark = Some((bench, "text")))
    val ids = out.documents.select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(5L), "the leaked eval doc survived decontamination")
    // zero cross-doc shingle overlap by construction: only the true leak
    // is dropped, every clean doc survives
    assert(ids == (1L to 12L).toSet - 5L,
      s"decontamination dropped the wrong docs: kept $ids")
  }

  test("semantic decontamination: embedding-near-benchmark docs drop; shingle stage can't see them") {
    import spark.implicits._
    def story(i: Int) =
      s"the story$i begins when hero$i walks toward castle$i and the " +
        s"dragon$i waits beside gate$i while wizard$i watches"
    val corpus = (1 to 12).map(i => (i.toLong, story(i), "en"))
      .toDF("doc_id", "text", "lang")
    // doc 7 is a PARAPHRASE of a benchmark item: zero shared shingles with
    // the benchmark text, but its embedding equals the benchmark embedding
    val rnd = new scala.util.Random(23)
    val vecs = (1 to 12).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val benchEmb = Seq(Tuple1(vecs(6)._2.clone())).toDF("embedding") // doc 7's vector
    val bench = Seq("an unrelated benchmark question overlapping no corpus shingles")
      .toDF("text")
    // shingle-only decontamination: doc 7 survives (no lexical overlap)
    val lexOnly = CorpusPipeline.prepareFull(corpus, "doc_id", "text", "lang",
      embeddings = Some((emb, "vec_id", "embedding")),
      benchmark = Some((bench, "text")))
    assert(lexOnly.documents.filter(col("id") === 7L).count() == 1,
      "shingle decontamination should NOT catch a paraphrase")
    // + semantic decontamination: doc 7 drops, everyone else survives
    val full = CorpusPipeline.prepareFull(corpus, "doc_id", "text", "lang",
      embeddings = Some((emb, "vec_id", "embedding")),
      benchmark = Some((bench, "text")),
      benchmarkEmbeddings = Some((benchEmb, "embedding")))
    val ids = full.documents.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (1L to 12L).toSet - 7L,
      s"semantic decontamination kept/dropped the wrong docs: $ids")
    // and it refuses to run without the doc-embedding stage
    val err = intercept[IllegalArgumentException] {
      CorpusPipeline.prepareFull(corpus, "doc_id", "text", "lang",
        embeddings = None, benchmark = None,
        benchmarkEmbeddings = Some((benchEmb, "embedding")))
    }
    assert(err.getMessage.contains("embeddings"))
  }

  test("canonicalization stage: one representative per cluster, the longest copy") {
    val best = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config(keepBestPerCluster = true))
    val out = best.documents
    // exactly one survivor per cluster
    assert(out.groupBy("cluster").count().filter(col("count") > 1).count() == 0)
    // the survivor is the cluster's argmax n_tok (ties to smallest id):
    // rebuild the full labeled set (no canonicalization) and compare
    val full = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config()).documents
    val expect = full.collect().map(r =>
        (r.getAs[Long]("cluster"), (r.getAs[Long]("n_tok"), r.getAs[Long]("id"))))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.map(_._2).minBy { case (n, id) => (-n, id) }._2 }
    val got = out.select("cluster", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("surprisal gate drops the high-surprisal tail and stays deterministic") {
    val cfgTight = CorpusPipeline.Config(maxSurprisalBits = 5.05)
    val gatedIds = CorpusPipeline.prepare(docs, "doc_id", "text", "lang", cfgTight)
      .documents.select("id").collect().map(_.getLong(0)).toSet
    val allIds = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config()).documents.select("id").collect().map(_.getLong(0)).toSet
    assert(gatedIds.subsetOf(allIds) && gatedIds.size < allIds.size,
      s"gate should drop a tail: ${gatedIds.size} of ${allIds.size}")
    val again = CorpusPipeline.prepare(docs.repartition(11), "doc_id", "text", "lang",
      cfgTight).documents.select("id").collect().map(_.getLong(0)).toSet
    assert(again == gatedIds)
  }

  test("per-stratum cap stage: caps hold, slots never wasted on duplicates, split stays leak-safe") {
    val cap = 3
    val capped = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config(maxDocsPerStratum = cap))
    val perStrata = capped.documents.groupBy("strata").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStrata.nonEmpty && perStrata.values.forall(_ <= cap),
      s"cap $cap violated: $perStrata")
    // the cap ran AFTER dedup: survivors are still fingerprint-unique
    // (a capped slot held by a duplicate would betray cap-before-dedup)
    val fps = capped.documents.select(
      md5(graft.functions.TextFns.normalized(col("text"))).as("fp"))
    assert(fps.distinct().count() == fps.count())
    // and BEFORE the split: leak-safety still holds on the capped set
    val straddlers = capped.documents.groupBy("cluster")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1)
    assert(straddlers.count() == 0)
    // deterministic: a re-run keeps the identical survivor id set
    val again = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config(maxDocsPerStratum = cap))
    val a = capped.documents.select("id").collect().map(_.getLong(0)).toSet
    val b = again.documents.select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("end-to-end determinism: same corpus from any input partitioning") {
    val again = CorpusPipeline.prepare(docs.repartition(17), "doc_id", "text", "lang",
      CorpusPipeline.Config(mixRates = Map("en" -> 0.8), defaultRate = 0.5))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cluster", "split").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(key(prepared.documents) == key(again.documents))
    def chunkKey(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "start_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chunkKey(prepared.trainChunks) == chunkKey(again.trainChunks))
  }

  /** Deterministic patterned PNG (MultimodalSpec's fixture shape): per-pixel
    * RGB from a seed so the dHash sees real gradients; `noiseEvery` plants a
    * near-duplicate that is NOT byte-identical. */
  private def patternPng(w: Int, h: Int, seed: Int, noiseEvery: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 31 + y * 17 + seed) * 2654435761L
      val base = ((v >>> 16) & 0xffffff).toInt
      val px = if (noiseEvery > 0 && (x + y * w) % noiseEvery == 0) base ^ 0x030303 else base
      img.setRGB(x, y, px)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(sr: Float, freq: Double, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = math.round(math.sin(2 * math.Pi * freq * i / sr) * 0.5 * 32767).toInt
      data(2 * i) = (v & 0xff).toByte; data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("multimodal stage: written files through ingest -> exact -> perceptual dedup") {
    // A real directory of mixed media — the ingest contract is binaryFile
    // over written files, not in-memory rows.
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      def put(name: String, bytes: Array[Byte]): Unit =
        java.nio.file.Files.write(new java.io.File(dir, name).toPath, bytes)
      val a = patternPng(64, 48, seed = 7)
      put("img_a.png", a)                                       // kept or dropped within its trio
      put("img_a_copy.png", a)                                  // byte-identical: exact drop
      put("img_a_noisy.png", patternPng(64, 48, 7, noiseEvery = 97)) // near-dup: perceptual drop
      put("img_b.png", patternPng(64, 48, seed = 900001))       // distinct image: admitted
      put("tone.wav", wav(8000f, 440.0, 4000))                  // audio: admitted
      put("note.txt", "plain text, not media".getBytes("UTF-8")) // other: admitted
      val out = CorpusPipeline.prepareMediaDir(spark, dir.getAbsolutePath)
      val admitted = out.admitted.collect()
      val dropped = out.dropped.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // the img_a trio collapses to ONE survivor: one exact drop, one
      // perceptual drop; everything else is admitted untouched
      assert(admitted.length == 4, s"admitted ${admitted.toSeq.map(_.doc_id)}")
      assert(dropped.length == 2)
      assert(dropped.count(_._2 == "exact") == 1)
      assert(dropped.count(_._2 == "near_dup_image") == 1)
      // kinds survive the sniff: exactly 2 images + the audio + the other
      val kinds = admitted.groupBy(_.kind).view.mapValues(_.length).toMap
      assert(kinds == Map("image" -> 2, "audio" -> 1, "other" -> 1), s"kinds $kinds")
      // every drop points at a live representative
      val admittedIds = admitted.map(_.doc_id).toSet
      assert(dropped.forall { case (_, _, kept) => admittedIds.contains(kept) },
        "drop ledger must point at admitted representatives")
      // payloads pass through byte-exact (the stage never rewrites content)
      val aId = admitted.filter(_.kind == "audio").head
      assert(java.util.Arrays.equals(aId.payload, wav(8000f, 440.0, 4000)))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }
}
