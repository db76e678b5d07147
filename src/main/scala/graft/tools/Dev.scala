package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the driver contract).
  *
  * Usage:
  *   runMain graft.tools.Dev smoke                 — entry() row count on sf0.001
  *   runMain graft.tools.Dev explain <sfDir> [ids] — explain("formatted") per query
  *   runMain graft.tools.Dev time <sfDir> <id>     — run one query, print secs + rows
  *   runMain graft.tools.Dev pipeline <sfDir> [n]  — end-to-end CorpusPipeline timing
  *   runMain graft.tools.Dev adaptlsh <sfDir> [τ]  — fixed vs adaptive LSH geometry A/B
  *   runMain graft.tools.Dev lshladder <sfDir> [τ] [xK] — candidate-volume ladder at K× the corpus
  *   runMain graft.tools.Dev ivfab <sfDir> [k] [nCells] [nProbe] — trained-IVF recall/time A/B
  *   runMain graft.tools.Dev ivfsplit <sfDir> [reps] [nCells] — trained-IVF fit vs probe attribution
  *   runMain graft.tools.Dev lshlayout <sfDir> [bands] [bits] [reps] — verify-layout A/B at one geometry
  *   runMain graft.tools.Dev stream <sfDir> [batches] — streaming ops batch-parity over replayed events
  *   runMain graft.tools.Dev txpipe <sfDir> [chunks] — exactly-once txlog table→table pipeline timing
  *   runMain graft.tools.Dev prune <sfDir> [files] — data-skipping A/B: snapshot scan vs readPruned
  *   runMain graft.tools.Dev media [families] — multimodal ingest→dedup stage over generated files
  *   runMain graft.tools.Dev lakehouse [sfDir] — recorded end-to-end run of the lakehouse verbs
  *   runMain graft.tools.Dev txladder [rungs] [addsPerCommit] — txlog driver-side replay/heap ladder
  */

/** Replayed events row for the `stream` subcommand's MemoryStream (field
  * order = the events projection it is collected from). */
case class StreamEv(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
    event_type: String, value: Double)

object Dev {
  def main(args: Array[String]): Unit = {
    // Optional YAML run config (S2): env beats YAML beats default.
    val yml = graft.sources.YamlConfig.fromEnv()
    val cpus = graft.sources.YamlConfig.resolve(sys.env.get, yml)(
      "SPARK_GRAFT_CPUS", "spark.cpus", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Bench: hold the whole catalog's generated classes (the
      // 100-entry static default evicts across a 175-query sweep)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // match Bench: AQE partition coalescing applies inside cached-plan
      // materialization (see Bench.scala for the r17 measurements)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    yml.foreach(_.applySparkConfs(builder))
    // extra confs: SPARK_GRAFT_CONF="k=v,k2=v2" (beats the YAML's spark.conf)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    // SPARK_GRAFT_LOGLVL=INFO surfaces DAGScheduler per-job wall times —
    // the cheapest "where did the seconds go" probe for multi-job entries
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLVL", "ERROR"))
    args.toList match {
      case "smoke" :: _ =>
        println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())
      case "explain" :: sfDir :: rest =>
        val ids = if (rest.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
                  else rest.flatMap(_.split(","))
        ids.foreach { id =>
          println(s"===== $id =====")
          graft.SparkEntry.queries(id)(spark, sfDir).explain("formatted")
        }
      case "explainsql" :: sfDir :: sqlParts =>
        // explain an arbitrary SQL over the testdata views — for plan
        // evidence on SUBFRAMES (e.g. a write path's scan side) that no
        // catalog entry's final frame surfaces
        for (t <- Seq("region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings"))
          spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
        spark.sql(sqlParts.mkString(" ")).explain("formatted")
      case "time" :: sfDir :: id :: rest =>
        // optional repeat count: run N times in one JVM to separate cold
        // (codegen/classload/footer) cost from steady-state operator cost
        val reps = rest.headOption.map(_.toInt).getOrElse(1)
        // Spark JOB/STAGE counter (r16): write-inclusive entries spend
        // their time in setup ACTIONS the final frame's explain never
        // shows — the per-run job/stage/task counts are the measurement
        // that attributes those (guide §1: measure where the time goes).
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val stages = new java.util.concurrent.atomic.AtomicInteger
        val tasks = new java.util.concurrent.atomic.AtomicInteger
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
          override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
          }
        })
        for (r <- 1 to reps) {
          graft.ops.JaccardPrefix.lastDecision = None // print only THIS run's decisions
          graft.api.Similarity.lastLshShape = None
          graft.ops.ConnectedComponents.lastRounds = None
          val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
          val t0 = System.nanoTime()
          val n = graft.SparkEntry.queries(id)(spark, sfDir).count()
          println(f"$id[$r]: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows, " +
            s"jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}")
          // auto-select observability: which join shape ran and the measured
          // statistic that decided it (operator diagnostics — the lines a
          // 100 TB run greps for)
          graft.ops.JaccardPrefix.lastDecision.foreach { dec =>
            println(s"$id[$r]: jaccard auto-select path=${dec.pathName} maxDf=${dec.maxDf}")
          }
          graft.api.Similarity.lastLshShape.foreach { sh =>
            println(s"$id[$r]: lsh verify shape=${sh.shapeName} candidates=${sh.candidates} " +
              s"bandRows=${sh.bandRows} dim=${sh.dim}")
          }
          graft.ops.ConnectedComponents.lastRounds.foreach { n =>
            println(s"$id[$r]: cc fixpoint rounds=$n")
          }
        }
      case "adaptlsh" :: sfDir :: rest =>
        // A/B the fixed wide tier vs the scale-adaptive geometry on the
        // derived planted-duplicate corpus the _wide catalog entries use:
        // same τ, same verify path, different candidate geometry. Prints
        // geometry, candidate count, wall time, and the planted-dup check.
        import org.apache.spark.sql.functions._
        val tau = rest.headOption.map(_.toDouble).getOrElse(0.8)
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val corpus = emb.union(
          emb.filter(pmod(col("vec_id"), lit(10L)) === 0)
            .select((col("vec_id") + lit(10000000L)).as("vec_id"),
              transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
          .cache()
        val n = corpus.count()
        // one planted pair per duplicated original (id ranges overlap
        // GenScale's copy offsets, so count the originals, not an id range)
        val planted = emb.filter(pmod(col("vec_id"), lit(10L)) === 0).count()
        println(s"corpus: $n vectors, $planted planted exact-dup pairs, tau=$tau")
        def run(label: String, bands: Int, bits: Int): Unit = {
          val t0 = System.nanoTime()
          val cands = graft.api.Similarity.lshCandidates(
            corpus, "vec_id", "embedding", bands, bits).count()
          val tCand = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val found = graft.api.Similarity.lshCosineNearDup(
            corpus, "vec_id", "embedding", tau, bands, bits).count()
          val tAll = (System.nanoTime() - t1) / 1e9
          println(f"$label ($bands bands x $bits bits): candidates=$cands " +
            f"(${tCand}%.2f s), pairs=$found (${tAll}%.2f s end-to-end)")
        }
        val (fb, fw) = graft.api.Similarity.bandGeometry(tau)
        run("fixed-tier", fb, fw)
        val (ab, aw) = graft.api.Similarity.adaptiveBandGeometry(tau, n)
        run("adaptive  ", ab, aw)
        corpus.unpersist()
      case "lshladder" :: sfDir :: rest =>
        // One decade up the ANN/LSH scale ladder: replicate the embeddings
        // corpus K× in memory (per-copy diagonal ±1 sign flips — the
        // GenScale transform: orthogonal, so within-copy cosines are exactly
        // preserved while cross-copy vectors decorrelate), plant the
        // standard 10% exact dups, and measure EXACT multiset candidate
        // volume per geometry via the bucket histogram
        // Σ_buckets C(n_b, 2) — O(n·bands), no pair materialization, which
        // is what makes the fixed arm measurable at sizes where its
        // materialized join (~1e11 pairs at 2.2M) is not runnable. The
        // adaptive arm also runs the full near-dup end to end with the
        // planted-recall check.
        import org.apache.spark.sql.functions._
        val tau = rest.filterNot(_.startsWith("x")).headOption
          .map(_.toDouble).getOrElse(0.8)
        val factor = rest.find(_.startsWith("x")).map(_.drop(1).toInt).getOrElse(10)
        val baseEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val emb = (0 until factor).map { c =>
          if (c == 0) baseEmb
          else baseEmb.select(
            (col("vec_id") + lit(c.toLong * 1000000000000L)).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              when(pmod(xxhash64(lit(c), i), lit(2L)) === 0L, x).otherwise(-x))
              .as("embedding"))
        }.reduce(_ union _)
        val corpus = emb.union(
          emb.filter(pmod(col("vec_id"), lit(10L)) === 0)
            .select((col("vec_id") + lit(10000000L)).as("vec_id"),
              transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
          .cache()
        val n = corpus.count()
        val planted = n / 11 // 10% of the pre-widening corpus, by construction
        println(s"ladder corpus: $n vectors (${factor}x + planted), tau=$tau")
        def histo(label: String, bands: Int, bits: Int): Unit = {
          val t0 = System.nanoTime()
          val cands = graft.api.Similarity
            .bandsOf(corpus, "vec_id", "embedding", bands, bits)
            .groupBy("band", "key").count()
            .agg(expr("sum(count * (count - 1) DIV 2)")).head.getLong(0)
          println(f"$label ($bands bands x $bits bits): multiset candidates=" +
            f"$cands (histogram pass ${(System.nanoTime() - t0) / 1e9}%.1f s)")
        }
        val (fb, fw) = graft.api.Similarity.bandGeometry(tau)
        histo("fixed-tier", fb, fw)
        val (ab, aw) = graft.api.Similarity.adaptiveBandGeometry(tau, n)
        histo("adaptive  ", ab, aw)
        // exact verify shuffles the embedding payload once per candidate —
        // at ~2M+ vectors that measured 137 GB of local shuffle (r12, died
        // on a 75 GB disk), so past the exact-arm bound the end-to-end runs
        // the SKETCH-VERIFIED path instead: the 256-plane signature rides
        // the banded index as a column and filters the candidate stream
        // inside the join stage (no candidate shuffle, no driver state),
        // survivors rerank exactly — recall on planted EXACT dups is
        // unconditional (their agreement is 256/256). The sketch arm runs
        // its OWN geometry (sketchBandGeometry): cheap in-join rejections
        // let bits back off 8 from log2(n), shrinking the signature-wide
        // index ~5x — the exact-path (225,20) geometry put ~100 GB through
        // the self-join sort at 2.2M and died on disk (r14, first attempt)
        if (n <= 500000) {
          val t1 = System.nanoTime()
          val found = graft.api.Similarity.lshCosineNearDup(
            corpus, "vec_id", "embedding", tau, ab, aw).count()
          println(f"adaptive end-to-end (exact verify): pairs=$found " +
            f"(${(System.nanoTime() - t1) / 1e9}%.1f s); planted=$planted " +
            s"recall-check=${if (found >= planted) "PASS" else "FAIL"}")
        } else println(s"adaptive exact-verify e2e SKIPPED at n=$n " +
          "(candidate-payload shuffle exceeds local disk; see r12 record)")
        val (sb, sw) = graft.api.Similarity.sketchBandGeometry(tau, n)
        histo("sketch-geo", sb, sw)
        val t2 = System.nanoTime()
        val sk = graft.api.Similarity.lshCosineNearDupSketched(
          corpus, "vec_id", "embedding", tau, sb, sw).count()
        println(f"sketch-geometry ($sb bands x $sw bits) end-to-end (sketch verify): pairs=$sk " +
          f"(${(System.nanoTime() - t2) / 1e9}%.1f s); planted=$planted " +
          s"recall-check=${if (sk >= planted) "PASS" else "FAIL"}")
        corpus.unpersist()

      case "lshlayout" :: sfDir :: rest =>
        // A/B the two verify LAYOUTS (narrow-reattach vs payload-inline) at
        // one explicit geometry over the widened planted-dup corpus, banded
        // index persisted and shared — isolates the layout decision the
        // byte-math formula makes from everything else.
        import org.apache.spark.sql.functions._
        val tau = 0.8
        val (nb, bw) = rest match {
          case b :: w :: _ => (b.toInt, w.toInt)
          case _ => (89, 16)
        }
        val reps = rest.drop(2).headOption.map(_.toInt).getOrElse(2)
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val corpus = emb.union(
          emb.filter(pmod(col("vec_id"), lit(10L)) === 0)
            .select((col("vec_id") + lit(10000000L)).as("vec_id"),
              transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
          .cache()
        val n = corpus.count()
        val bands = graft.api.Similarity.bandsOf(corpus, "vec_id", "embedding", nb, bw).persist()
        val stats = bands.groupBy("band", "key")
          .agg(count(lit(1)).as("c"))
          .agg(sum(expr("(c * (c - 1)) DIV 2")).as("cands"), sum(col("c")).as("rows")).head
        println(s"lshlayout: n=$n geometry=($nb,$bw) candidates=${stats.getLong(0)} " +
          s"bandRows=${stats.getLong(1)}")
        val withNorm = corpus.select(col("vec_id").as("__id"), col("embedding").as("__emb"),
          graft.expressions.VecDot(col("embedding"), col("embedding")).as("__nn"))
        for (reattach <- Seq(true, false); r <- 1 to reps) {
          val t0 = System.nanoTime()
          val found = graft.api.Similarity.verifiedPairs(bands, withNorm, tau, reattach).count()
          println(f"lshlayout[${if (reattach) "narrow-reattach" else "payload-inline"}][$r]: " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s, pairs=$found")
        }
        bands.unpersist(); corpus.unpersist()
      case "pipeline" :: rest =>
        // end-to-end CorpusPipeline over a documents table: timing + stage
        // survivor counts (the number a capacity plan starts from)
        val d = rest.headOption.getOrElse("/root/testdata/sf0.001")
        val reps = rest.drop(1).headOption.map(_.toInt).getOrElse(1)
        // "full" also runs the r8 curation stages: the corpus-trained
        // surprisal gate and keep-best cluster canonicalization
        val full = rest.drop(2).headOption.contains("full")
        val cfg =
          if (full) graft.api.CorpusPipeline.Config(mixRates = Map("en" -> 0.9),
            defaultRate = 0.7, maxSurprisalBits = 5.05, keepBestPerCluster = true)
          else graft.api.CorpusPipeline.Config(mixRates = Map("en" -> 0.9),
            defaultRate = 0.7)
        val docs = spark.read.parquet(s"$d/documents.parquet")
        docs.count() // warm the scan so run 1 measures the pipeline
        for (r <- 1 to reps) {
          val t0 = System.nanoTime()
          val p = graft.api.CorpusPipeline.prepare(docs, "doc_id", "text", "lang", cfg)
          val n = p.documents.count()
          val c = p.trainChunks.count()
          println(f"pipeline[$r]: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
            f"${docs.count()} docs -> $n kept, $c train rows")
        }
      case "ivfab" :: rest =>
        // trained (k-means) vs fixed-id IVF A/B on the embeddings table:
        // recall against brute-force cosine top-k, plus end-to-end time.
        // Both sides run in this one JVM so conditions are equal.
        import org.apache.spark.sql.functions.col
        val d = rest.headOption.getOrElse("/root/testdata/sf0.1")
        val k = rest.drop(1).headOption.map(_.toInt).getOrElse(3)
        val nCells = rest.drop(2).headOption.map(_.toInt).getOrElse(16)
        val nProbe = rest.drop(3).headOption.map(_.toInt).getOrElse(2)
        val emb = spark.read.parquet(s"$d/embeddings.parquet")
        emb.count() // warm the scan
        val queries = emb.filter(col("vec_id") < 100)
        def timed[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"ivfab: $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
        }
        def asSets(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => r.getLong(0) -> r.getLong(2))
            .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
        val brute = timed("brute-force topk")(
          asSets(graft.api.Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k)))
        val trained = timed(s"trained IVF ($nCells cells, probe $nProbe, incl. fit)")(
          asSets(graft.api.Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
            k, nCells, nProbe)))
        def recall(got: Map[Long, Set[Long]]) = {
          val hits = brute.map { case (q, s) => (s intersect got.getOrElse(q, Set.empty)).size }.sum
          hits.toDouble / brute.values.map(_.size).sum
        }
        println(f"ivfab: trained recall@$k = ${recall(trained)}%.3f " +
          f"(${brute.size} queries, $nCells cells, probe $nProbe)")

      case "stream" :: rest =>
        // Streaming-family demo artifact: replay the driver's events.parquet
        // (and the documents SimHash fingerprints) through MemoryStream
        // micro-batches and print batch-parity results per operator — the
        // numbers BASELINE.md's streaming section records. "Rate-limited" =
        // fixed-size micro-batches with a blocking processAllAvailable
        // between them, so every op crosses real batch boundaries and its
        // state store does real carrying work. Each op's oracle is its own
        // batch twin over the same static frame.
        // MemoryStream is Spark-private API with no public equivalent in
        // 4.1.2 (it moved packages in 4.1: …execution.streaming.runtime);
        // acceptable ONLY here and in tests — never in library code — and
        // this import is the one place a Spark upgrade may need to touch.
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import org.apache.spark.sql.functions._
        val d = rest.headOption.getOrElse("/root/testdata/sf0.01")
        val nBatches = rest.drop(1).headOption.map(_.toInt).getOrElse(8)
        implicit val sqlCtx = spark.sqlContext
        import spark.implicits._
        val ev = graft.Tables.events(spark, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
        val evRows = ev.as[StreamEv].collect()
        val batchSize = math.max(1, evRows.length / nBatches)
        println(s"stream: replaying ${evRows.length} events in ~$nBatches micro-batches " +
          s"of $batchSize from $d")

        // 1. watermarked tumbling-window agg (complete mode) vs batch twin
        locally {
          val mem = MemoryStream[StreamEv]
          val q = graft.streaming.EventStream.hourlyByType(mem.toDF())
            .writeStream.format("memory").queryName("dev_hourly")
            .outputMode("complete").start()
          try {
            evRows.grouped(batchSize).foreach { b =>
              mem.addData(b.toSeq: _*); q.processAllAvailable()
            }
            val got = spark.table("dev_hourly").collect().map(_.toSeq).toSet
            val want = graft.streaming.EventStream.hourlyByType(ev)
              .collect().map(_.toSeq).toSet
            println(s"stream: hourly_window parity=${got == want} " +
              s"rows=${got.size} batch_rows=${want.size}")
          } finally q.stop()
        }

        // 2. watermarked STREAM-STREAM attribution join (views = even
        //    event_id, clicks = odd), both sides fed in interleaved
        //    micro-batches, vs the same function over static frames
        locally {
          val vMem = MemoryStream[StreamEv]
          val cMem = MemoryStream[StreamEv]
          val q = graft.streaming.EventStream.attributionJoin(vMem.toDF(), cMem.toDF())
            .writeStream.format("memory").queryName("dev_attrib")
            .outputMode("append").start()
          try {
            val (views, clicks) = evRows.partition(_.event_id % 2 == 0)
            views.grouped(batchSize).zipAll(clicks.grouped(batchSize),
                Array.empty[StreamEv], Array.empty[StreamEv]).foreach { case (vb, cb) =>
              if (vb.nonEmpty) vMem.addData(vb.toSeq: _*)
              if (cb.nonEmpty) cMem.addData(cb.toSeq: _*)
              q.processAllAvailable()
            }
            val key = (r: org.apache.spark.sql.Row) => (r.getLong(1), r.getLong(2))
            val got = spark.table("dev_attrib").collect().map(key).toSet
            val want = graft.streaming.EventStream.attributionJoin(
                ev.filter(col("event_id") % 2 === 0), ev.filter(col("event_id") % 2 === 1))
              .collect().map(key).toSet
            println(s"stream: attribution_join parity=${got == want} " +
              s"pairs=${got.size} batch_pairs=${want.size}")
          } finally q.stop()
        }

        // 3. online hamming near-dup over the corpus's 32-bit SimHash
        //    fingerprints (the dedup_simhash signatures), state sharded by
        //    pigeonhole block, vs the batch lossless band join
        locally {
          val (bits, maxDist) = (32, 3)
          val fps = graft.SparkEntry.queries("dedup_simhash")(spark, d)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          val mem = MemoryStream[(Long, Long)]
          val banded = graft.ops.Hamming.bandRows(
              mem.toDS().toDF("doc_id", "fp"), "doc_id", "fp", bits, maxDist)
            .select(col("__id").as("doc_id"), col("__band").as("band"),
              col("__key").as("key"), col("__fp").as("fp"))
            .as[graft.streaming.StatefulOps.BandedFp]
          // parity needs the state cap lifted: this corpus's simhash top byte
          // is near-constant (~96% of fps share band 3 key 0), so one bucket
          // exceeds the 4096 production default and capped state would shed
          // pairs by design — the demo asserts losslessness GIVEN enough state
          val q = graft.streaming.StatefulOps.streamingNearDupHamming(
              banded, bits, maxDist, maxPerBucket = fps.length)
            .writeStream.format("memory").queryName("dev_ham")
            .outputMode("append").start()
          try {
            fps.grouped(math.max(1, fps.length / nBatches)).foreach { b =>
              mem.addData(b.toSeq: _*); q.processAllAvailable()
            }
            val got = spark.table("dev_ham").collect()
              .map(r => (math.min(r.getLong(0), r.getLong(1)),
                math.max(r.getLong(0), r.getLong(1)))).toSet
            val want = graft.ops.Hamming.nearDupPairs(
                fps.toSeq.toDF("doc_id", "fp"), "doc_id", "fp", bits, maxDist)
              .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            println(s"stream: hamming_neardup parity=${got == want} " +
              s"pairs=${got.size} batch_pairs=${want.size} (n=${fps.length} fingerprints, " +
              s"maxPerBucket=${fps.length})")
          } finally q.stop()
        }

        // 4. streaming token-budget admission vs the batch mixture
        //    materialization. Parity contract (the op's doc): admission is
        //    first-arrival per group, so the stream is fed a PREFIX of the
        //    batch op's deterministic (hash, id) admission order, one doc
        //    per micro-batch (a stream has no global order to lean on) —
        //    the admitted set must equal the batch set restricted to that
        //    prefix.
        locally {
          val docs = graft.Tables.documents(spark, d)
            .select(col("doc_id"), col("lang").as("group"),
              size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
          val budgets = Map("en" -> 20000L, "zh" -> 8000L)
          val admittedBatch = graft.ops.Sampling.mixtureByBudget(
              docs, "doc_id", "group", "n_tok", budgets)
            .select("doc_id").collect().map(_.getLong(0)).toSet
          val fed = docs
            .withColumn("__o", graft.ops.Sampling.bucketOf(col("doc_id"), 0L, 1000000))
            .orderBy("__o", "doc_id")
            .select("doc_id", "group", "n_tok").limit(200).collect()
            .map(r => graft.streaming.StatefulOps.BudgetDoc(
              r.getLong(0), r.getString(1), r.getLong(2)))
          val mem = MemoryStream[graft.streaming.StatefulOps.BudgetDoc]
          val q = graft.streaming.StatefulOps.streamingBudgetAdmission(mem.toDS(), budgets)
            .writeStream.format("memory").queryName("dev_budget")
            .outputMode("append").start()
          try {
            for (doc <- fed) { mem.addData(doc); q.processAllAvailable() }
            val got = spark.table("dev_budget").collect().map(_.getLong(0)).toSet
            val want = admittedBatch & fed.map(_.doc_id).toSet
            println(s"stream: budget_admission parity=${got == want} " +
              s"admitted=${got.size} batch_admitted_in_prefix=${want.size} " +
              s"(${fed.length} docs fed)")
          } finally q.stop()
        }

      case "txpipe" :: rest =>
        // End-to-end exactly-once TABLE→TABLE pipeline over the ACID log —
        // the recorded number for BASELINE.md's streaming section: ingest
        // events.parquet into txlog table A in chunked transactional
        // appends, stream A → transform → exactlyOnceTxLog into B, then
        // land one more chunk across a RESTART (new driver, same
        // checkpoint) and verify exactly-once parity against the batch
        // twin. Prints ingest rate, stream wall/rows/s, incremental batch
        // latency, and the parity booleans.
        import org.apache.spark.sql.functions._
        val d = rest.headOption.getOrElse("/root/testdata/sf0.1")
        val nChunks = rest.drop(1).headOption.map(_.toInt).getOrElse(4)
        val base = java.nio.file.Files.createTempDirectory("txpipe")
        val (a, b) = (base.resolve("a").toString, base.resolve("b").toString)
        val ckpt = base.resolve("ck").toString
        val ev = graft.Tables.events(spark, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
        val n = ev.count()
        val t0 = System.nanoTime()
        for (c <- 0 until nChunks)
          graft.sources.TxLog.append(ev.filter(pmod(col("event_id"), lit(nChunks)) === c), a)
        val tIngest = (System.nanoTime() - t0) / 1e9
        println(f"txpipe: ingest $n rows in $nChunks appends: $tIngest%.2f s " +
          f"(${n / tIngest}%.0f rows/s)")
        def pipe() = graft.streaming.EventStream.exactlyOnceTxLog(
          spark.readStream.format("txlog").load(a)
            .withColumn("value", col("value") * 2), b, ckpt, "txpipe")
        val t1 = System.nanoTime()
        val q1 = pipe()
        try q1.processAllAvailable() finally q1.stop()
        val tStream = (System.nanoTime() - t1) / 1e9
        val got = graft.sources.TxLog.snapshot(b).read(spark)
        println(f"txpipe: stream A->B $tStream%.2f s (${n / tStream}%.0f rows/s), " +
          s"B rows=${got.count()}")
        // one more chunk lands ACROSS A RESTART (new query, same checkpoint)
        val extra = ev.limit(10000)
          .withColumn("event_id", col("event_id") + lit(1000000000L))
        val t2 = System.nanoTime()
        graft.sources.TxLog.append(extra, a)
        val q2 = pipe()
        try q2.processAllAvailable() finally q2.stop()
        val tInc = (System.nanoTime() - t2) / 1e9
        // parity vs the batch twin: same rows exactly once, doubled values
        val want = graft.sources.TxLog.snapshot(a).read(spark)
          .withColumn("value", col("value") * 2)
        val fin = graft.sources.TxLog.snapshot(b).read(spark)
        val parity = fin.count() == want.count() &&
          fin.exceptAll(want).isEmpty && want.exceptAll(fin).isEmpty
        println(f"txpipe: incremental 10000-row chunk across restart: $tInc%.2f s; " +
          s"exactly-once parity=$parity (${fin.count()} rows)")

      case "prune" :: rest =>
        // Data-skipping A/B for BASELINE.md: a txlog table of orders laid
        // out as contiguous-key files with recorded stats; time the same
        // narrow range read (a) as a plain snapshot scan + filter (parquet
        // row-group skipping only) vs (b) through readPruned's file-list
        // skipping. Prints wall times, files touched, and the row-count
        // equality check.
        import org.apache.spark.sql.functions._
        val d = rest.headOption.getOrElse("/root/repo/target/sf1")
        val nFiles = rest.drop(1).headOption.map(_.toInt).getOrElse(16)
        val t = java.nio.file.Files.createTempDirectory("devprune").resolve("t").toString
        val src = spark.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        // contiguous EQUAL-ROW slices via ntile (key space is strided at
        // sf>0.1 — GenScale offsets replicas — so uniform key slicing
        // would leave most slices empty); single-partition window is fine
        // in a one-shot dev layout job
        import org.apache.spark.sql.expressions.Window
        val sliced = src.withColumn("__slice",
          ntile(nFiles).over(Window.orderBy("o_orderkey"))).cache()
        for (slice <- 1 to nFiles)
          graft.sources.TxLog.append(
            sliced.filter(col("__slice") === slice).drop("__slice").repartition(1),
            t, statsCol = Some("o_orderkey"))
        sliced.unpersist()
        // probe a ~1%-of-rows key range strictly inside one slice
        val qs = src.stat.approxQuantile("o_orderkey", Array(0.40, 0.41), 0.0)
        val (lo, hi) = (qs(0).toLong, qs(1).toLong)
        val total = graft.sources.TxLog.snapshot(t).files.size
        for (r <- 1 to 3) {
          val t0 = System.nanoTime()
          val full = graft.sources.TxLog.snapshot(t).read(spark)
            .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi).count()
          val tFull = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val pruned = graft.sources.TxLog.readPruned(spark, t, "o_orderkey", lo, hi).count()
          val tPruned = (System.nanoTime() - t1) / 1e9
          val touched = graft.sources.TxLog.prunedFiles(spark, t, "o_orderkey", lo, hi).size
          // arm (c): the PUBLIC reader — the same range predicate pushed
          // into the log-backed FileIndex (TxLogBatchSpec proves the file
          // count; this measures the wall-clock of the public path)
          val t2 = System.nanoTime()
          val pub = spark.read.format("txlog").load(t)
            .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi).count()
          val tPub = (System.nanoTime() - t2) / 1e9
          println(f"prune[$r]: full-scan $tFull%.2f s ($total files) vs " +
            f"readPruned $tPruned%.2f s ($touched files) vs " +
            f"format(txlog) $tPub%.2f s, rows $full/$pruned/$pub " +
            s"equal=${full == pruned && pruned == pub}")
        }

      case "lakehouse" :: rest =>
        // End-to-end recorded run of the round-12 lakehouse verbs at scale,
        // for BASELINE.md: convert-in-place → constraint add (existing-data
        // validation) → clustered public-writer append → point MERGE →
        // file-scoped DELETE → constraint rejection → OPTIMIZE → shallow
        // CLONE → timestamp travel → vacuum. One summary line per step.
        import org.apache.spark.sql.functions._
        val d = rest.headOption.getOrElse("/root/repo/target/sf1")
        val root = java.nio.file.Files.createTempDirectory("devlake")
        val t = root.resolve("t").toString
        val dst = root.resolve("clone").toString
        val src = spark.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val srcRows = src.count()
        src.repartition(8).write.parquet(t)
        def step(name: String)(f: => String): Unit = {
          val t0 = System.nanoTime()
          val detail = f
          println(f"LAKE $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  $detail")
        }
        step("convert") {
          graft.sources.TxLog.convert(spark, t, statsCol = Some("o_orderkey"))
          s"adopted ${graft.sources.TxLog.snapshot(t).files.size} files in place, $srcRows rows"
        }
        step("add-constraint") {
          graft.sources.TxLog.addConstraint(spark, t, "price_nonneg", "o_totalprice >= 0")
          "validated all existing rows, recorded price_nonneg"
        }
        step("clustered-append") {
          src.limit(100000)
            .select((col("o_orderkey") + lit(1000000000000L)).as("o_orderkey"),
              col("o_custkey"), col("o_totalprice"))
            .write.format("txlog")
            .option("clusterBy", "o_orderkey").option("clusterFiles", "8")
            .mode("append").save(t)
          "100k re-keyed rows via the public writer, 8 range-disjoint files"
        }
        step("point-merge") {
          import spark.implicits._
          val k = src.agg(min("o_orderkey")).head.getLong(0)
          val before = graft.sources.TxLog.snapshot(t).files.toSet
          graft.sources.TxLog.merge(
            Seq((k, 0L, 1.0)).toDF("o_orderkey", "o_custkey", "o_totalprice"), t, "o_orderkey")
          val after = graft.sources.TxLog.snapshot(t).files.toSet
          s"1-row upsert rewrote ${(before -- after).size} of ${before.size} files"
        }
        step("ranged-delete") {
          val qs = src.stat.approxQuantile("o_orderkey", Array(0.50, 0.505), 0.0)
          val before = graft.sources.TxLog.snapshot(t).files.toSet
          graft.sources.TxLog.delete(spark, t,
            col("o_orderkey") >= qs(0).toLong && col("o_orderkey") <= qs(1).toLong,
            statsCol = Some("o_orderkey"))
          val after = graft.sources.TxLog.snapshot(t).files.toSet
          s"~0.5% key band removed, rewrote ${(before -- after).size} files"
        }
        step("point-update") {
          val k = src.agg(max("o_orderkey")).head.getLong(0)
          val before = graft.sources.TxLog.snapshot(t).files.toSet
          graft.sources.TxLog.update(spark, t, col("o_orderkey") === k,
            Map("o_totalprice" -> (col("o_totalprice") * lit(2.0))),
            statsCol = Some("o_orderkey"))
          val after = graft.sources.TxLog.snapshot(t).files.toSet
          s"1-row SET rewrote ${(before -- after).size} of ${before.size} files"
        }
        step("covered-delete") {
          // the clustered append's re-keyed band sits wholly above the
          // original keys: stats + zero nulls prove every row matches, so
          // the retraction is pure metadata — nothing read, nothing staged
          val v = graft.sources.TxLog.latestVersion(t)
          graft.sources.TxLog.delete(spark, t,
            col("o_orderkey") >= 1000000000000L, statsCol = Some("o_orderkey"))
          val staged = graft.sources.TxLog.changes(t, v, v + 1)
            .headOption.map(_.added.size).getOrElse(0)
          s"whole-band retraction: ${graft.sources.TxLog.deleteCoveredFiles.get} " +
            s"files dropped as metadata, $staged staged"
        }
        step("reject-violation") {
          import spark.implicits._
          val tip = graft.sources.TxLog.latestVersion(t)
          val caught =
            try { graft.sources.TxLog.append(
              Seq((1L, 1L, -5.0)).toDF("o_orderkey", "o_custkey", "o_totalprice"), t); false }
            catch { case _: graft.sources.TxLog.ConstraintViolation => true }
          s"violating append refused=$caught, tip unchanged=${graft.sources.TxLog.latestVersion(t) == tip}"
        }
        step("optimize") {
          val before = graft.sources.TxLog.snapshot(t).files.size
          graft.sources.TxLog.optimize(spark, t, targetBytes = 32L * 1024 * 1024,
            statsCol = Some("o_orderkey"))
          s"$before → ${graft.sources.TxLog.snapshot(t).files.size} files"
        }
        step("shallow-clone") {
          graft.sources.TxLog.clone(t, dst)
          val copied = java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dst, "data"))
          s"${graft.sources.TxLog.snapshot(dst).files.size} files referenced, data bytes copied=$copied"
        }
        step("timestamp-travel") {
          val ts1 = graft.sources.TxLog.history(t).minBy(_.version).committedAtMs
          val n = graft.sources.TxLog.snapshotAsOfTimestamp(t, ts1).read(spark).count()
          s"as-of first commit reads $n rows (expected $srcRows): ${n == srcRows}"
        }
        step("vacuum") {
          val dry = graft.sources.TxLog.vacuum(t, retainVersions = 0L, graceMs = 0L,
            dryRun = true)
          val real = graft.sources.TxLog.vacuum(t, retainVersions = 0L, graceMs = 0L)
          s"dry-run previewed $dry, then collected $real (match=${dry == real})"
        }
        println(s"LAKE table=$t history=${graft.sources.TxLog.history(t).map(_.op).reverse.mkString("→")}")

      case "ivfsplit" :: rest =>
        // Fit/probe attribution for the trained-IVF path: the catalog's
        // sim_ivf_trained number conflates the ONE-TIME index build (KMeans
        // fit + corpus assignment) with the per-query-batch probe. This
        // times the three stages separately with the assigned corpus
        // persisted — the production amortized shape (build once, probe per
        // batch). Probe runs twice per rep: all-cells (the catalog entry's
        // exhaustive contract) and nProbe=4 (the production recall/cost
        // point measured in BASELINE.md).
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val d = rest.headOption.getOrElse("/root/testdata/sf0.1")
        val reps = rest.drop(1).headOption.map(_.toInt).getOrElse(3)
        val nCells = rest.drop(2).headOption.map(_.toInt).getOrElse(16)
        val emb = spark.read.parquet(s"$d/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val n = emb.count() // warm the scan so fit time is compute, not I/O
        def secs[A](f: => A): (A, Double) = {
          val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
        }
        val (model, tFit) = secs(graft.ops.KMeans.fit(emb, "vec_id", "embedding", nCells))
        val assigned = graft.ops.KMeans.assign(emb, "embedding", model)
          .select(col("vec_id").as("nbr_id"), col("embedding").as("__ne"), col("cell"),
            graft.expressions.VecDot(col("embedding"), col("embedding")).as("__nn"))
          .persist()
        val (_, tIndex) = secs(assigned.count())
        println(f"ivfsplit: n=$n cells=$nCells fit=${tFit}%.2f s index-build=${tIndex}%.2f s (one-time)")
        val queries = graft.ops.KMeans.assignAll(emb.filter(col("vec_id") < 10), "embedding", model)
          .select(col("vec_id").as("q_id"), col("embedding").as("__qe"), col("cell"), col("dist2"),
            graft.expressions.VecDot(col("embedding"), col("embedding")).as("__qn"))
        def probe(nProbe: Int): Long = {
          val wProbe = Window.partitionBy("q_id").orderBy(col("dist2").asc, col("cell").asc)
          val q = if (nProbe >= nCells) queries.drop("dist2")
            else queries.withColumn("__pr", row_number().over(wProbe))
              .filter(col("__pr") <= nProbe).drop("__pr", "dist2")
          val wTop = Window.partitionBy("q_id").orderBy(col("__sim").desc, col("nbr_id").asc)
          q.join(assigned, Seq("cell"))
            .filter(col("q_id") =!= col("nbr_id"))
            .select(col("q_id"), col("nbr_id"),
              (graft.expressions.VecDot(col("__qe"), col("__ne")) /
                (sqrt(col("__qn")) * sqrt(col("__nn")))).as("__sim"))
            .withColumn("rank", row_number().over(wTop))
            .filter(col("rank") <= 3)
            .count()
        }
        for (r <- 1 to reps) {
          val (rowsAll, tAll) = secs(probe(nCells))
          val (rows4, t4) = secs(probe(4))
          println(f"ivfsplit[$r]: probe-all=${tAll}%.2f s ($rowsAll rows) " +
            f"probe-4=${t4}%.2f s ($rows4 rows)")
        }
        assigned.unpersist()

      case "pqrecall" :: rest =>
        // PQ ADC recall vs exact L2 top-k at k codewords/block: how much
        // ranking quality the 8-codes-per-vector compression keeps on this
        // corpus. Production tunes k (and trains codebooks with KMeans.fit);
        // this measures the catalog's fixed-seed codebook honestly against
        // brute force.
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
        val topK = 3
        val nQ = 50L
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")).cache()
        val n = e.count()
        val queries = e.filter(col("vec_id") < nQ)
        // exact L2 top-k via the codegen'd dot products:
        // ||q - x||^2 = q.q - 2 q.x + x.x
        val qq = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          graft.expressions.VecDot(col("embedding"), col("embedding")).as("q_nn"))
        val xx = e.select(col("vec_id"), col("embedding"),
          graft.expressions.VecDot(col("embedding"), col("embedding")).as("nn"))
        val wExact = Window.partitionBy("q_id").orderBy(col("d2").asc, col("vec_id").asc)
        val exact = xx.repartition(col("vec_id"))
          .withColumn("__z", pmod(col("vec_id"), lit(1L)))
          .join(broadcast(qq.withColumn("__z", pmod(col("q_id"), lit(1L)))), Seq("__z"))
          .filter(col("q_id") =!= col("vec_id"))
          .select(col("q_id"), col("vec_id"),
            (col("q_nn") - lit(2.0) * graft.expressions.VecDot(col("q_emb"), col("embedding"))
              + col("nn")).as("d2"))
          .withColumn("rk", row_number().over(wExact)).filter(col("rk") <= topK)
          .select("q_id", "vec_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        for (k <- Seq(16, 64, 256)) {
          val t0 = System.nanoTime()
          val cb = graft.ops.ProductQuant.codebookFromVectors(
            e.filter(col("vec_id") < k), "vec_id", "embedding", m = 8)
          val codes = graft.ops.ProductQuant.encode(e, "vec_id", "embedding", cb, m = 8)
          val adc = graft.ops.ProductQuant.adcTopK(codes, queries, "vec_id", "embedding",
              cb, m = 8, k = topK)
            .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
          val secs = (System.nanoTime() - t0) / 1e9
          val recall = adc.map { case (q, nb) => (nb & exact.getOrElse(q, Set())).size.toDouble / topK }
            .sum / adc.size
          println(f"pqrecall: n=$n k=$k codewords/block recall@$topK=$recall%.3f (${secs}%.1f s)")
        }
        // the production path: per-block KMeans-trained codebook at k=16
        val t1 = System.nanoTime()
        val tcb = graft.ops.ProductQuant.trainedCodebook(e, "vec_id", "embedding", m = 8, k = 16)
        val tadc = graft.ops.ProductQuant.adcTopK(
            graft.ops.ProductQuant.encode(e, "vec_id", "embedding", tcb, m = 8),
            queries, "vec_id", "embedding", tcb, m = 8, k = topK)
          .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
        val tsecs = (System.nanoTime() - t1) / 1e9
        val trecall = tadc.map { case (q, nb) =>
          (nb & exact.getOrElse(q, Set())).size.toDouble / topK }.sum / tadc.size
        println(f"pqrecall: n=$n k=16 TRAINED codebook recall@$topK=$trecall%.3f " +
          f"(${tsecs}%.1f s incl. 8 block fits)")
        e.unpersist()

      case "stateful" :: rest =>
        // flatMapGroupsWithState dedup over the real documents table (batch
        // execution of the same state function the streaming query runs)
        import spark.implicits._
        val d = rest.headOption.getOrElse("/root/testdata/sf0.001")
        val docs = graft.Tables.documents(spark, d)
          .selectExpr("doc_id", "md5(text) AS fp", "text")
          .as[graft.streaming.StatefulOps.FpDoc]
        val out = graft.streaming.StatefulOps.streamingDedup(docs)
        println(s"STATEFUL_DEDUP in=${docs.count()} out=${out.count()}")
      case "bloomab" :: rest =>
        // Bloom approximate vs exact anti-join incremental dedup, A/B timed:
        // corpus = the documents table, batch = 10% known-dups (exact copies
        // of every 10th doc) + the same count of novel synthetic docs.
        import org.apache.spark.sql.functions._
        val d = rest.headOption.getOrElse("/root/testdata/sf0.1")
        val reps = rest.drop(1).headOption.map(_.toInt).getOrElse(3)
        val corpus = graft.Tables.documents(spark, d).select("doc_id", "text")
        val dups = corpus.filter(pmod(col("doc_id"), lit(10L)) === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        val novel = corpus.filter(pmod(col("doc_id"), lit(10L)) === 0)
          .select((col("doc_id") + 20000000L).as("doc_id"),
            concat(lit("novel payload "), col("doc_id"), lit(" "), col("text")).as("text"))
        val batch = dups.union(novel).persist()
        val nBatch = batch.count()
        def fp(c: org.apache.spark.sql.Column) = xxhash64(graft.api.Dedup.normalized(c))
        for (r <- 1 to reps) {
          var t0 = System.nanoTime()
          val viaBloom = graft.ops.Bloom.incrementalExactDedup(
            corpus, batch, "doc_id", "text").count()
          val tBloom = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          val viaJoin = batch.join(
              corpus.select(fp(col("text")).as("__fp")).distinct(),
              fp(col("text")) === col("__fp"), "left_anti")
            .count()
          val tJoin = (System.nanoTime() - t0) / 1e9
          println(f"BLOOMAB[$r]: batch=$nBatch bloom=$viaBloom (${tBloom}%.2f s) " +
            f"exactJoin=$viaJoin (${tJoin}%.2f s)")
        }
        batch.unpersist()
      case "media" :: rest =>
        // Recorded run of the composed multimodal stage (CorpusPipeline.
        // prepareMedia): generate a deterministic media corpus on disk —
        // per family one base PNG, one byte-identical copy (exact-dup) and
        // one pixel-noised variant (perceptual near-dup), plus audio and
        // non-media files — then drive binaryFile ingest → exact byte dedup
        // (byte-confirmed) → dHash near-dup → ledger, and print the
        // admit/drop counts + wall time BASELINE.md's multimodal row cites.
        // Expected exactly: families exact drops, families near-dup drops,
        // families+2 admitted (one image per family + 1 audio + 1 other).
        val fams = rest.headOption.map(_.toInt).getOrElse(64)
        val dir = java.nio.file.Files.createTempDirectory("graft_dev_media")
        def put(name: String, bytes: Array[Byte]): Unit = {
          java.nio.file.Files.write(dir.resolve(name), bytes); ()
        }
        // Family images must be DISTINCT under dHash (a 9×8 downscaled
        // gradient-sign hash): per-pixel pseudo-random noise averages out in
        // the downscale and collides across families, so each family gets a
        // structured sine field with its own frequency pair + phase — the
        // low-frequency gradient signs differ family to family. `noiseEvery`
        // plants the not-byte-identical perceptual near-duplicate.
        def png(w: Int, h: Int, fam: Int, noiseEvery: Int = 0): Array[Byte] = {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val fx = 1 + fam % 8; val fy = 1 + (fam / 8) % 8
          val ph = 2 * math.Pi * ((fam * 37) % 101) / 101.0
          for (y <- 0 until h; x <- 0 until w) {
            val g = 128 + (127 * math.sin(2 * math.Pi * (fx * x.toDouble / w
              + fy * y.toDouble / h) + ph)).toInt
            val base = (g << 16) | (g << 8) | g
            val px = if (noiseEvery > 0 && (x + y * w) % noiseEvery == 0) base ^ 0x030303 else base
            img.setRGB(x, y, px)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        def wavTone(freq: Double): Array[Byte] = {
          val sr = 8000f; val n = 4000
          val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
          val data = new Array[Byte](n * 2)
          for (i <- 0 until n) {
            val v = math.round(math.sin(2 * math.Pi * freq * i / sr) * 0.5 * 32767).toInt
            data(2 * i) = (v & 0xff).toByte; data(2 * i + 1) = ((v >> 8) & 0xff).toByte
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        }
        try {
          for (f <- 0 until fams) {
            val base = png(64, 48, fam = f)
            put(f"img_${f}%04d.png", base)
            put(f"img_${f}%04d_copy.png", base)
            put(f"img_${f}%04d_noisy.png", png(64, 48, f, noiseEvery = 97))
          }
          put("tone.wav", wavTone(440.0))
          put("note.txt", "plain text, not media".getBytes("UTF-8"))
          val t0 = System.nanoTime()
          val out = graft.api.CorpusPipeline.prepareMediaDir(spark, dir.toString)
          val admitted = out.admitted.count()
          val byReason = out.dropped.groupBy("reason").count().collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"MEDIA: files=${3 * fams + 2} admitted=$admitted " +
            f"exact=${byReason.getOrElse("exact", 0L)} " +
            f"near_dup_image=${byReason.getOrElse("near_dup_image", 0L)} " +
            f"secs=$secs%.2f expect admitted=${fams + 2} exact=$fams near=$fams")
        } finally {
          scala.util.Using.resource(java.nio.file.Files.walk(dir)) { s =>
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          }
        }
      case "execplan" :: sfDir :: id :: _ =>
        // EXECUTED (final adaptive) plan: run the frame through the noop
        // sink, then print the post-execution plan — the only place
        // AQEShuffleRead(coalesced) nodes and cached-plan materialization
        // shapes are visible (static explain shows isFinalPlan=false).
        val df = graft.SparkEntry.queries(id)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString)
      case "jacab" :: sfDir :: rest =>
        // A/B the two lossless Jaccard join shapes (inverted index vs
        // prefix filter) over the SAME per-doc shingle sets — the r16
        // verdict item 3 measurement. hotDf=2 forces the prefix path on
        // any corpus whose max df exceeds 2; the production hotDf forces
        // the inverted path on this corpus (maxDf below the guard).
        import org.apache.spark.sql.functions.{col, array_distinct}
        val reps = rest.headOption.map(_.toInt).getOrElse(2)
        val sets = spark.read.parquet(s"$sfDir/documents.parquet")
          .repartition(col("doc_id"))
          .select(col("doc_id"), array_distinct(graft.expressions.ShingleHashes(
            graft.functions.TextFns.tokens(col("text")))).as("hs"))
        for (r <- 1 to reps; (label, hotDf) <- Seq(
            "inverted" -> graft.api.Dedup.hotShingleDf, "prefix" -> 2L)) {
          val t0 = System.nanoTime()
          val n = graft.ops.JaccardPrefix.nearDupPairsAutoSets(
            sets, "doc_id", "hs", graft.api.Dedup.jaccardTau, hotDf).count()
          println(f"jacab[$label][$r]: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs, " +
            s"decision=${graft.ops.JaccardPrefix.lastDecision}")
        }
      case "txladder" :: rest =>
        // Driver-side ceiling ladder for the transaction log (r15 verdict
        // item 1): TxLog.Snapshot holds the live-file list (+ verbatim
        // add-lines during replay) on the driver — the standard Delta-OSS
        // posture. This ladder measures, per synthetic live-set size n
        // (default 10⁴ → 10⁵ → 10⁶ add-actions with rows/size/stats),
        // what every verb actually pays:
        //   tip_ms        — latestVersion discovery (full listing, no pointer)
        //   replay_ms     — cold snapshot() over the raw commit log
        //   ckpt_write_ms — TxLog.checkpoint() (replay + materialize)
        //   ckpt_read_ms  — snapshot() from the checkpoint (the steady state)
        //   warm_ms       — second checkpoint-path snapshot (JIT-warm)
        //   retained_mb   — heap held by the returned Snapshot (GC'd delta)
        //   peak_mb       — transient heap peak during the cold replay
        //   ckpt_bytes    — checkpoint file size (the thing a 100 TB table's
        //                   driver parses per cold process start)
        // The log shape is Delta-realistic: 1000 adds per commit, every add
        // carrying rows/size and one min/max stat column; 0.1% of commits
        // are remove+re-add compactions so replay exercises the remove arm.
        val rungs = rest.headOption.map(_.split(",").toSeq.map(_.toInt))
          .getOrElse(Seq(10000, 100000, 1000000))
        val perCommit = rest.drop(1).headOption.map(_.toInt).getOrElse(1000)
        val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        import scala.jdk.CollectionConverters._
        def heapUsed(): Long = {
          System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(100)
          val r = Runtime.getRuntime; r.totalMemory - r.freeMemory
        }
        def resetPeaks(): Unit = pools.asScala.foreach(_.resetPeakUsage())
        def peakHeap(): Long = pools.asScala
          .filter(_.getType == java.lang.management.MemoryType.HEAP)
          .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)).sum
        for (n <- rungs) {
          val dir = java.nio.file.Files.createTempDirectory(s"txladder_$n")
          val table = dir.resolve("t").toString
          val logd = java.nio.file.Paths.get(table, "_txlog")
          java.nio.file.Files.createDirectories(logd)
          val commits = math.max(1, n / perCommit)
          val sb = new java.lang.StringBuilder(perCommit * 220)
          for (c <- 1 to commits) {
            sb.setLength(0)
            if (c % 1000 == 3) {
              // a vacuum-ish commit: retire two earlier files so replay
              // exercises the remove arm at every rung
              val b = (c - 2).toLong * perCommit
              sb.append(s"""{"remove":{"path":"$table/part-${b}-aaaaaaaa.parquet"}}""").append('\n')
              sb.append(s"""{"remove":{"path":"$table/part-${b + 1}-aaaaaaaa.parquet"}}""").append('\n')
            }
            val base = c.toLong * perCommit
            for (i <- 0 until perCommit) {
              val k = base + i
              sb.append(s"""{"add":{"path":"$table/part-$k-aaaaaaaa.parquet","rows":$perCommit,"size":134217728,"stats":[{"col":"k","min":"${k * 1000}","max":"${k * 1000 + 999}"}]}}""")
              sb.append('\n')
            }
            java.nio.file.Files.write(logd.resolve(f"$c%020d.json"),
              sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          def ms[T](f: => T): (T, Double) = {
            val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
          }
          val (_, tipMs) = ms(graft.sources.TxLog.latestVersion(table))
          val used0 = heapUsed(); resetPeaks()
          val (snap, replayMs) = ms(graft.sources.TxLog.snapshot(table))
          val peak = peakHeap() - used0
          val used1 = heapUsed()
          val (_, ckptWriteMs) = ms(graft.sources.TxLog.checkpoint(table))
          val ckptBytes = scala.util.Using.resource(
            java.nio.file.Files.list(logd))(_.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".checkpoint.json"))
              .map(java.nio.file.Files.size).sum)
          val (snap2, ckptReadMs) = ms(graft.sources.TxLog.snapshot(table))
          val (_, warmMs) = ms(graft.sources.TxLog.snapshot(table))
          // readChanges' metadata half (r16 verdict item 7): changes() reads
          // each version file serially on the driver — O(versions). Timed
          // over the FULL version range so the rung's commit count is the
          // ladder variable (run with small addsPerCommit to sweep
          // 10²–10⁴ commits).
          val (chg, chgMs) = ms(
            graft.sources.TxLog.changes(table, 0L, Long.MaxValue))
          println(f"TXLADDER: n=${snap.files.size} commits=$commits tip_ms=$tipMs%.1f " +
            f"replay_ms=$replayMs%.1f ckpt_write_ms=$ckptWriteMs%.1f " +
            f"ckpt_read_ms=$ckptReadMs%.1f warm_ms=$warmMs%.1f " +
            f"retained_mb=${(used1 - used0) / 1048576.0}%.1f peak_mb=${peak / 1048576.0}%.1f " +
            f"ckpt_bytes=$ckptBytes live2=${snap2.files.size} " +
            f"changes_ms=$chgMs%.1f changes_n=${chg.size}")
          scala.util.Using.resource(java.nio.file.Files.walk(dir)) { s =>
            s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          }
        }
      case other =>
        System.err.println(s"unknown args: $other")
    }
    spark.stop()
  }
}
