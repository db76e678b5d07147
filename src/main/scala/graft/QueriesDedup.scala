package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns._
import graft.Tables._

/** Deduplication operator family — the training-data-pipeline core
  * (SURVEY.md §2.9 X1/X2 + driver-mandated MinHash/SimHash/Jaccard variants).
  *
  * Scale posture (100 TB): every variant here avoids the O(n²) all-pairs
  * comparison. Exact + normalized dedup are single hash-shuffles on the
  * fingerprint. MinHash goes shingle→signature→band→bucket-join, so the only
  * shuffle key is the (band, value) bucket — the standard LSH layout that
  * keeps candidate generation linear in corpus size. N-gram Jaccard uses an
  * inverted shingle index (join on shingle) rather than a cross join.
  * Embedding near-dup below brute-forces only because the oracle needs a
  * deterministic twin; the scale path is VectorQueries.simAnn's bucketed join.
  */
object DedupQueries {

  // X1: exact dedup — keep the smallest doc_id per identical text
  // (delegates to the public api.Dedup front door).
  private val dedupExact = Q(
    (s, d) =>
      graft.api.Dedup.exactDedup(documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
    Some("SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text ORDER BY doc_id"))

  // X2: normalized near-dup — lowercase/whitespace-collapse, md5 fingerprint,
  // keep smallest doc_id per fingerprint (web_scraper latest-snapshot
  // spirit); delegates to api.Dedup.
  private val dedupNormalized = Q(
    (s, d) =>
      graft.api.Dedup.normalizedDedup(documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
    Some("""SELECT min(doc_id) AS doc_id, fp FROM (
              SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
              FROM documents) t GROUP BY fp ORDER BY doc_id"""))

  /** Shared oracle CTE prefix: tokens → per-token polynomial hashes →
    * arithmetic 3-gram shingle hashes (TextFns.shingleHashes3 twin). */
  private[graft] val shingleCtes =
    """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
       th AS (SELECT doc_id, list_transform(t, s ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(s, ''), c -> ascii(c))),
                  (a, c) -> (a * 31 + c) % 1000000007)) AS th FROM tok),
       hs AS (SELECT doc_id, list_transform(generate_series(1, len(th) - 2),
                i -> ((th[i] * 31 + th[i+1]) % 1000000007 * 31 + th[i+2]) % 1000000007) AS hs
              FROM th WHERE len(th) >= 3)"""

  /** doc_id × shingle-hash rows via the native ShingleHashes expression (one
    * compiled pass per doc, no shingle strings, no lambda re-evaluation).
    * The repartition matters on the bench box: documents.parquet is a single
    * input split, and without it the whole hash pipeline runs on one core —
    * on a real multi-file 100 TB table the scan is already parallel and the
    * exchange is a cheap row-count-preserving reshuffle of raw text. */
  private[graft] def shingleHashRows(s: org.apache.spark.sql.SparkSession, d: String) =
    documents(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(graft.expressions.ShingleHashes(tokens(col("text")))).as("h"))

  // MinHash + LSH banding: 16-hash signature, 4 bands × 4 rows; candidate
  // pairs = docs sharing any band bucket. The join key is (band idx, band
  // value) — at scale this is one shuffle over the banded signatures.
  private val dedupMinhash = Q(
    (s, d) => {
      val sigCols = (0 until 16).map(j =>
        min((col("h") * (2L * j + 1) + (j.toLong * j + 7)) % P).as(s"m$j"))
      val sig = shingleHashRows(s, d).groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      val bandStructs = (0 until 4).map { k =>
        struct(lit(k).as("k"),
          concat_ws("_", (0 until 4).map(j => col(s"m${4 * k + j}")): _*).as("bv"))
      }
      val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
        .select(col("doc_id"), col("b.k").as("k"), col("b.bv").as("bv"))
      bands.as("a")
        .join(bands.as("b"),
          col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
        .orderBy("id1", "id2")
    },
    Some(s"""$shingleCtes,
            sig AS (SELECT doc_id, list_transform(generate_series(0, 15),
                      j -> list_min(list_transform(hs, h -> ((2*j+1)*h + (j*j+7)) % 1000000007))) AS sig
                    FROM hs),
            bands AS (SELECT doc_id, k,
                        CAST(sig[4*k+1] AS VARCHAR) || '_' || CAST(sig[4*k+2] AS VARCHAR) || '_' ||
                        CAST(sig[4*k+3] AS VARCHAR) || '_' || CAST(sig[4*k+4] AS VARCHAR) AS bv
                      FROM sig CROSS JOIN (VALUES (0),(1),(2),(3)) b(k))
            SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
            FROM bands a JOIN bands b ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id
            ORDER BY id1, id2"""))

  /** 32-bit SimHash signatures of a (doc_id, text) frame: 32 codegen'd
    * conditional sums over exploded (doc_id, token-hash) rows — shared by
    * the signature entry and the hamming-banded pairing entry. */
  private def simhashOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // Explicit width: this repartition EXISTS to parallelize the
    // tokenize+hash+32-sum pipeline over few-split inputs, and its
    // per-byte compute dwarfs its bytes — AQE (sizing by bytes) would
    // coalesce the kB-scale text exchange to 1-2 partitions and run the
    // signature pass nearly single-threaded (measured r17 inside the
    // Hamming entry's cached signature frame: 4.3 s vs 1.3 s). The width
    // is the session's parallelism knob, not a constant.
    val tokHash = docs
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), graft.expressions.PolyHash(col("t")).as("h"))
    val votes = (0 until 32).map { b =>
      val mask = 1L << b
      sum(when(col("h").bitwiseAND(mask) === mask, 1L).otherwise(-1L)).as(s"v$b")
    }
    tokHash.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map { b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** SimHash signature CTEs over a corpus CTE named `wd` — DuckDB twin of
    * [[simhashOf]] (PolyHash per token, majority vote per bit). */
  private def sqlSimhashCtes(corpus: String): String =
    s"""$corpus,
       tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM wd),
       hs AS (SELECT doc_id, list_transform(t, s ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(s, ''), c -> ascii(c))),
                  (a, c) -> (a * 31 + c) % 1000000007)) AS hs FROM tok),
       sig AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 31), b ->
                 CASE WHEN list_sum(list_transform(hs, h ->
                        CASE WHEN (h & (CAST(1 AS BIGINT) << b)) = (CAST(1 AS BIGINT) << b)
                             THEN 1 ELSE -1 END)) > 0
                      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
               FROM hs)"""

  // SimHash: 32-bit signature over token hashes, computed as 32 codegen'd
  // conditional sums over exploded (doc_id, token-hash) rows. Pairing by
  // hamming distance is the dedup_simhash_hamming entry below; the oracle
  // here checks the signatures themselves.
  private val dedupSimhash = Q(
    (s, d) => simhashOf(documents(s, d)).orderBy("doc_id"),
    Some(s"""${sqlSimhashCtes("WITH wd AS (SELECT doc_id, text FROM documents)")}
            SELECT doc_id, simhash FROM sig ORDER BY doc_id"""))

  // Hamming-banded SimHash PAIRING (Manku/Jain/Sarma WWW 2007 — the Google
  // web-crawl near-dup design): all doc pairs whose 32-bit SimHash
  // signatures differ in ≤ 3 bits, found by the pigeonhole band join in
  // ops.Hamming — 4 disjoint 8-bit blocks, a ≤3-bit-distant pair must agree
  // exactly on one block, so candidate generation is an equi join on
  // (block, block bits) and the popcount(xor) verify is EXACT. Because the
  // banding is lossless (recall 1.0 by construction, HammingSpec), the
  // oracle is the plain brute-force predicate — the strongest possible
  // cross-check of the banded path. The corpus plants exact copies of every
  // 10th doc at doc_id + 10,000,000 (hamming 0 — guaranteed output through
  // the same join+verify path a production corpus takes); the demo geometry
  // is 32/4 to mirror dedup_simhash — production web dedup runs 64-bit
  // prints at the same d=3 (the paper's geometry; ops.Multimodal's image
  // dHash path uses the 64-bit form of the identical operator).
  private val dedupSimhashHamming = Q(
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val widened = docs.union(docs.filter(pmod(col("doc_id"), lit(10L)) === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text")))
      graft.ops.Hamming.nearDupPairs(simhashOf(widened), "doc_id", "simhash",
          bits = 32, maxDist = 3)
        .orderBy("id1", "id2")
    },
    Some(s"""${sqlSimhashCtes(
        """WITH wd AS (SELECT doc_id, text FROM documents
                       UNION ALL
                       SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 10 = 0)""")}
            SELECT a.doc_id AS id1, b.doc_id AS id2
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY id1, id2"""))

  // N-gram Jaccard with a data-driven join-shape guard: the inverted shingle
  // index (join on shared shingles → intersection counts → |A∪B| =
  // |A|+|B|−|A∩B|, no cross join anywhere) when no shingle is hot, the
  // lossless prefix-filtered join (ops.JaccardPrefix, Bayardo/PPJoin) when
  // any shingle's document frequency exceeds api.Dedup.hotShingleDf — the
  // C(df, 2) blowup guard a 100 TB corpus with boilerplate needs. Both
  // shapes produce identical pairs (JaccardPrefixSpec), so the oracle is
  // path-independent.
  /** The checkpoint-backed (id1, id2) near-dup pair set the catalog's
    * Jaccard entries share: dedup_ngram_jaccard adds the presentation sort;
    * dedup_cluster feeds its fixpoint from these pairs directly (no sort —
    * the edge repartition would discard it anyway). nearDupPairsAuto is
    * eager and caches its own shingle pass, so the document pipeline runs
    * exactly once per call regardless of how many times the result is read.
    */
  private[graft] def ngramPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val sets = documents(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        array_distinct(graft.expressions.ShingleHashes(tokens(col("text")))).as("hs"))
    graft.ops.JaccardPrefix.nearDupPairsAutoSets(sets, "doc_id", "hs",
      graft.api.Dedup.jaccardTau, graft.api.Dedup.hotShingleDf)
  }

  private val dedupNgramJaccard = Q(
    (s, d) => ngramPairs(s, d).orderBy("id1", "id2"),
    Some(s"""$shingleCtes,
            shd AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(hs) AS s FROM hs) u),
            sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
                      FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
            SELECT id1, id2 FROM inter
            JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
            WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.6
            ORDER BY id1, id2"""))

  // Near-dup CLUSTERING: connected components over the Jaccard candidate
  // graph via min-label propagation (ops.ConnectedComponents — the public
  // operator this query delegates to) — each doc ends up labeled with the
  // smallest doc_id reachable through near-dup edges (the canonical pick).
  // The fixpoint is unique, so any engine/iteration order converges to the
  // same answer; the oracle computes it with a recursive CTE. Singletons
  // (the vast majority of any near-dup graph) skip the iteration entirely
  // and are unioned back at the end.
  // Content-defined chunking variant of the segment dedup above (FastCDC
  // idea at token granularity): boundaries cut AFTER tokens whose hash ≡ 0
  // (mod 8), so an insertion reframes only its own segment — the
  // robustness fixed-width splitting lacks. Same keep-first machinery,
  // same output shape; the oracle mirrors the cut rule, the boundary
  // prefix count, and the keep-first window exactly.
  private val dedupParagraphsCdc = Q(
    (s, d) =>
      graft.api.Dedup.dedupSegmentsCDC(documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
    Some("""WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
            th AS (SELECT doc_id, t, list_transform(t, s ->
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(s, ''), c -> ascii(c))),
                       (a, c) -> (a * 31 + c) % 1000000007)) AS th FROM tok),
            pos AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS p, t, th FROM th),
            r AS (SELECT doc_id, p, t[p] AS tok,
                         CASE WHEN th[p] % 8 = 0 THEN 1 ELSE 0 END AS cut FROM pos),
            s AS (SELECT doc_id, p, tok,
                         CAST(coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS seg
                  FROM r),
            segs AS (SELECT doc_id, seg, string_agg(tok, ' ' ORDER BY p) AS seg_text
                     FROM s GROUP BY doc_id, seg),
            h AS (SELECT doc_id, seg, seg_text,
                         list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(string_split(seg_text, ''), c -> ascii(c))),
                           (a, c) -> (a * 31 + c) % 1000000007) AS sh FROM segs),
            rn AS (SELECT doc_id, seg, seg_text,
                          row_number() OVER (PARTITION BY sh ORDER BY doc_id, seg) AS rn FROM h)
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' ' ORDER BY seg), '') AS clean_text,
                   CAST(count(*) AS BIGINT) AS n_segs,
                   CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
            FROM rn GROUP BY doc_id ORDER BY doc_id"""))

  /** (doc_id, cluster) labels incl. singletons — the Spark side shared by
    * dedup_cluster and dedup_cluster_best (api.Dedup.nearDupClusters shape,
    * fed from the checkpoint-backed catalog pair set). */
  private def clusterFrame(s: org.apache.spark.sql.SparkSession, d: String) = {
    val labels = graft.ops.ConnectedComponents.labels(
      ngramPairs(s, d).select("id1", "id2"))
    val singletons = documents(s, d).select(col("doc_id").as("id"))
      .join(labels.select("id"), Seq("id"), "left_anti")
      .withColumn("label", col("id"))
    labels.union(singletons)
      .select(col("id").as("doc_id"), col("label").as("cluster"))
  }

  /** The recursive-CTE oracle chain ending in `cl(doc_id, cluster)` — the
    * DuckDB twin of [[clusterFrame]], shared by both cluster entries. */
  private val clusterSqlCtes: String =
    s"""${shingleCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
            shd AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(hs) AS s FROM hs) u),
            sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
                      FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
            pairs AS (SELECT id1, id2 FROM inter
                      JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
                      WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.6),
            edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                      UNION ALL SELECT id2, id1 FROM pairs),
            reach AS (SELECT doc_id AS id, doc_id AS label FROM documents
                      UNION
                      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
            cl AS (SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS cluster
                   FROM reach GROUP BY id)"""

  private val dedupCluster = Q(
    (s, d) => clusterFrame(s, d).orderBy("doc_id"),
    Some(s"""$clusterSqlCtes
            SELECT doc_id, cluster FROM cl ORDER BY doc_id"""))

  // Cluster CANONICALIZATION: fuzzy dedup doesn't drop whole clusters — it
  // keeps one representative each, and real pipelines keep the BEST copy
  // (longest / highest-quality), not an arbitrary one. This entry composes
  // the CC labels above with a token-count quality signal: per cluster keep
  // argmax(n_tok), ties to the smallest doc_id (api.Dedup.bestPerCluster —
  // one id-keyed join + one window shuffle keyed by cluster). The oracle
  // reuses the cluster fixpoint CTE and mirrors the identical window order.
  private val dedupClusterBest = Q(
    (s, d) => {
      val scores = documents(s, d).select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      graft.api.Dedup.bestPerCluster(clusterFrame(s, d), "doc_id", scores, "n_tok")
        .select("doc_id", "cluster", "n_tok")
        .orderBy("doc_id")
    },
    Some(s"""$clusterSqlCtes,
            nt AS (SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
                   FROM documents),
            r AS (SELECT c.doc_id, c.cluster, n.n_tok,
                    row_number() OVER (PARTITION BY c.cluster
                      ORDER BY n.n_tok DESC, c.doc_id) AS rn
                  FROM cl c JOIN nt n ON c.doc_id = n.doc_id)
            SELECT doc_id, cluster, n_tok FROM r WHERE rn = 1 ORDER BY doc_id"""))

  // Incremental ingestion dedup: a deterministic 20% hash slice of the
  // corpus plays the "new crawl batch", the other 80% the standing corpus;
  // a batch doc is admitted iff it has no near-dup (Jaccard ≥ 0.6) already
  // in the corpus. The index join is batch×corpus only — the corpus is
  // never re-paired against itself, which is the whole point of the
  // incremental shape at 100 TB (api.Dedup.incrementalNearDup).
  private val dedupIncremental = Q(
    (s, d) => {
      val docs = documents(s, d)
      val b = graft.ops.Sampling.bucketOf(col("doc_id"), salt = 7L)
      graft.api.Dedup.incrementalNearDup(
          corpus = docs.filter(b < 800), batch = docs.filter(b >= 800),
          idCol = "doc_id", textCol = "text")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },
    Some(s"""$shingleCtes,
            shd AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(hs) AS s FROM hs) u),
            sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
            buck AS (SELECT doc_id,
                       ((((doc_id % 1000000007) * 2654435761 + 7) % 1000000007) % 1000) AS b
                     FROM documents),
            inter AS (SELECT bs.doc_id AS bid, cs.doc_id AS cid, count(*) AS c
                      FROM shd bs JOIN buck bb ON bs.doc_id = bb.doc_id AND bb.b >= 800
                           JOIN shd cs ON bs.s = cs.s
                           JOIN buck cb ON cs.doc_id = cb.doc_id AND cb.b < 800
                      GROUP BY 1, 2),
            dropped AS (SELECT DISTINCT bid FROM inter
                        JOIN sizes s1 ON bid = s1.doc_id JOIN sizes s2 ON cid = s2.doc_id
                        WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= 0.6)
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN buck ON d.doc_id = buck.doc_id
            WHERE buck.b >= 800 AND d.doc_id NOT IN (SELECT bid FROM dropped)
            ORDER BY d.doc_id"""))

  // Exact-substring repeated spans (Lee et al. 2022 ExactSubstr, re-expressed
  // as a distributed k-gram inverted index — api.Dedup.repeatedSpans): every
  // maximal token range covered by 8-token grams occurring ≥2 times anywhere
  // in the corpus. k=8 because the test corpus's planted duplicates are
  // short; production runs k≈50. The oracle mirrors the double polynomial
  // gram hash arithmetic exactly, then the same overlap-merge window.
  /** The ExactSubstr oracle chain ending in per-doc merged repeat islands
    * `isl` — shared by the span-table entry and its scrub twin. */
  private val substrCtes: String =
    """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
            th AS (SELECT doc_id, list_transform(t, s ->
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(s, ''), c -> ascii(c))),
                       (a, c) -> (a * 31 + c) % 1000000007)) AS th FROM tok),
            pos AS (SELECT doc_id, unnest(generate_series(1, len(th) - 7)) AS pos, th
                    FROM th WHERE len(th) >= 8),
            gr AS (SELECT doc_id, pos,
                     list_reduce(list_prepend(CAST(0 AS BIGINT), th[pos:pos+7]),
                       (a, h) -> (a * 31 + h) % 1000000007) * 999999937
                   + list_reduce(list_prepend(CAST(0 AS BIGINT), th[pos:pos+7]),
                       (a, h) -> (a * 37 + h) % 999999937) AS g
                   FROM pos),
            dup AS (SELECT g FROM gr GROUP BY g HAVING count(*) >= 2),
            hits AS (SELECT doc_id, pos AS s, pos + 7 AS e FROM gr WHERE g IN (SELECT g FROM dup)),
            m AS (SELECT doc_id, s, e, max(e) OVER (PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM hits),
            isl AS (SELECT doc_id, s, e, sum(CASE WHEN pmax IS NULL OR s > pmax + 1
                    THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY s) AS island FROM m)"""

  private val dedupSubstrSpans = Q(
    (s, d) =>
      graft.api.Dedup.repeatedSpans(documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("span_start").cast("long").as("span_start"),
          col("span_end").cast("long").as("span_end"),
          col("span_tokens").cast("long").as("span_tokens"))
        .orderBy("doc_id", "span_start"),
    Some(s"""$substrCtes
            SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
                   max(e) - min(s) + 1 AS span_tokens
            FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start"""))

  // The DESTRUCTIVE half of ExactSubstr dedup: cut the repeated spans out
  // of the text and re-join the survivors (api.Dedup.scrubRepeatedSpans) —
  // what a 100 TB run actually writes back. The oracle rebuilds each doc
  // from its surviving token positions under the identical span semantics
  // (one extra anti-semijoin + ordered string_agg over the shared CTEs).
  private val dedupSubstrScrub = Q(
    (s, d) =>
      graft.api.Dedup.scrubRepeatedSpans(
          documents(s, d).select("doc_id", "text"), "doc_id", "text")
        .select(col("doc_id"), col("text").as("clean_text"))
        .orderBy("doc_id"),
    Some(s"""$substrCtes,
            spans AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM isl GROUP BY doc_id, island),
            tokrow AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS p, t FROM tok),
            tr AS (SELECT doc_id, p, t[p] AS tok FROM tokrow),
            kept AS (SELECT tr.doc_id, tr.p, tr.tok FROM tr
                     WHERE NOT EXISTS (SELECT 1 FROM spans sp
                       WHERE sp.doc_id = tr.doc_id AND tr.p BETWEEN sp.s AND sp.e)),
            agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS ct FROM kept GROUP BY doc_id)
            SELECT d.doc_id, coalesce(a.ct, '') AS clean_text
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
            ORDER BY d.doc_id"""))

  // CCNet-style sub-document dedup (Wenzek et al. 2020): fixed-width token
  // segments stand in for paragraphs (this corpus has no newlines), each
  // segment keeps only its corpus-wide first occurrence — the boilerplate
  // killer that runs before document-level dedup. The oracle rebuilds the
  // identical segments (same 1-based slice arithmetic), the identical char
  // hash, and the identical keep-first (doc_id, seg_idx) window order.
  private val dedupParagraphs = Q(
    (s, d) =>
      graft.api.Dedup.dedupSegments(documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
    Some("""WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
            seg AS (SELECT doc_id,
                      unnest(range(0, CAST((len(t) + 15) // 16 AS INT))) AS seg_idx,
                      unnest(list_transform(range(0, CAST((len(t) + 15) // 16 AS INT)),
                        i -> array_to_string(t[(i*16+1):(i*16+16)], ' '))) AS seg_text
                    FROM tok),
            h AS (SELECT doc_id, seg_idx, seg_text,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(seg_text, ''), c -> ascii(c))),
                      (a, c) -> (a * 31 + c) % 1000000007) AS sh FROM seg),
            r AS (SELECT doc_id, seg_idx, seg_text,
                    row_number() OVER (PARTITION BY sh ORDER BY doc_id, seg_idx) AS rn FROM h)
            SELECT doc_id,
              coalesce(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' ' ORDER BY seg_idx), '') AS clean_text,
              CAST(count(*) AS BIGINT) AS n_segs,
              CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
            FROM r GROUP BY doc_id ORDER BY doc_id"""))

  // Cross-source content-overlap matrix: for every source pair, how many
  // DISTINCT 3-gram shingles they share — the "how much does crawl A repeat
  // crawl B" redundancy diagnostic behind corpus-composition decisions
  // (the overlap analyses published with C4/Pile). Scale shape: documents
  // collapse to DISTINCT (shingle, source) rows FIRST, so the per-shingle
  // pair fanout is bounded by C(|sources|, 2) — a catalog-sized constant —
  // never by the shingle's document frequency (the hot-shingle blowup the
  // raw doc-level inverted index would have); the output is one row per
  // source pair. The distinct frame is persisted so both self-join sides
  // share one materialization instead of riding on exchange reuse
  // (released after the matrix materializes — the repo's persist/
  // checkpoint/unpersist convention, as in ops.JaccardPrefix).
  private val dedupSourceOverlap = Q(
    (s, d) => {
      val ss = documents(s, d)
        .select(col("source"),
          explode(array_distinct(graft.expressions.ShingleHashes(
            graft.functions.TextFns.tokens(col("text"))))).as("sh"))
        .distinct()
        .persist()
      try ss.as("a").join(ss.as("b"),
            col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("source_a", "source_b")
          .localCheckpoint(true)
      finally ss.unpersist()
    },
    Some(s"""$shingleCtes,
            ss AS (SELECT DISTINCT d.source, u.s
                   FROM (SELECT doc_id, unnest(hs) AS s FROM hs) u
                   JOIN documents d USING (doc_id))
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
            GROUP BY 1, 2 ORDER BY source_a, source_b"""))

  val all: List[(String, Q)] = List(
    "dedup_exact" -> dedupExact,
    "dedup_normalized" -> dedupNormalized,
    "dedup_minhash" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "dedup_simhash_hamming" -> dedupSimhashHamming,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_incremental" -> dedupIncremental,
    "dedup_substr_spans" -> dedupSubstrSpans,
    "dedup_substr_scrub" -> dedupSubstrScrub,
    "dedup_paragraphs" -> dedupParagraphs,
    "dedup_paragraphs_cdc" -> dedupParagraphsCdc,
    "dedup_cluster_best" -> dedupClusterBest,
    "dedup_source_overlap" -> dedupSourceOverlap,
    "dedup_cluster" -> dedupCluster)
}
