package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns._
import graft.Tables._
import graft.ops.Sampling

/** Deterministic sampling / splitting / packing — the training-data-
  * pipeline operations downstream of dedup: reproducible train/val/test
  * splits, leakage-safe (group-aware) splitting, per-stratum data mixing,
  * exact k-samples, and concatenate-and-chunk packing offsets.
  *
  * All randomness is an exact integer hash (ops.Sampling) so every query
  * here has a bit-exact DuckDB oracle twin and a 100 TB re-run reproduces
  * the same assignment. The reference has no analog (its corpus fits in
  * pandas); these are the driver-mandate "operations a large-scale
  * training-data pipeline would need".
  */
object SampleQueries {

  private val splitWeights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** The oracle-side twin of Sampling.bucketOf — including the mod-before-
    * multiply reduction, so the formula is portable to strict-64-bit
    * engines (same residue class, identical buckets; see bucketOf doc). */
  private def sqlBucket(idExpr: String, salt: Long, buckets: Long = 1000L): String =
    s"(((($idExpr % 1000000007) * 2654435761 + $salt) % 1000000007) % $buckets)"

  private def sqlSplitCase(b: String): String =
    s"CASE WHEN $b < 800 THEN 'train' WHEN $b < 900 THEN 'val' ELSE 'test' END"

  // Reproducible 80/10/10 split: a pure map-side expression — no shuffle,
  // no rand(), identical assignment on any cluster size or re-run.
  private val sampleSplit = Q(
    (s, d) =>
      Sampling.hashSplit(documents(s, d).select("doc_id"), "doc_id", splitWeights)
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, ${sqlSplitCase(sqlBucket("doc_id", 0L))} AS split
             FROM documents ORDER BY doc_id"""))

  // Data mixing: per-language sampling rates (50% en, 20% zh, 10% rest),
  // one filter pass — the 100 TB pretraining-mix materialization shape.
  private val sampleStratified = Q(
    (s, d) =>
      Sampling.stratifiedSample(documents(s, d).select("doc_id", "lang"),
          "doc_id", "lang", Map("en" -> 0.5, "zh" -> 0.2), defaultRate = 0.1, salt = 1L)
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, lang FROM documents
             WHERE ${sqlBucket("doc_id", 1L)} <
               CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 200 ELSE 100 END
             ORDER BY doc_id"""))

  // Leakage-safe split: hash the duplicate-GROUP representative, not the
  // row id, so near-identical documents can never straddle train/test (the
  // classic contamination bug). Group = smallest doc_id per normalized
  // fingerprint (dedup_normalized's equivalence); the same op composes with
  // dedup_cluster's CC labels for full near-dup safety (SamplingSpec).
  private val splitLeakageSafe = Q(
    (s, d) => {
      val fp = documents(s, d)
        .select(col("doc_id"), md5(normalized(col("text"))).as("fp"))
      val rep = fp.groupBy("fp").agg(min(col("doc_id")).as("group_id"))
      Sampling.groupSafeSplit(fp.join(rep, "fp").select("doc_id", "group_id"),
          "group_id", splitWeights, salt = 2L)
        .orderBy("doc_id")
    },
    Some(s"""WITH fp AS (SELECT doc_id,
                    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
                  FROM documents),
             rep AS (SELECT fp, min(doc_id) AS group_id FROM fp GROUP BY fp)
             SELECT f.doc_id, r.group_id,
                    ${sqlSplitCase(sqlBucket("r.group_id", 2L))} AS split
             FROM fp f JOIN rep r USING (fp) ORDER BY f.doc_id"""))

  // Exact deterministic 100-sample without replacement (reproducible
  // reservoir-sampling analog): smallest (hash, id) — a distributed top-k,
  // never a global sort.
  private val sampleK = Q(
    (s, d) =>
      Sampling.kSampleByHash(documents(s, d).select("doc_id", "lang"), "doc_id",
          k = 100, salt = 3L)
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, lang FROM (
               SELECT doc_id, lang FROM documents
               ORDER BY ${sqlBucket("doc_id", 3L, 1000000L)}, doc_id LIMIT 100)
             ORDER BY doc_id"""))

  // Concatenate-and-chunk packing: documents laid end-to-end in doc_id
  // order, the token stream cut into 512-token chunks (boundaries cross
  // documents — how pretraining batches are actually packed). Implemented
  // as a distributed prefix sum (ops.Sampling.chunkOffsets), not a global
  // single-partition window.
  private val packChunks = Q(
    (s, d) =>
      Sampling.chunkOffsets(
          documents(s, d).select(col("doc_id"),
            size(tokens(col("text"))).as("n_tok")),
          "doc_id", "n_tok", budget = 512L)
        .select("doc_id", "n_tok", "start_offset", "chunk_first", "chunk_last")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, n_tok, start_offset,
                   start_offset // 512 AS chunk_first,
                   (start_offset + greatest(n_tok, 1) - 1) // 512 AS chunk_last
            FROM (
              SELECT doc_id, n_tok,
                     CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                       AS start_offset
              FROM (SELECT doc_id,
                      CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tok
                    FROM documents) t) o
            ORDER BY doc_id"""))

  // Token-budget sample: the greedy hash-ordered document prefix whose
  // inclusive running token total fits a 60k-token budget — "a reproducible
  // N-token subset of the corpus" as one operator. Same distributed prefix
  // sum as pack_chunks (no global sort); the hash order makes budgets at
  // the same salt nest (a smaller budget is a prefix of a larger one).
  private val sampleTokenBudget = Q(
    (s, d) =>
      Sampling.takeTokenBudget(
          documents(s, d).select(col("doc_id"),
            size(tokens(col("text"))).as("n_tok")),
          "doc_id", "n_tok", budget = 60000L, salt = 5L)
        .select("doc_id", "n_tok")
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, n_tok FROM (
               SELECT doc_id, n_tok,
                      sum(CAST(n_tok AS BIGINT)) OVER (
                        ORDER BY ${sqlBucket("doc_id", 5L, 1000000L)}, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM (SELECT doc_id,
                       CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tok
                     FROM documents) t) o
             WHERE cum <= 60000 ORDER BY doc_id"""))

  // Corpus balancing: cap any one source/domain's contribution at 10 docs,
  // chosen by the deterministic (hash, id) order — the C4/Gopher-style
  // "limit documents per domain" curation rule, one window shuffle keyed by
  // domain. The oracle mirrors bucketOf and the identical window order.
  private val sampleDomainCap = Q(
    (s, d) =>
      Sampling.domainCap(documents(s, d).select("doc_id", "source"),
          "doc_id", "source", cap = 10, salt = 6L)
        .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"))
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, source, rn FROM (
               SELECT doc_id, source,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY ${sqlBucket("doc_id", 6L)}, doc_id) AS BIGINT) AS rn
               FROM documents) t
             WHERE rn <= 10 ORDER BY doc_id"""))

  // Mixture materialization: per-language token budgets (20k en / 8k zh /
  // 5k de; fr+es unlisted → dropped) — "30B web + 10B books + 5B code" as
  // one operator. Each language's cumulative sum runs inside its own window
  // partition (one shuffle keyed by lang, never a global order), and
  // budgets at one salt nest per group. The oracle mirrors bucketOf, the
  // per-group window order, and the CASE budget lookup.
  private val sampleMixture = Q(
    (s, d) =>
      Sampling.mixtureByBudget(
          documents(s, d).select(col("doc_id"), col("lang"),
            size(tokens(col("text"))).as("n_tok")),
          "doc_id", "lang", "n_tok",
          budgets = Map("en" -> 20000L, "zh" -> 8000L, "de" -> 5000L), salt = 7L)
        .select("doc_id", "lang", "n_tok")
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, lang, n_tok FROM (
               SELECT doc_id, lang, n_tok,
                      sum(CAST(n_tok AS BIGINT)) OVER (PARTITION BY lang
                        ORDER BY ${sqlBucket("doc_id", 7L, 1000000L)}, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM (SELECT doc_id, lang,
                       CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tok
                     FROM documents) t) o
             WHERE cum <= CASE lang WHEN 'en' THEN 20000
                                    WHEN 'zh' THEN 8000
                                    WHEN 'de' THEN 5000 END
             ORDER BY doc_id"""))

  // Temperature-scaled language balancing: cap each language at
  // floor(3·sqrt(count)) docs in the deterministic (hash, id) order — the
  // square-root smoothing (τ = 1/2) that flattens multilingual pretraining
  // mixes. τ is fixed at 1/2 because IEEE requires sqrt to be CORRECTLY
  // rounded (a general pow could flip the floor() boundary between
  // engines); the oracle re-derives the per-language cap from a window
  // count with the identical floor(scale·sqrt(c)) formula.
  private val sampleTemperature = Q(
    (s, d) =>
      Sampling.temperatureCap(documents(s, d).select("doc_id", "lang"),
          "doc_id", "lang", scale = 3L, salt = 8L)
        .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, lang, rn FROM (
               SELECT doc_id, lang,
                      CAST(row_number() OVER (PARTITION BY lang
                        ORDER BY ${sqlBucket("doc_id", 8L, 1000000L)}, doc_id) AS BIGINT) AS rn,
                      count(*) OVER (PARTITION BY lang) AS c
               FROM documents) t
             WHERE rn <= greatest(CAST(floor(3 * sqrt(c)) AS BIGINT), 1)
             ORDER BY doc_id"""))

  // DSIR-style targeted selection (Xie et al. 2023, arXiv:2302.03169): rank
  // every doc by how target-like its hashed-unigram feature distribution is
  // — target = the corpus's own English slice — and keep the top 100.
  // Fixed-point integer count ratios make the weights bit-exact (ops.Dsir);
  // the model is ≤4096 rows by construction, broadcast, never corpus-sized.
  // The oracle mirrors the PolyHash fold, the bucket fold, the add-one
  // ratio arithmetic, and the (weight DESC, doc_id) top-k order.
  private val sampleDsir = Q(
    (s, d) => {
      val docs = documents(s, d).select("doc_id", "text", "lang")
      graft.ops.Dsir.topKByImportance(
          raw = docs, target = docs.filter(col("lang") === "en"),
          idCol = "doc_id", textCol = "text", k = 100)
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
            th AS (SELECT doc_id, list_transform(t, s ->
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(s, ''), c -> ascii(c))),
                       (a, c) -> (a * 31 + c) % 1000000007)) AS th FROM tok),
            inst AS (SELECT doc_id, unnest(th) % 4096 AS b FROM th),
            db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM inst GROUP BY doc_id, b),
            br AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM db GROUP BY b),
            bt AS (SELECT i.b, CAST(sum(i.c) AS BIGINT) AS ct
                   FROM db i JOIN documents d ON i.doc_id = d.doc_id
                   WHERE d.lang = 'en' GROUP BY i.b),
            q AS (SELECT br.b, ((coalesce(ct, 0) + 1) * 1000000) // (cr + 1) AS q
                  FROM br LEFT JOIN bt ON br.b = bt.b),
            sc AS (SELECT doc_id,
                     CAST(sum(c * q) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS weight
                   FROM db JOIN q USING (b) GROUP BY doc_id),
            top AS (SELECT doc_id, weight FROM sc ORDER BY weight DESC, doc_id LIMIT 100)
            SELECT doc_id, weight FROM top ORDER BY doc_id"""))

  // Length-sorted batch packing ("sorted batching"): rank every document by
  // (token length DESC, doc_id), cut the rank order into fixed 32-doc
  // batches, and account each batch's padding waste (batch max × batch size
  // − batch token sum) — the dynamic-batching layout that minimizes padding
  // when training on padded fixed-shape batches (length-similar docs land in
  // the same batch). The global rank is a distributed prefix count
  // (Sampling.rankBy — range partition + per-partition window + a
  // one-row-per-partition offset sum), never a single global window
  // partition; the oracle mirrors it with a plain row_number.
  private val packLengthBinned = Q(
    (s, d) =>
      Sampling.rankBy(
          documents(s, d).select(col("doc_id"),
              size(tokens(col("text"))).as("n_tok"))
            .withColumn("__ord", -col("n_tok")),
          Seq("__ord", "doc_id"))
        .withColumn("bin", expr("(rn - 1) DIV 32L"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          max(col("n_tok")).as("max_tok"),
          sum(col("n_tok").cast("long")).as("sum_tok"))
        .withColumn("padding",
          col("max_tok").cast("long") * col("n_docs") - col("sum_tok"))
        .orderBy("bin"),
    Some("""WITH t AS (SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tok
               FROM documents),
            r AS (SELECT doc_id, n_tok,
                    row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rn FROM t)
            SELECT (rn - 1) // 32 AS bin,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   max(n_tok) AS max_tok,
                   CAST(sum(n_tok) AS BIGINT) AS sum_tok,
                   CAST(max(n_tok) AS BIGINT) * count(*) - CAST(sum(n_tok) AS BIGINT)
                     AS padding
            FROM r GROUP BY bin ORDER BY bin"""))

  /** Shared polynomial-hash shingle chain of the oracle (DedupQueries.
    * shingleCtes' arithmetic, re-rooted on a cleaned-text CTE): token →
    * char-fold hash → 3-gram combine. */
  private def sqlShingles(src: String): String =
    s"""(SELECT doc_id, list_transform(generate_series(1, len(th) - 2),
          i -> ((th[i] * 31 + th[i+1]) % 1000000007 * 31 + th[i+2]) % 1000000007) AS hs
        FROM (SELECT doc_id, list_transform(tk, s ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(s, ''), c -> ascii(c))),
                  (a, c) -> (a * 31 + c) % 1000000007)) AS th
              FROM $src) q
        WHERE len(th) >= 3)"""

  // The COMPOSED corpus pipeline, hash-gated end to end: clean → Gopher
  // rule filter → exact dedup → benchmark decontamination → per-language
  // token-budget mixture, each stage the same public operator its own
  // catalog entry verifies (text_clean / text_gopher_rules / dedup_exact /
  // text_decontam / sample_mixture), chained the way a pretraining-data
  // run chains them. The oracle is ONE CTE chain replicating every stage,
  // so the gate covers stage INTERACTIONS (filters feeding dedup feeding
  // decontam feeding the mixture windows), not just the pieces. Scale
  // shape: per-row expressions → one text-keyed shuffle (dedup) → a
  // broadcast shingle semi-join (decontam) → one lang-keyed window
  // (mixture); nothing corpus-sized collects or cross-joins.
  private val pipelineCorpus = Q(
    (s, d) => {
      // 1. clean (text_clean twin)
      val cleanedCol = trim(regexp_replace(
        regexp_replace(col("text"), "<[^>]*>", " "), "[ \\t\\n\\f\\r]+", " "))
      val cleaned = documents(s, d)
        .select(col("doc_id"), col("lang"), cleanedCol.as("ctext"))
      // 2. Gopher rule bundle on the CLEANED text (text_gopher_rules twin)
      val toks = tokens(col("ctext"))
      val ntok = size(toks).cast("long")
      val chars = aggregate(toks, lit(0L), (a, t) => a + length(t))
      val alpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
      val sym = size(regexp_extract_all(col("ctext"), lit("#|\\.\\.\\."), lit(0))).cast("long")
      val nstop = size(array_distinct(filter(toks,
        t => t.isInCollection(graft.functions.TextFns.stopwords)))).cast("long")
      val kept = cleaned.withColumn("n_tok", ntok)
        .filter(col("n_tok") >= 50L && col("n_tok") <= 100000L &&
          chars.cast("double") / col("n_tok").cast("double") >= 3.0 &&
          chars.cast("double") / col("n_tok").cast("double") <= 10.0 &&
          alpha.cast("double") / col("n_tok").cast("double") >= 0.7 &&
          sym.cast("double") / col("n_tok").cast("double") < 0.1 &&
          nstop >= 2L)
      // 3. exact dedup via the public front door (dedup_exact twin)
      val winners = graft.api.Dedup
        .exactDedup(kept.select("doc_id", "ctext"), "doc_id", "ctext")
        .select("doc_id")
      val deduped = kept.join(winners, "doc_id")
      // 4. decontamination vs the benchmark slice — every 97th doc of the
      // ORIGINAL corpus, cleaned identically (text_decontam twin)
      val bench = cleaned.filter(col("doc_id") % 97 === 0)
      val dirty = graft.ops.Decontaminate
        .flags(deduped, "doc_id", "ctext", bench, "ctext", minOverlap = 8L)
        .filter(col("contaminated")).select(col("id").as("doc_id"))
      val survivors = deduped.join(dirty, Seq("doc_id"), "left_anti")
      // 5. per-language token-budget mixture (sample_mixture twin)
      graft.ops.Sampling.mixtureByBudget(
          survivors.select(col("doc_id"), col("lang"), col("n_tok")),
          "doc_id", "lang", "n_tok",
          budgets = Map("en" -> 20000L, "zh" -> 8000L, "de" -> 5000L), salt = 7L)
        .select("doc_id", "lang", "n_tok")
        .orderBy("doc_id")
    },
    Some(s"""WITH cln AS (
               SELECT doc_id, lang,
                      trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'), '[ \t\n\f\r]+', ' ', 'g')) AS ctext
               FROM documents),
             tok AS (SELECT doc_id, lang, ctext,
                            string_split_regex(trim(ctext), '\\s+') AS tk FROM cln),
             g AS (SELECT doc_id, lang, ctext, tk,
                     CAST(len(tk) AS BIGINT) AS n_tok,
                     CAST(list_sum(list_transform(tk, x -> len(x))) AS BIGINT) AS chars,
                     CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
                     CAST(len(regexp_extract_all(ctext, '#|\\.\\.\\.')) AS BIGINT) AS sym,
                     CAST(len(list_distinct(list_filter(tk,
                       x -> x IN ('the','a','of','and','to','in','is')))) AS BIGINT) AS nstop
                   FROM tok),
             kept AS (SELECT doc_id, lang, ctext, tk, n_tok FROM g
                      WHERE n_tok >= 50 AND n_tok <= 100000
                        AND CAST(chars AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 3.0
                        AND CAST(chars AS DOUBLE) / CAST(n_tok AS DOUBLE) <= 10.0
                        AND CAST(alpha AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 0.7
                        AND CAST(sym AS DOUBLE) / CAST(n_tok AS DOUBLE) < 0.1
                        AND nstop >= 2),
             win AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY ctext),
             ded AS (SELECT k.doc_id, k.lang, k.tk, k.n_tok FROM kept k JOIN win USING (doc_id)),
             btok AS (SELECT doc_id, string_split_regex(trim(ctext), '\\s+') AS tk
                      FROM cln WHERE doc_id % 97 = 0),
             ds AS (SELECT doc_id, unnest(list_distinct(hs)) AS h FROM ${sqlShingles("ded")} dsh),
             bs AS (SELECT DISTINCT unnest(list_distinct(hs)) AS h FROM ${sqlShingles("btok")} bsh),
             hits AS (SELECT doc_id, count(*) AS n_hits FROM ds JOIN bs USING (h) GROUP BY doc_id),
             surv AS (SELECT d.doc_id, d.lang, d.n_tok FROM ded d LEFT JOIN hits USING (doc_id)
                      WHERE coalesce(hits.n_hits, 0) < 8),
             mix AS (SELECT doc_id, lang, n_tok,
                       sum(CAST(n_tok AS BIGINT)) OVER (PARTITION BY lang
                         ORDER BY ${sqlBucket("doc_id", 7L, 1000000L)}, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                     FROM surv)
             SELECT doc_id, lang, n_tok FROM mix
             WHERE cum <= CASE lang WHEN 'en' THEN 20000
                                    WHEN 'zh' THEN 8000
                                    WHEN 'de' THEN 5000 END
             ORDER BY doc_id"""))

  val all: List[(String, Q)] = List(
    "sample_split" -> sampleSplit,
    "sample_stratified" -> sampleStratified,
    "split_leakage_safe" -> splitLeakageSafe,
    "sample_k_by_hash" -> sampleK,
    "sample_token_budget" -> sampleTokenBudget,
    "sample_domain_cap" -> sampleDomainCap,
    "sample_mixture" -> sampleMixture,
    "sample_temperature" -> sampleTemperature,
    "sample_dsir" -> sampleDsir,
    "pack_chunks" -> packChunks,
    "pack_length_binned" -> packLengthBinned,
    "pipeline_corpus" -> pipelineCorpus)
}
