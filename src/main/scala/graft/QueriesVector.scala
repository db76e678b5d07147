package graft

import org.apache.spark.sql.functions._

import graft.expressions.VecDot
import graft.functions.VectorFns._
import graft.Tables._

/** Similarity search over `array<float>` embeddings (SURVEY.md §2.9 X3 +
  * driver-mandated ANN variant).
  *
  * Scale posture: `sim_topk` is the brute-force baseline — correct, and fine
  * when the query set is small and broadcastable (it is the broadcast side of
  * a nested-loop join; the corpus streams by without shuffling). `sim_ann`
  * is the scale path: an LSH-style sign bucket turns the cross join into an
  * equi join on the bucket key, so candidate generation shuffles only by
  * bucket. For near-dup pairs, `dedup_embedding` is the EXACT answer via the
  * triangle block self-join (ops.AllPairs — no corpus-sized broadcast), and
  * `dedup_lsh_cosine` the banded-LSH approximate answer whose recall/cost
  * tradeoff vs exact is measured in VectorRecallSpec.
  * All cosine math is double-precision with array-order summation so the
  * DuckDB oracle computes identical values (see functions.VectorFns).
  */
object VectorQueries {

  /** Oracle-side cosine between a.embedding and b.embedding (explicit
    * elementwise expansion — same op order as VectorFns.cosine). */
  private def sqlCos(a: String, b: String): String =
    s"""(list_sum(list_transform(generate_series(1, len($a.embedding)),
        i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, len($a.embedding)),
             i -> CAST($a.embedding[i] AS DOUBLE) * CAST($a.embedding[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, len($b.embedding)),
             i -> CAST($b.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))))))"""

  // Brute-force cosine top-k for a small query set — delegates to the public
  // API (api.Similarity.cosineTopK: broadcast the queries, stream the corpus,
  // window-rank per query; dummy-key BroadcastHashJoin so the 64-dim cosine
  // probe stays in whole-stage codegen — plan-asserted in ScaleSpec). Sim
  // values are kept out of the output (rank + ids only) so last-ulp FP noise
  // cannot break the hash.
  private val simTopk = Q(
    (s, d) => {
      val e = embeddings(s, d)
      graft.api.Similarity.cosineTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 10)
        .orderBy("q_id", "rank")
    },
    Some(s"""SELECT q_id, rank, nbr_id FROM (
              SELECT a.vec_id AS q_id, b.vec_id AS nbr_id,
                     row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${sqlCos("a", "b")} DESC, b.vec_id ASC) AS rank
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
              WHERE a.vec_id < 10) t
            WHERE rank <= 10 ORDER BY q_id, rank"""))

  // LSH-bucketed ANN: sign bucket over the first 8 components turns candidate
  // generation into an equi join on the bucket key — the 100 TB path.
  private val simAnn = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), signBucket(col("embedding"), 8).as("bucket"),
          VecDot(col("embedding"), col("embedding")).as("nn"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"),
          col("nn").as("q_nn"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
      q.join(e, Seq("bucket"))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          (VecDot(col("q_emb"), col("embedding")) /
            (sqrt(col("q_nn")) * sqrt(col("nn")))).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("q_id", "rank", "nbr_id")
        .orderBy("q_id", "rank")
    },
    Some {
      val bucket = (1 to 8).map(i =>
        s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
      s"""WITH e AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
         SELECT q_id, rank, nbr_id FROM (
           SELECT a.vec_id AS q_id, b.vec_id AS nbr_id,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY ${sqlCos("a", "b")} DESC, b.vec_id ASC) AS rank
           FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
           WHERE a.vec_id < 10) t
         WHERE rank <= 3 ORDER BY q_id, rank"""
    })

  // Embedding-cosine near-dup pairs (threshold 0.45 sits in the data's sim
  // range so the op has output; nearest pair is ~1e-5 away from the cut, far
  // beyond FP noise). Exact — recall 1.0 by construction — via the triangle
  // block self-join (ops.AllPairs): no broadcast grows with the corpus, each
  // task holds 2·n/P rows and the n²/2 dot products spread over P(P+1)/2
  // reducers. This is the canonical exact answer; at low thresholds like 0.45
  // no LSH family prunes candidates below all-pairs cost anyway (a τ=0.45
  // pair agrees with a random hyperplane with p≈0.65, so the bands needed for
  // recall→1 cost more than n²/2 — measured in VectorRecallSpec), which is
  // why the approximate dedup_lsh_cosine below targets the high-τ regime.
  private val dedupEmbedding = Q(
    (s, d) => graft.api.Similarity.exactNearDupPairs(embeddings(s, d),
        "vec_id", "embedding", graft.api.Dedup.cosineTau, blocks = 16)
      .orderBy("id1", "id2"),
    Some(s"""SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ${sqlCos("a", "b")} >= 0.45
            ORDER BY id1, id2"""))

  // IVF-style ANN: deterministic coarse centroids (the embeddings of
  // vec_id 0..15 — a real build would k-means; centroid choice is config,
  // the partitioned search shape is the operator), assign every vector to
  // its nearest centroid by cosine (argmin with id tiebreak), then answer
  // queries inside their own cell only. At scale: the assignment is one
  // broadcast pass over the corpus, the search an equi join on cell id —
  // same shuffle shape as sim_ann but with data-adaptive cells.
  private val simIvf = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), VecDot(col("embedding"), col("embedding")).as("nn"))
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nn").as("c_nn"))
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(col("c_sim").desc, col("c_id").asc)
      val assigned = e.repartition(col("vec_id")).withColumn("z", pmod(col("vec_id"), lit(1L)))
        .join(broadcast(cents.withColumn("z", pmod(col("c_id"), lit(1L)))), Seq("z"))
        .select(col("vec_id"), col("embedding"), col("nn"), col("c_id"),
          (VecDot(col("embedding"), col("c_emb")) /
            (sqrt(col("nn")) * sqrt(col("c_nn")))).as("c_sim"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("nn"), col("c_id").as("cell"))
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nn").as("q_nn"), col("cell"))
      // Lifecycle A/B (r6, sf0.1 + sf1, local[32], warm): persist+eager-
      // checkpoint of the assignment cost 0.88-0.90 s / 1.09 s; plain
      // recompute (both cell-join sides re-score against the broadcast
      // centroids inside ONE job) runs 0.70-0.76 s / 0.75-0.79 s — the cache
      // write+read exceeds one extra codegen'd scoring pass at any scale
      // where the assignment doesn't fit in memory anyway. A production IVF
      // index is persistent state written ONCE (parquet, partitioned by
      // cell), not a per-query cache; inside a one-shot query, recompute
      // wins. Recorded in BASELINE.md r6.
      val wTop = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
      val result = q.join(assigned, Seq("cell"))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          (VecDot(col("q_emb"), col("embedding")) /
            (sqrt(col("q_nn")) * sqrt(col("nn")))).as("sim"))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 3)
        .select("q_id", "rank", "nbr_id")
        .orderBy("q_id", "rank")
      result
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
            cents AS (SELECT vec_id AS c_id, embedding AS c_emb FROM e WHERE vec_id < 16),
            assigned AS (
              SELECT vec_id, embedding, cell FROM (
                SELECT a.vec_id, a.embedding, c.c_id AS cell,
                       row_number() OVER (PARTITION BY a.vec_id ORDER BY
                         (list_sum(list_transform(generate_series(1, len(a.embedding)),
                            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
                          / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
                               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                           * sqrt(list_sum(list_transform(generate_series(1, len(c.c_emb)),
                               i -> CAST(c.c_emb[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))))) DESC,
                         c.c_id ASC) AS rn
                FROM e a CROSS JOIN cents c) t WHERE rn = 1)
            SELECT q_id, rank, nbr_id FROM (
              SELECT a.vec_id AS q_id, b.vec_id AS nbr_id,
                     row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${sqlCos("a", "b")} DESC, b.vec_id ASC) AS rank
              FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id <> b.vec_id
              WHERE a.vec_id < 10) t
            WHERE rank <= 3 ORDER BY q_id, rank"""))

  private def sqlHpSign(j: Int, i: String): String =
    s"(CASE WHEN (${j + 1} * ($i + 7) * 2654435761) % 1000000007 % 2 = 1 THEN 1.0 ELSE -1.0 END)"

  // Banded random-hyperplane LSH near-dup — delegates to the public API
  // (api.Similarity.lshCosineNearDup) with the driver corpus's τ and the
  // (4 bands × 4 bits) geometry that τ=0.45 forces (see
  // Similarity.bandGeometry: at borderline τ the per-hyperplane agreement
  // p≈0.65 collapses wide bands, so recall ≈ 1-(1-p⁴)⁴ ≈ 54% here, →1 as
  // similarity rises — measured in VectorRecallSpec; real dedup runs at
  // τ≥0.8 where (16,8) gives recall ≥0.94 at n²/256-per-band candidates).
  // Candidate generation carries ONLY (band, key, id) through its one equi
  // join — embedding payloads re-attach per surviving pair, never riding the
  // candidate shuffle. Precision is 1.0 by construction (exact verify).
  // Hyperplanes are pseudo-random from integer arithmetic so the oracle
  // derives identical signs; projections sum left-to-right to match bit-level.
  private val dedupLshCosine = Q(
    (s, d) => graft.api.Similarity.lshCosineNearDup(embeddings(s, d),
        "vec_id", "embedding", graft.api.Dedup.cosineTau, nBands = 4, bitsPerBand = 4)
      .orderBy("id1", "id2"),
    Some {
      def sqlBandKey(b: Int) = (4 * b until 4 * b + 4).map { j =>
        s"""(CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)),
            i -> CAST(embedding[i] AS DOUBLE) * ${sqlHpSign(j, "i")})) > 0
            THEN '1' ELSE '0' END)"""
      }.mkString(" || ")
      val bands = (0 until 4).map(b => s"${sqlBandKey(b)} AS k$b").mkString(", ")
      val anyBand = (0 until 4).map(b => s"a.k$b = b.k$b").mkString(" OR ")
      s"""WITH e AS (SELECT vec_id, embedding, $bands FROM embeddings)
         SELECT a.vec_id AS id1, b.vec_id AS id2
         FROM e a JOIN e b ON ($anyBand) AND a.vec_id < b.vec_id
         WHERE ${sqlCos("a", "b")} >= 0.45
         ORDER BY id1, id2"""
    })

  // SKETCH-VERIFIED banded near-dup (the 100 TB verify shape, r13): the
  // same bands and tau as dedup_lsh_cosine, but candidates filter MAP-SIDE
  // against broadcast 256-plane signatures before an exact rerank — the
  // candidate stream never crosses a shuffle (the property that closed the
  // 2.2M ladder rung the exact verify could not fit on local disk; see
  // BASELINE.md). Signatures are deterministic, and on this corpus the 4-
  // sigma margin admits every banded pair, so the EXACT path's oracle gates
  // this entry row-for-row (VectorRecallSpec proves the equality property).
  private val dedupLshSketched = Q(
    (s, d) => graft.api.Similarity.lshCosineNearDupSketched(embeddings(s, d),
        "vec_id", "embedding", graft.api.Dedup.cosineTau, nBands = 4, bitsPerBand = 4)
      .orderBy("id1", "id2"),
    dedupLshCosine.oracle)

  // Embedding-space near-dup CLUSTERING: the semantic twin of
  // dedup_cluster — LSH-candidate cosine pairs (same geometry and τ as
  // dedup_lsh_cosine, so the oracle mirrors the bands exactly) fed through
  // min-label connected components; every vector labeled with the smallest
  // reachable vec_id, singletons labeling themselves. At 100 TB: candidate
  // generation is the banded equi join, clustering shuffles the (narrow)
  // edge set once per fixpoint round.
  private val dedupEmbeddingCluster = Q(
    (s, d) => {
      val emb = embeddings(s, d)
      val pairs = graft.api.Similarity.lshCosineNearDup(emb, "vec_id", "embedding",
        graft.api.Dedup.cosineTau, nBands = 4, bitsPerBand = 4)
      val labels = graft.ops.ConnectedComponents.labels(pairs)
      val singletons = emb.select(col("vec_id").as("id"))
        .join(labels.select("id"), Seq("id"), "left_anti")
        .withColumn("label", col("id"))
      labels.union(singletons)
        .select(col("id").as("vec_id"), col("label").as("cluster"))
        .orderBy("vec_id")
    },
    Some {
      def sqlBandKey(b: Int) = (4 * b until 4 * b + 4).map { j =>
        s"""(CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)),
            i -> CAST(embedding[i] AS DOUBLE) * ${sqlHpSign(j, "i")})) > 0
            THEN '1' ELSE '0' END)"""
      }.mkString(" || ")
      val bands = (0 until 4).map(b => s"${sqlBandKey(b)} AS k$b").mkString(", ")
      val anyBand = (0 until 4).map(b => s"a.k$b = b.k$b").mkString(" OR ")
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding, $bands FROM embeddings),
         pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2
                   FROM e a JOIN e b ON ($anyBand) AND a.vec_id < b.vec_id
                   WHERE ${sqlCos("a", "b")} >= 0.45),
         edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                   UNION ALL SELECT id2, id1 FROM pairs),
         reach AS (SELECT vec_id AS id, vec_id AS label FROM embeddings
                   UNION
                   SELECT e2.dst, r.label FROM reach r JOIN edges e2 ON e2.src = r.id)
         SELECT id AS vec_id, CAST(min(label) AS BIGINT) AS cluster
         FROM reach GROUP BY id ORDER BY vec_id"""
    })

  // SemDeDup-style cell-blocked semantic dedup (Abbas et al. 2023,
  // arXiv:2303.09540 — the published recipe for web-scale embedding dedup:
  // cluster the corpus into k cells, then dedup WITHIN cells only). The
  // 100 TB trade made explicit: assignment is one broadcast-argmin pass
  // (k×dim centroids, never the corpus), the pair join shuffles by cell id,
  // and within-cell cost is quadratic only in cell size — while cross-cell
  // near-dup pairs are forfeited BY DESIGN. Because this entry runs the same
  // corpus and τ as `dedup_embedding` (the exact all-pairs answer), the
  // recall given up by blocking is directly measurable: this result is the
  // subset of dedup_embedding's pairs whose ends land in the same cell.
  // Cells here are the deterministic seed centroids sim_ivf uses (vec_id
  // 0..15; a real build trains them with ops.KMeans — centroid source is
  // config, the blocked-dedup shape is the operator). With k FIXED at 16
  // the within-cell cost is still ~n²/16 — quadratic by contract, skipped
  // at sf10 alongside dedup_embedding; SemDeDup at real scale grows k with
  // the corpus (the paper uses k ≈ n/10⁴) so cells stay bounded.
  private val dedupSemanticCells = Q(
    (s, d) => {
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val assigned = graft.api.Similarity.assignCellsCosine(
        e, "vec_id", "embedding", cents, "c_id", "c_emb")
      graft.api.Similarity.withinCellNearDup(
          assigned, "vec_id", "embedding", graft.api.Dedup.cosineTau)
        .orderBy("id1", "id2")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
            cents AS (SELECT vec_id AS c_id, embedding AS c_emb FROM e WHERE vec_id < 16),
            assigned AS (
              SELECT vec_id, embedding, cell FROM (
                SELECT a.vec_id, a.embedding, c.c_id AS cell,
                       row_number() OVER (PARTITION BY a.vec_id ORDER BY
                         (list_sum(list_transform(generate_series(1, len(a.embedding)),
                            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
                          / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
                               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                           * sqrt(list_sum(list_transform(generate_series(1, len(c.c_emb)),
                               i -> CAST(c.c_emb[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))))) DESC,
                         c.c_id ASC) AS rn
                FROM e a CROSS JOIN cents c) t WHERE rn = 1)
            SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE ${sqlCos("a", "b")} >= 0.45
            ORDER BY id1, id2"""))

  // ---- Wide-band (production-geometry) LSH entries -------------------------
  // The τ=0.45 entries above are corpus-forced to the (4,4) geometry, which is
  // near-quadratic in candidates; REAL embedding dedup runs at τ≥0.8 where
  // bandGeometry gives (16,8) — candidates ~n²/256 per band. The synthetic
  // embeddings hold no pair above cosine ~0.6 (measured: max 0.513 at sf0.01,
  // 0.601 at sf0.1), so τ=0.8 against the raw table would return zero rows —
  // a trivially-green query that proves nothing about the band construction.
  // The wide geometry is therefore oracle-verified in two complementary ways:
  //  - `lsh_bands_wide` emits EVERY (16,8) band key of the raw table, so all
  //    128 hyperplane sign bits per vector are hash-compared cross-engine —
  //    the band construction itself is the verified output;
  //  - `dedup_lsh_cosine_wide` / `dedup_embedding_cluster_wide` run the real
  //    τ=0.8 near-dup call over a deterministically derived corpus: every
  //    10th vector gains a 2×-scaled copy at vec_id + 10,000,000. Scaling by
  //    a power of two is exact in binary FP, so the copy keeps every
  //    hyperplane sign and sits at cosine exactly 1.0 from its original
  //    (both engines compute bit-identical values), while every incidental
  //    pair stays below 0.8 — the wide geometry must find precisely the
  //    planted duplicates, through the same candidate-join + verify path a
  //    production corpus takes.
  private def widenedCorpus(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.select(col("vec_id"), col("embedding"))
      .union(e.filter(pmod(col("vec_id"), lit(10L)) === 0)
        .select((col("vec_id") + lit(10000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))

  private val sqlWidenedCorpus =
    """wc AS (SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 10000000,
                     list_transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))
              FROM embeddings WHERE vec_id % 10 = 0)"""

  /** Exact row count of [[widenedCorpus]] from ONE pass over the BASE
    * table (r17, guide §1.2): `count(widenedCorpus(e))` scans the
    * embeddings table twice (once per union leg); base count and planted
    * count fold into a single column-pruned aggregate instead. Feeds the
    * adaptive entries' `knownCount` — the count must stay EXACT (the
    * oracle derives the identical geometry from `count(wc)`), which is
    * also why it cannot come from parquet footers alone: the planted leg's
    * `vec_id % 10 = 0` membership is data, not metadata. */
  private def widenedCount(e: org.apache.spark.sql.DataFrame): Long = {
    val r = e.agg(count(lit(1)),
      sum(when(pmod(col("vec_id"), lit(10L)) === 0, 1L).otherwise(0L))).head
    r.getLong(0) + (if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** 8-bit band key `b` of the (16,8) geometry — DuckDB twin of
    * Similarity.bandsOf at bitsPerBand=8 (same hyperplanes via sqlHpSign). */
  private def sqlBandKeyWide(b: Int): String = (8 * b until 8 * b + 8).map { j =>
    s"""(CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)),
        i -> CAST(embedding[i] AS DOUBLE) * ${sqlHpSign(j, "i")})) > 0
        THEN '1' ELSE '0' END)"""
  }.mkString(" || ")

  private val lshBandsWide = Q(
    (s, d) => graft.api.Similarity.bandsOf(embeddings(s, d), "vec_id", "embedding",
        nBands = 16, bitsPerBand = 8)
      .select(col("__id").as("vec_id"), col("band"), col("key").as("band_key"))
      .orderBy("vec_id", "band"),
    Some((0 until 16).map(b =>
        s"SELECT vec_id, $b AS band, ${sqlBandKeyWide(b)} AS band_key FROM embeddings")
      .mkString("SELECT vec_id, band, band_key FROM (", " UNION ALL ",
        ") t ORDER BY vec_id, band")))

  private val dedupLshCosineWide = Q(
    (s, d) => graft.api.Similarity.lshCosineNearDup(widenedCorpus(embeddings(s, d)),
        "vec_id", "embedding", tau = 0.8) // bandGeometry(0.8) = (16, 8)
      .orderBy("id1", "id2"),
    Some {
      val bands = (0 until 16).map(b => s"${sqlBandKeyWide(b)} AS k$b").mkString(", ")
      val anyBand = (0 until 16).map(b => s"a.k$b = b.k$b").mkString(" OR ")
      s"""WITH $sqlWidenedCorpus,
         e AS (SELECT vec_id, embedding, $bands FROM wc)
         SELECT a.vec_id AS id1, b.vec_id AS id2
         FROM e a JOIN e b ON ($anyBand) AND a.vec_id < b.vec_id
         WHERE ${sqlCos("a", "b")} >= 0.8
         ORDER BY id1, id2"""
    })

  private val dedupEmbeddingClusterWide = Q(
    (s, d) => {
      val emb = widenedCorpus(embeddings(s, d))
      val pairs = graft.api.Similarity.lshCosineNearDup(emb, "vec_id", "embedding",
        tau = 0.8, nBands = 16, bitsPerBand = 8)
      val labels = graft.ops.ConnectedComponents.labels(pairs)
      val singletons = emb.select(col("vec_id").as("id"))
        .join(labels.select("id"), Seq("id"), "left_anti")
        .withColumn("label", col("id"))
      labels.union(singletons)
        .select(col("id").as("vec_id"), col("label").as("cluster"))
        .orderBy("vec_id")
    },
    Some {
      val bands = (0 until 16).map(b => s"${sqlBandKeyWide(b)} AS k$b").mkString(", ")
      val anyBand = (0 until 16).map(b => s"a.k$b = b.k$b").mkString(" OR ")
      s"""WITH RECURSIVE $sqlWidenedCorpus,
         e AS (SELECT vec_id, embedding, $bands FROM wc),
         pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2
                   FROM e a JOIN e b ON ($anyBand) AND a.vec_id < b.vec_id
                   WHERE ${sqlCos("a", "b")} >= 0.8),
         edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                   UNION ALL SELECT id2, id1 FROM pairs),
         reach AS (SELECT vec_id AS id, vec_id AS label FROM wc
                   UNION
                   SELECT e2.dst, r.label FROM reach r JOIN edges e2 ON e2.src = r.id)
         SELECT id AS vec_id, CAST(min(label) AS BIGINT) AS cluster
         FROM reach GROUP BY id ORDER BY vec_id"""
    })

  // Trained-IVF ANN — the PRODUCTION index path (ops.KMeans: bit-deterministic
  // distributed Lloyd's) under the oracle gate. Centroids are LEARNED from the
  // data, the corpus is assigned to its nearest cell (map-side argmin over the
  // broadcast model), and each query probes ALL k cells via assignAll — so the
  // union of per-cell searches is exhaustive and the output provably equals
  // brute-force top-3 independent of what the training converged to. The
  // oracle is therefore the brute-force SQL — intentionally model-free:
  // DuckDB cannot mirror k-means, and with full probes it doesn't need to.
  // What the hash-compare pins cross-engine: fit + assign + assignAll + cell
  // equi join + global re-rank must together lose, duplicate, or misrank
  // nothing. Production recall at probe < k is the measured curve in
  // BASELINE.md (r7: recall@3 holds 0.58→0.59 at probe 4 across 10× data).
  private val simIvfTrained = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = embeddings(s, d)
      val model = graft.ops.KMeans.fit(e, "vec_id", "embedding", k = 16)
      val corpus = graft.ops.KMeans.assign(e, "embedding", model)
        .select(col("vec_id"), col("embedding"), col("cell"),
          VecDot(col("embedding"), col("embedding")).as("nn"))
      val queries = graft.ops.KMeans
        .assignAll(e.filter(col("vec_id") < 10), "embedding", model)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("cell"), VecDot(col("embedding"), col("embedding")).as("q_nn"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
      queries.join(corpus, Seq("cell"))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          (VecDot(col("q_emb"), col("embedding")) /
            (sqrt(col("q_nn")) * sqrt(col("nn")))).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("q_id", "rank", "nbr_id")
        .orderBy("q_id", "rank")
    },
    Some(s"""SELECT q_id, rank, nbr_id FROM (
              SELECT a.vec_id AS q_id, b.vec_id AS nbr_id,
                     row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${sqlCos("a", "b")} DESC, b.vec_id ASC) AS rank
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
              WHERE a.vec_id < 10) t
            WHERE rank <= 3 ORDER BY q_id, rank"""))

  // Scale-ADAPTIVE band geometry under the oracle gate: the declared 100 TB
  // LSH shape (Similarity.adaptiveBandGeometry — bits track ⌈log₂ n⌉ − 2 so
  // bucket count tracks corpus size, bands restore recall) running the real
  // τ=0.8 near-dup over the planted-duplicate corpus. The oracle derives the
  // SAME geometry from the SAME inputs dynamically in SQL — count(wc), then
  // bits/bands via the identical formula (structurally matched so both
  // engines' IEEE-double libm calls agree; the ceil()s land far from integer
  // boundaries for any plausible n) — then mirrors every hyperplane sign at
  // the computed width. Planted 2×-scaled copies keep all sign bits, so they
  // collide in every band and recall on them is 1.0 at any geometry; the
  // hash-compare thus pins the adaptive band construction itself, not a
  // lucky recall draw. Plane superset 15360 = maxBands 512 × bits cap 30.
  private val dedupLshCosineAdaptive = Q(
    (s, d) => {
      val e = embeddings(s, d)
      graft.api.Similarity.lshCosineNearDupAdaptive(
          widenedCorpus(e), "vec_id", "embedding", tau = 0.8,
          knownCount = Some(widenedCount(e)))
        .orderBy("id1", "id2")
    },
    Some(s"""WITH $sqlWidenedCorpus,
            g AS (SELECT LEAST(30, GREATEST(8,
                    CAST(ceil(ln(CAST(count(*) AS DOUBLE)) / ln(2.0)) AS INT) - 2)) AS bits,
                    (1.0 - acos(0.8) / pi()) AS p
                  FROM wc),
            g2 AS (SELECT bits,
                    CAST(GREATEST(16, LEAST(CAST(ceil(ln(0.1) /
                      ln(1.0 - pow(p, bits))) AS BIGINT), 512)) AS INT) AS bands
                   FROM g),
            planes AS (SELECT t.j, CAST(t.j // g2.bits AS INT) AS band
                       FROM generate_series(0, 15359) AS t(j), g2
                       WHERE t.j < g2.bands * g2.bits),
            keys AS (
              SELECT wc.vec_id, p.band,
                     string_agg(CASE WHEN list_sum(list_transform(
                         generate_series(1, len(wc.embedding)),
                         i -> CAST(wc.embedding[i] AS DOUBLE) *
                              (CASE WHEN ((p.j + 1) * (i + 7) * 2654435761)
                                    % 1000000007 % 2 = 1
                               THEN 1.0 ELSE -1.0 END))) > 0
                       THEN '1' ELSE '0' END, '' ORDER BY p.j) AS key
              FROM wc, planes p
              GROUP BY wc.vec_id, p.band),
            cand AS (SELECT DISTINCT k1.vec_id AS v1, k2.vec_id AS v2
                     FROM keys k1 JOIN keys k2 ON k1.band = k2.band
                       AND k1.key = k2.key AND k1.vec_id < k2.vec_id)
            SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM cand JOIN wc a ON a.vec_id = cand.v1
                      JOIN wc b ON b.vec_id = cand.v2
            WHERE ${sqlCos("a", "b")} >= 0.8
            ORDER BY id1, id2"""))


  // The 100 TB sketched near-dup end-to-end: sketchBandGeometry sizes the
  // banding for the sketch path's inverted economics (bits back off 8 —
  // in-join popcount rejections are ~free, the signature-wide index is the
  // cost; see api.Similarity.sketchBandGeometry), the 256-plane sketch
  // rides the banded join as a codegen'd column, and survivors rerank
  // exactly. The DuckDB twin re-derives the SAME geometry from count(*)
  // (the −8 bits rule) and verifies candidates with the exact cosine — a
  // valid oracle because every qualifying pair in the widened corpus is an
  // exact duplicate (organic max cosine ≈ 0.6), whose 256/256 agreement
  // the 4σ cut admits unconditionally, and the exact rerank forbids false
  // positives on both sides.
  private val dedupLshSketchedAdaptive = Q(
    (s, d) => {
      val e = embeddings(s, d)
      graft.api.Similarity.lshCosineNearDupSketchedAdaptive(
          widenedCorpus(e), "vec_id", "embedding", tau = 0.8,
          knownCount = Some(widenedCount(e)))
        .orderBy("id1", "id2")
    },
    Some(s"""WITH $sqlWidenedCorpus,
            g AS (SELECT LEAST(30, GREATEST(8,
                    CAST(ceil(ln(CAST(count(*) AS DOUBLE)) / ln(2.0)) AS INT) - 8)) AS bits,
                    (1.0 - acos(0.8) / pi()) AS p
                  FROM wc),
            g2 AS (SELECT bits,
                    CAST(GREATEST(16, LEAST(CAST(ceil(ln(0.1) /
                      ln(1.0 - pow(p, bits))) AS BIGINT), 512)) AS INT) AS bands
                   FROM g),
            planes AS (SELECT t.j, CAST(t.j // g2.bits AS INT) AS band
                       FROM generate_series(0, 15359) AS t(j), g2
                       WHERE t.j < g2.bands * g2.bits),
            keys AS (
              SELECT wc.vec_id, p.band,
                     string_agg(CASE WHEN list_sum(list_transform(
                         generate_series(1, len(wc.embedding)),
                         i -> CAST(wc.embedding[i] AS DOUBLE) *
                              (CASE WHEN ((p.j + 1) * (i + 7) * 2654435761)
                                    % 1000000007 % 2 = 1
                               THEN 1.0 ELSE -1.0 END))) > 0
                       THEN '1' ELSE '0' END, '' ORDER BY p.j) AS key
              FROM wc, planes p
              GROUP BY wc.vec_id, p.band),
            cand AS (SELECT DISTINCT k1.vec_id AS v1, k2.vec_id AS v2
                     FROM keys k1 JOIN keys k2 ON k1.band = k2.band
                       AND k1.key = k2.key AND k1.vec_id < k2.vec_id)
            SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM cand JOIN wc a ON a.vec_id = cand.v1
                      JOIN wc b ON b.vec_id = cand.v2
            WHERE ${sqlCos("a", "b")} >= 0.8
            ORDER BY id1, id2"""))

  // Product-quantization ADC search (Jégou et al. 2011 — the memory half of
  // IVF-PQ, the standard web-scale vector-store layout): corpus vectors are
  // stored as m=8 codes into per-block k=16 codebooks; queries score exact
  // sub-vectors against a broadcast query×codeword lookup table, so the
  // corpus floats are never touched at query time. Codebook = the fixed
  // seed vectors (vec_id < 16, same oracle-mirrorable pattern as sim_ivf's
  // seed centroids); production trains each block's codebook with
  // KMeans.fit — same plumbing (ops.ProductQuant doc). Every distance is a
  // left-to-right ordered fold in double, and the per-pair ADC total sums
  // its 8 block distances in sorted block order, so the DuckDB twin is
  // bit-exact.
  private val simPq = Q(
    (s, d) => {
      val e = embeddings(s, d).select("vec_id", "embedding")
      val cb = graft.ops.ProductQuant.codebookFromVectors(
        e.filter(col("vec_id") < 16), "vec_id", "embedding", m = 8)
      val codes = graft.ops.ProductQuant.encode(e, "vec_id", "embedding", cb, m = 8)
      graft.ops.ProductQuant.adcTopK(codes, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", cb, m = 8, k = 3)
        .orderBy("q_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
            bl AS (SELECT vec_id, b, embedding[b*8+1 : b*8+8] AS sub
                   FROM e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) s),
            cb AS (SELECT vec_id AS code, b, sub FROM bl WHERE vec_id < 16),
            enc AS (SELECT vec_id, b, code FROM (
                      SELECT v.vec_id, v.b, c.code,
                             row_number() OVER (PARTITION BY v.vec_id, v.b ORDER BY
                               list_sum(list_transform(generate_series(1, 8),
                                 i -> (CAST(v.sub[i] AS DOUBLE) - CAST(c.sub[i] AS DOUBLE))
                                    * (CAST(v.sub[i] AS DOUBLE) - CAST(c.sub[i] AS DOUBLE)))) ASC,
                               c.code ASC) AS rn
                      FROM bl v JOIN cb c USING (b)) t WHERE rn = 1),
            lut AS (SELECT q.vec_id AS q_id, q.b, c.code,
                           list_sum(list_transform(generate_series(1, 8),
                             i -> (CAST(q.sub[i] AS DOUBLE) - CAST(c.sub[i] AS DOUBLE))
                                * (CAST(q.sub[i] AS DOUBLE) - CAST(c.sub[i] AS DOUBLE)))) AS d
                    FROM bl q JOIN cb c USING (b) WHERE q.vec_id < 10),
            pair AS (SELECT l.q_id, en.vec_id,
                            list_sum(list_transform(list_sort(list(struct_pack(b := en.b, d := l.d))), x -> x.d)) AS adist
                     FROM enc en JOIN lut l ON en.b = l.b AND en.code = l.code
                     GROUP BY l.q_id, en.vec_id)
            SELECT q_id, rank, nbr_id FROM (
              SELECT q_id, vec_id AS nbr_id,
                     row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rank
              FROM pair WHERE q_id <> vec_id) t
            WHERE rank <= 3 ORDER BY q_id, rank"""))

  // IVF-PQ — the two ANN halves the catalog already verifies separately
  // (sim_ivf: cell-pruned search; sim_pq: ADC over codes) COMPOSED into the
  // standard web-scale vector-store layout (Jégou et al. 2011): corpus
  // vectors are assigned to seed-centroid cells AND stored as m=8 PQ codes;
  // a query probes its own cell only, scoring candidates by ADC against a
  // broadcast query×codeword table — so the search touches neither
  // out-of-cell vectors (IVF pruning, in the join key) nor any corpus float
  // (PQ). Seed cells (vec_id < 16) + seed codebooks keep every step
  // oracle-mirrorable; production swaps in KMeans.fit for both (same
  // contract, see ops.KMeans / ProductQuant.trainedCodebook). Probe 1 is
  // the determinism-friendly setting; more probes widen the cell filter,
  // not the shape.
  private val simIvfpq = Q(
    (s, d) => {
      val e = embeddings(s, d).select("vec_id", "embedding")
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val assigned = graft.api.Similarity.assignCellsCosine(
        e, "vec_id", "embedding", cents, "c_id", "c_emb")
      val cb = graft.ops.ProductQuant.codebookFromVectors(
        e.filter(col("vec_id") < 16), "vec_id", "embedding", m = 8)
      graft.ops.ProductQuant.ivfpqTopK(assigned,
          assigned.filter(col("vec_id") < 10), "vec_id", "embedding",
          cb, m = 8, k = 3)
        .orderBy("q_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
            cents AS (SELECT vec_id AS c_id, embedding AS c_emb FROM e WHERE vec_id < 16),
            assigned AS (
              SELECT vec_id, cell FROM (
                SELECT a.vec_id, c.c_id AS cell,
                       row_number() OVER (PARTITION BY a.vec_id ORDER BY
                         (list_sum(list_transform(generate_series(1, len(a.embedding)),
                            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
                          / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
                               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                           * sqrt(list_sum(list_transform(generate_series(1, len(c.c_emb)),
                               i -> CAST(c.c_emb[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))))) DESC,
                         c.c_id ASC) AS rn
                FROM e a CROSS JOIN cents c) t WHERE rn = 1),
            bl AS (SELECT vec_id, b, embedding[b*8+1 : b*8+8] AS sub
                   FROM e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) s),
            cb AS (SELECT vec_id AS code, b, sub FROM bl WHERE vec_id < 16),
            enc AS (SELECT vec_id, b, code FROM (
                      SELECT v.vec_id, v.b, c.code,
                             row_number() OVER (PARTITION BY v.vec_id, v.b ORDER BY
                               list_sum(list_transform(generate_series(1, 8),
                                 i -> (CAST(v.sub[i] AS DOUBLE) - CAST(c.sub[i] AS DOUBLE))
                                    * (CAST(v.sub[i] AS DOUBLE) - CAST(c.sub[i] AS DOUBLE)))) ASC,
                               c.code ASC) AS rn
                      FROM bl v JOIN cb c USING (b)) t WHERE rn = 1),
            encc AS (SELECT en.vec_id, en.b, en.code, a.cell
                     FROM enc en JOIN assigned a ON a.vec_id = en.vec_id),
            lut AS (SELECT q.vec_id AS q_id, aq.cell, q.b, c.code,
                           list_sum(list_transform(generate_series(1, 8),
                             i -> (CAST(q.sub[i] AS DOUBLE) - CAST(c.sub[i] AS DOUBLE))
                                * (CAST(q.sub[i] AS DOUBLE) - CAST(c.sub[i] AS DOUBLE)))) AS d
                    FROM bl q JOIN cb c USING (b)
                         JOIN assigned aq ON aq.vec_id = q.vec_id
                    WHERE q.vec_id < 10),
            pair AS (SELECT l.q_id, en.vec_id,
                            list_sum(list_transform(list_sort(list(struct_pack(b := en.b, d := l.d))), x -> x.d)) AS adist
                     FROM encc en JOIN lut l
                       ON en.cell = l.cell AND en.b = l.b AND en.code = l.code
                     GROUP BY l.q_id, en.vec_id)
            SELECT q_id, rank, nbr_id FROM (
              SELECT q_id, vec_id AS nbr_id,
                     row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rank
              FROM pair WHERE q_id <> vec_id) t
            WHERE rank <= 3 ORDER BY q_id, rank"""))

  // EMBEDDING-space benchmark decontamination (ops.Decontaminate
  // .semanticFlags): the semantic complement of text_decontam — flag corpus
  // vectors whose cosine to ANY benchmark vector reaches τ, catching the
  // paraphrased/translated eval leakage that n-gram overlap misses. Every
  // 97th vector stands in for the eval suite (same convention as
  // text_decontam's benchmark side); benchmark vectors flag themselves at
  // cosine 1.0 — exactly the leak the op exists to catch. τ = 0.45 sits in
  // the synthetic corpus's similarity range so non-trivial hits exist. The
  // benchmark side broadcasts (bounded by the eval-suite premise); the
  // corpus never shuffles before the per-id count.
  private val decontamSemantic = Q(
    (s, d) => {
      val e = embeddings(s, d)
      graft.ops.Decontaminate.semanticFlags(
          e, "vec_id", "embedding",
          e.filter(pmod(col("vec_id"), lit(97L)) === 0), "embedding",
          tau = graft.api.Dedup.cosineTau)
        .orderBy("id")
    },
    Some(s"""WITH b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0),
            hits AS (SELECT a.vec_id AS id, count(*) AS n_hits
                     FROM embeddings a JOIN b ON ${sqlCos("a", "b")} >= 0.45
                     GROUP BY a.vec_id)
            SELECT e.vec_id AS id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   coalesce(h.n_hits, 0) >= 1 AS contaminated
            FROM embeddings e LEFT JOIN hits h ON h.id = e.vec_id
            ORDER BY id"""))

  // Scalar (int8) vector quantization — the storage half of a web-scale
  // vector store when PQ is overkill: per-DIMENSION global [min, max]
  // (a 64-row agg, broadcast back), each component linearly mapped to an
  // 8-bit code, and the per-vector reconstruction error accounted. 4×
  // smaller than float32 at one code per dimension; the codes join is
  // broadcast (model = dims × 2 doubles), the corpus makes ONE exploded
  // pass — no shuffle beyond the per-vector re-agg. All arithmetic is
  // double with the identical op order on both engines (the repo's
  // bit-exact-twin convention), and the degenerate flat-dimension case
  // (max = min) is pinned to code 0 in both. Output is compact: the code
  // checksum + max absolute reconstruction error per vector.
  private val vecQuantizeInt8 = Q(
    (s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
        .withColumn("x", col("xf").cast("double"))
      val mm = e.groupBy("pos").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      e.join(broadcast(mm), "pos")
        .withColumn("code",
          when(col("mx") === col("mn"), lit(0L))
            .otherwise(least(lit(255L), greatest(lit(0L),
              floor((col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))
                + lit(0.5))))))
        .withColumn("recon",
          col("mn") + col("code").cast("double") * (col("mx") - col("mn")) / lit(255.0))
        .withColumn("err", abs(col("x") - col("recon")))
        .groupBy("vec_id")
        .agg(sum(col("code")).as("code_sum"), max(col("err")).as("max_err"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, u.i AS pos, CAST(embedding[u.i] AS DOUBLE) AS x
                 FROM embeddings CROSS JOIN
                   (SELECT unnest(generate_series(1, 64)) AS i) u),
            mm AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY pos),
            c AS (SELECT vec_id, x, mn, mx,
                    CASE WHEN mx = mn THEN 0
                         ELSE least(255, greatest(0,
                           CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT)))
                    END AS code
                  FROM e JOIN mm USING (pos)),
            r AS (SELECT vec_id, code,
                    abs(x - (mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0)) AS err
                  FROM c)
            SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
                   max(err) AS max_err
            FROM r GROUP BY vec_id ORDER BY vec_id"""))

  val all: List[(String, Q)] = List(
    "sim_topk" -> simTopk,
    "sim_ann" -> simAnn,
    "sim_ivf" -> simIvf,
    "sim_ivf_trained" -> simIvfTrained,
    "sim_pq" -> simPq,
    "sim_ivfpq" -> simIvfpq,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_lsh_cosine" -> dedupLshCosine,
    "dedup_lsh_sketched" -> dedupLshSketched,
    "dedup_embedding_cluster" -> dedupEmbeddingCluster,
    "dedup_semantic_cells" -> dedupSemanticCells,
    "lsh_bands_wide" -> lshBandsWide,
    "dedup_lsh_cosine_wide" -> dedupLshCosineWide,
    "dedup_lsh_cosine_adaptive" -> dedupLshCosineAdaptive,
    "dedup_lsh_sketched_adaptive" -> dedupLshSketchedAdaptive,
    "dedup_embedding_cluster_wide" -> dedupEmbeddingClusterWide,
    "vec_quantize_int8" -> vecQuantizeInt8,
    "decontam_semantic" -> decontamSemantic)
}
