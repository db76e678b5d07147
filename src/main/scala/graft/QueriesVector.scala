package graft

import org.apache.spark.sql.functions._

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
  * bucket. `dedup_embedding` (cosine near-dup) follows the same pattern.
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

  // Brute-force cosine top-k for a small query set: broadcast the queries,
  // stream the corpus, window-rank per query. Sim values are kept out of the
  // output (rank + ids only) so last-ulp FP noise cannot break the hash.
  private val simTopk = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = embeddings(s, d).select("vec_id", "embedding")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("nbr_id").asc)
      broadcast(q)
        .join(e, col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          cosine(col("q_emb"), col("embedding")).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("q_id", "rank", "nbr_id")
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
        .select(col("vec_id"), col("embedding"), signBucket(col("embedding"), 8).as("bucket"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
      q.join(e, Seq("bucket"))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          cosine(col("q_emb"), col("embedding")).as("sim"))
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

  // Embedding-cosine near-dup pairs (threshold far from any FP boundary).
  private val dedupEmbedding = Q(
    (s, d) => {
      val e = embeddings(s, d).select("vec_id", "embedding")
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("emb1"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("emb2"))
      a.join(broadcast(b), col("id1") < col("id2"))
        .filter(cosine(col("emb1"), col("emb2")) >= 0.95)
        .select("id1", "id2")
        .orderBy("id1", "id2")
    },
    Some(s"""SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ${sqlCos("a", "b")} >= 0.95
            ORDER BY id1, id2"""))

  val all: List[(String, Q)] = List(
    "sim_topk" -> simTopk,
    "sim_ann" -> simAnn,
    "dedup_embedding" -> dedupEmbedding)
}
