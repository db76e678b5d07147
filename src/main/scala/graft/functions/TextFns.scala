package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup operators.
  *
  * Everything here is a composition of codegen'd built-in functions (no UDFs),
  * so it stays inside whole-stage codegen and runs per-partition with no
  * shuffle. All hashing is deterministic integer arithmetic that the DuckDB
  * oracle mirrors exactly (see Queries.scala for the SQL twins).
  *
  * Reference behaviors generalized here: regex-heavy line parsing
  * (/root/reference/web_scraper.py:387-490), list-literal codec
  * (/root/reference/dffoo_analyzer/models/stg/stg_schema.yml:33-35).
  */
object TextFns {
  final val P: Long = 1000000007L

  /** Whitespace tokens. `split` on \s+ after trim; empty text → single "" token,
    * mirrored in SQL. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Occurrences of `toks` elements present in the FROZEN `vocab` — a pure
    * per-row expression (no join, no shuffle, no state): the streaming-legal
    * scoring half of text_oov_rate once the vocabulary is frozen
    * (StreamingPipelineSpec proves batch parity). Linear scan of the vocab
    * literal per token — right for vocabs up to a few thousand entries; the
    * batch catalog entry keeps the broadcast-join shape, which is what a
    * very large vocab needs. */
  def inVocabCount(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(vocab.toArray), t)))

  /** Deterministic polynomial string hash: fold (acc*31 + ascii(char)) mod P.
    * DuckDB twin: list_reduce(list_prepend(CAST(0 AS BIGINT),
    *   list_transform(string_split(s,''), c -> ascii(c))), (a,c) -> (a*31+c) % P). */
  def charHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (acc, ch) => (acc * 31L + ascii(ch)) % P)

  /** Per-token polynomial hashes (one fast native PolyHash call per token —
    * the lambda itself is interpreted but its body is a single static call). */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => graft.expressions.PolyHash(t))

  /** 3-gram shingle hashes derived arithmetically from token hashes:
    * ((h1*31 + h2) mod P * 31 + h3) mod P. Equivalent role to hashing the
    * joined shingle string, but with zero string construction — the dedup
    * hot paths run on longs end to end. DuckDB twin uses the same formula
    * over its own token-hash lists, so values match exactly (hash collisions,
    * if any, are identical on both sides). */
  def shingleHashes3(th: Column): Column = {
    def sh(i: Column) =
      ((element_at(th, i) * 31L + element_at(th, i + 1)) % P * 31L + element_at(th, i + 2)) % P
    when(size(th) < 3, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), size(th) - 2), i => sh(i)))
  }

  /** Normalized text for near-dup fingerprinting: lowercase, collapse whitespace, trim. */
  def normalized(text: Column): Column = trim(regexp_replace(lower(text), "\\s+", " "))

  /** BPE-ish token count: letter runs, digit runs, single punctuation marks. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Hashed-feature linear model score — the fastText-shaped classifier
    * (Joulin et al. 2016, arXiv:1607.01759) that web-scale pipelines use as
    * the model-based quality filter: every token hashes into one of `dim`
    * feature buckets, each bucket carries a weight, and the doc's score is
    * the mean bucket weight over its tokens. The weights here are a
    * deterministic pseudo-random table derived arithmetically from the
    * bucket index (w(b) = (((b·2654435761 + 7) mod P) mod 2001 − 1000)/1000
    * ∈ [−1, 1]) so both engines can materialize the SAME model without
    * shipping a weights file; swapping in trained weights is a
    * one-column-lookup change, the plumbing (hash → bucket → weight → mean)
    * is the production shape. Left-fold over the token list in document
    * order on both engines → bit-identical doubles. Per-row expression, no
    * shuffle, no UDF. */
  def hashedModelScore(toks: Column, dim: Int = 4096): Column = {
    def weight(h: Column): Column =
      ((pmod(h, lit(dim.toLong)) * 2654435761L + 7L) % P % 2001L - 1000L)
        .cast("double") / 1000.0
    aggregate(tokenHashes(toks), lit(0.0), (acc, h) => acc + weight(h)) /
      size(toks).cast("double")
  }

  /** English-ish stopwords used for quality scoring and language ID. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))
}
