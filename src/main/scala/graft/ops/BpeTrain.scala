package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units", arXiv:1508.07909)
  * — the merge-learning half of the byte-pair-encoding tokenizers LLM
  * pipelines train on their own corpora before any model sees a token.
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus:
  * the corpus collapses to (word, freq) once — one hash shuffle over
  * corpus tokens, after which every training round touches only the
  * distinct-word table (vocabulary-sized: ~10⁵–10⁷ rows no matter how many
  * petabytes produced it — THE property that makes corpus-scale tokenizer
  * training cheap). Each round:
  *   1. count symbol pairs: explode each word's adjacent symbol pairs,
  *      weight by word freq — one agg shuffle over vocab-sized data;
  *   2. pick the max-count pair (ties to the lexicographically smallest —
  *      deterministic on any cluster size); ONE row reaches the driver;
  *   3. merge that pair inside every word — a map-side fold, no shuffle.
  * The learned merge list (k rows) is the tokenizer.
  *
  * Symbols and merges are plain strings ("t h" → "th"), word boundaries
  * are whitespace (the repo's canonical tokens), characters are the seed
  * alphabet. Determinism: counts are exact longs, the argmax tiebreak is
  * total, and the merge fold is per-row — results are bit-identical on any
  * partitioning (spec'd), so a tokenizer trained on the cluster equals one
  * trained anywhere else.
  */
object BpeTrain {

  /** (word, freq) table of a (textCol) corpus — the one corpus-sized
    * shuffle in BPE training. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Seed symbolization: each word as its character array. */
  private def charSymbols(word: Column): Column =
    // split before every char except the first; the (?=.) guard keeps Spark's
    // limit=-1 split from emitting a trailing "" at the end-of-string position
    split(word, "(?!^)(?=.)")

  /** (word, syms, freq) seed vocabulary — [[wordFreqs]] with each word
    * symbolized to characters; the frame every training round folds over. */
  def seedVocab(docs: DataFrame, textCol: String): DataFrame =
    wordFreqs(docs, textCol)
      .select(col("word"), charSymbols(col("word")).as("syms"), col("freq"))

  /** Adjacent (left, right) symbol pairs of a symbol array. */
  private def pairsOf(syms: Column): Column =
    when(size(syms) >= 2,
      zip_with(slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1),
        (l, r) => struct(l.as("left"), r.as("right"))))
      .otherwise(array().cast("array<struct<left:string,right:string>>"))

  /** Weighted pair counts of a (syms, freq) vocabulary frame: one agg
    * shuffle over vocab-sized exploded pairs. Output:
    * (lsym, rsym, pair_count) — BPE round 1's statistics, and the
    * oracle-checkable surface of the training loop. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(explode(pairsOf(col("syms"))).as("p"), col("freq"))
      .groupBy(col("p.left").as("lsym"), col("p.right").as("rsym"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Merge every adjacent (l, r) occurrence inside a symbol array into one
    * symbol l+r — the map-side fold of step 3. Leftmost-first,
    * non-overlapping (after "a a" merges in "a a a", the tail "a" starts a
    * new window — the standard BPE scan order), expressed as one codegen'd
    * `aggregate` fold with a (pending, out) accumulator. */
  private def mergePair(syms: Column, l: String, r: String): Column = {
    val acc0 = struct(lit("").as("pend"), lit(false).as("has"),
      array().cast("array<string>").as("out"))
    val folded = aggregate(syms, acc0,
      (acc, s) =>
        when(!acc.getField("has"), struct(s.as("pend"), lit(true).as("has"), acc.getField("out").as("out")))
          .when(acc.getField("pend") === lit(l) && s === lit(r),
            // consume both: merged symbol becomes the new pending window
            struct(concat(lit(l), lit(r)).as("pend"), lit(true).as("has"), acc.getField("out").as("out")))
          .otherwise(struct(s.as("pend"), lit(true).as("has"),
            concat(acc.getField("out"), array(acc.getField("pend"))).as("out"))),
      acc => when(acc.getField("has"),
          concat(acc.getField("out"), array(acc.getField("pend"))))
        .otherwise(acc.getField("out")))
    folded
  }

  /** Learn `k` merges from a corpus. Returns (merges, vocab): `merges` is
    * the ordered driver-side list of (left, right) — the trained tokenizer,
    * k small structs, the only thing that ever reaches the driver — and
    * `vocab` the final (word, syms, freq) frame. Rounds with no remaining
    * pair stop early. */
  def fit(docs: DataFrame, textCol: String, k: Int): (Seq[(String, String)], DataFrame) = {
    require(k > 0, s"k must be positive, got $k")
    var vocab = seedVocab(docs, textCol)
    // each round re-derives syms by replaying merges map-side (cheap: the
    // vocab table is small); persist only the word/freq base
    vocab.persist()
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    try {
      var done = false
      while (merges.size < k && !done) {
        val top = pairCounts(vocab)
          .orderBy(col("pair_count").desc, col("lsym").asc, col("rsym").asc)
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (l, r) = (top(0).getString(0), top(0).getString(1))
          merges += ((l, r))
          val nv = vocab.select(col("word"),
            mergePair(col("syms"), l, r).as("syms"), col("freq"))
          nv.persist()
          nv.count() // materialize before dropping the parent
          vocab.unpersist()
          vocab = nv
        }
      }
      (merges.toList, vocab)
    } finally () // final vocab stays persisted for the caller; they unpersist
  }

  /** Tokenize a corpus with a learned merge list: replay the merges in
    * order over each word's characters — pure map-side (the tokenizer is a
    * k-entry constant folded into the plan), the ingest-time shape.
    * Output: docs' columns plus `tokensCol` (array of subword strings). */
  def tokenize(docs: DataFrame, textCol: String, merges: Seq[(String, String)],
      tokensCol: String): DataFrame = {
    val applyAll = (w: Column) =>
      merges.foldLeft(charSymbols(w)) { case (syms, (l, r)) => mergePair(syms, l, r) }
    docs.withColumn(tokensCol,
      flatten(transform(graft.functions.TextFns.tokens(col(textCol)), applyAll)))
  }
}
