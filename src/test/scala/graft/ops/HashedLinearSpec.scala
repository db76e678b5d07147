package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trained hashed-linear quality gate: separable vocabularies are learned
  * to training accuracy 1.0, training is bit-deterministic under any input
  * partitioning, and the trained model beats the fixed arithmetic weights
  * it replaces on labeled data. */
class HashedLinearSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  // two disjoint vocabularies: "good" docs speak g-words, "bad" docs b-words
  private def labeled(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val good = i % 2 == 0
      val words =
        if (good) Seq("clear", "prose", "reads", "well", s"topic${i % 7}")
        else Seq("zxq", "qqzz", "spamspam", "garble", s"junk${i % 7}")
      (i.toLong, words.mkString(" "), if (good) 1.0 else 0.0)
    }.toDF("doc_id", "text", "label")
  }

  test("separable vocabularies train to accuracy 1.0 and score correctly") {
    val docs = labeled(60)
    val (w, b) = HashedLinear.fit(docs, "doc_id", "text", "label", epochs = 12)
    val scored = HashedLinear.scoreWith(docs, "doc_id", "text", w, b)
      .join(docs.select("doc_id", "label"), "doc_id")
    val wrong = scored.filter(
      (col("keep") && col("label") === 0.0) || (!col("keep") && col("label") === 1.0))
    assert(wrong.count() == 0, "trained gate misclassifies the separable corpus")
  }

  test("training is bit-deterministic under repartitioning") {
    val docs = labeled(40)
    val (w1, b1) = HashedLinear.fit(docs, "doc_id", "text", "label", epochs = 4)
    val (w2, b2) = HashedLinear.fit(docs.repartition(13), "doc_id", "text", "label",
      epochs = 4)
    assert(b1 == b2 && w1.sameElements(w2),
      "decimal gradient sums must make training partitioning-independent")
  }

  test("trained model separates what the fixed-weight scorer cannot") {
    import spark.implicits._
    val docs = labeled(60)
    // the fixed arithmetic table knows nothing about these labels
    val fixedAcc = {
      val scored = docs.select(col("doc_id"), col("label"),
        graft.functions.TextFns.hashedModelScore(
          graft.functions.TextFns.tokens(col("text"))).as("score"))
      val right = scored.filter(
        (col("score") >= 0.0 && col("label") === 1.0) ||
        (col("score") < 0.0 && col("label") === 0.0)).count()
      right.toDouble / 60
    }
    val (w, b) = HashedLinear.fit(docs, "doc_id", "text", "label", epochs = 12)
    val trainedAcc = {
      val scored = HashedLinear.scoreWith(docs, "doc_id", "text", w, b)
        .join(docs.select("doc_id", "label"), "doc_id")
      scored.filter(
        (col("keep") && col("label") === 1.0) ||
        (!col("keep") && col("label") === 0.0)).count().toDouble / 60
    }
    assert(trainedAcc == 1.0 && trainedAcc > fixedAcc,
      s"trained $trainedAcc should beat fixed $fixedAcc")
  }
}
