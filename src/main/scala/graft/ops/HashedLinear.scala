package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Distributed training for the fastText-shaped hashed linear quality
  * classifier (Joulin et al. 2016, arXiv:1607.01759) — the TRAINED
  * counterpart of `TextFns.hashedModelScore`'s fixed-weight gate: logistic
  * regression over `dim` hashed token-feature buckets by full-batch
  * gradient descent, where each epoch reduces to the `dim`-sized gradient —
  * the only thing that ever reaches the driver (the model is ~4 KB; the
  * corpus never moves). Real web pipelines train exactly this shape on
  * "wiki-like vs crawl" labels and run it as the model quality gate.
  *
  * Determinism: every distributed sum is an order-independent EXACT DECIMAL
  * sum of per-row double products (scale 18 — the per-row product is one
  * correctly-rounded double op, the decimal cast rounds at 1e-18, and
  * decimal addition commutes), the same convention that makes KMeans'
  * means bit-stable. `fit` is therefore bit-reproducible on any
  * partitioning/cluster layout (spec-pinned).
  *
  * Scale posture (100 TB): the feature frame is one explode + one
  * (doc, bucket) hash agg — linear, no hot keys — persisted once; each
  * epoch joins a `dim`-row weight broadcast, computes per-doc margins with
  * one keyed agg, joins residuals back by doc id, and reduces to `dim`
  * gradient rows with map-side partial aggregation. Epochs are O(1) jobs;
  * the driver holds only the model.
  */
object HashedLinear {

  /** Hashed feature buckets — matches `TextFns.hashedModelScore` so trained
    * weights drop into the same mean-pooled scoring shape. */
  val featureBuckets: Int = 4096

  /** Order-independent exact sum of a double column (scale-18 decimal
    * detour), emitted as double. */
  private def mlSum(c: Column): Column =
    sum(c.cast(DecimalType(38, 18))).cast(DoubleType)

  /** Per-(doc, bucket) mean-indicator features: (__id, __y, __b, __x). */
  private def features(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int): DataFrame =
    docs
      .select(col(idCol).as("__id"), col(labelCol).cast("double").as("__y"),
        explode(graft.functions.TextFns.tokens(col(textCol))).as("__t"))
      .select(col("__id"), col("__y"),
        pmod(graft.expressions.PolyHash(col("__t")), lit(dim.toLong)).as("__b"))
      .groupBy("__id", "__y", "__b").agg(count(lit(1)).as("__c"))
      .withColumn("__ntok", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__id")))
      .select(col("__id"), col("__y"), col("__b"),
        (col("__c").cast("double") / col("__ntok").cast("double")).as("__x"))

  /** (weights(dim), bias) after `epochs` full-batch GD steps on logistic
    * loss. `labelCol` must be numeric 0/1. */
  def fit(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = featureBuckets, epochs: Int = 8, lr: Double = 4.0)
      : (Array[Double], Double) = {
    require(dim > 0 && epochs > 0 && lr > 0, s"bad hyperparams: $dim/$epochs/$lr")
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = features(docs, idCol, textCol, labelCol, dim).persist()
    try {
      val n = feats.select("__id").distinct().count().toDouble
      require(n > 0, "cannot fit on an empty frame")
      val w = Array.fill(dim)(0.0)
      var bias = 0.0
      for (_ <- 1 to epochs) {
        val wDf = broadcast(w.zipWithIndex
          .map { case (wt, b) => (b.toLong, wt) }.toSeq.toDF("__b", "__w"))
        // margin per doc (exact decimal sum of per-row double products),
        // then residual r = sigmoid(z + bias) − y; exp() here is Spark's
        // codegen expression over java.lang.Math.exp — one runtime, one
        // rounding, so r is identical wherever the row is computed
        val resid = feats.join(wDf, Seq("__b"))
          .groupBy(col("__id"), col("__y"))
          .agg(mlSum(col("__x") * col("__w")).as("__z"))
          .select(col("__id"), col("__y"),
            (lit(1.0) / (lit(1.0) + exp(-(col("__z") + lit(bias)))) - col("__y")).as("__r"))
        // gradient: dim rows + the bias scalar — the ONLY driver transfer
        val grad = feats.join(resid.select("__id", "__r"), Seq("__id"))
          .groupBy("__b").agg(mlSum(col("__r") * col("__x")).as("__g"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val gradB = resid.agg(mlSum(col("__r"))).collect()(0).getDouble(0)
        for (b <- 0 until dim) w(b) -= lr * grad.getOrElse(b.toLong, 0.0) / n
        bias -= lr * gradB / n
      }
      (w, bias)
    } finally feats.unpersist()
  }

  /** Score (mean-pooled dot product + bias) and keep-decision for every
    * doc under a trained model — the gate [[fit]]'s output plugs into. */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dim = weights.length
    val wDf = broadcast(weights.zipWithIndex
      .map { case (wt, b) => (b.toLong, wt) }.toSeq.toDF("__b", "__w"))
    docs
      .select(col(idCol), explode(graft.functions.TextFns.tokens(col(textCol))).as("__t"))
      .select(col(idCol),
        pmod(graft.expressions.PolyHash(col("__t")), lit(dim.toLong)).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .join(wDf, Seq("__b"))
      .groupBy(col(idCol))
      .agg((mlSum(col("__c").cast("double") * col("__w")) /
            sum(col("__c")).cast("double") + lit(bias)).as("score"))
      .withColumn("keep", col("score") >= 0.0)
  }
}
