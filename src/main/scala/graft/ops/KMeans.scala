package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.VecDot

/** Deterministic distributed k-means (Lloyd's algorithm) over an
  * `array<float>` embedding column — the centroid trainer for a REAL IVF
  * index (`sim_ivf`'s catalog entry seeds its cells from fixed ids so the
  * DuckDB oracle can mirror them; this is the production path that learns
  * them from the data).
  *
  * Every step is deterministic on any cluster size / partitioning / re-run:
  *  - INIT: the k rows with the smallest (hash, id) — the same exact-integer
  *    reservoir shape as `Sampling.kSampleByHash`, a distributed top-k,
  *    never a global sort;
  *  - ASSIGN: per-row argmin over the broadcast centroids with the tie
  *    broken by cell index — a pure map-side expression (k fused VecDot
  *    terms inside whole-stage codegen, no UDF);
  *  - UPDATE: per-cell per-dimension MEANS via exact DECIMAL(38,10) sums —
  *    float addition is order-dependent, decimal addition is not, so
  *    centroids are bit-identical however Spark schedules the partial
  *    aggregates.
  *
  * Only the model (k × dim doubles) ever reaches the driver — the same
  * bounded-state contract as the LSH hyperplanes; the data never collects.
  * Scale: each iteration is one scan + one (cell, dim)-keyed partial
  * aggregate of k·dim rows; at 10⁹ vectors the shuffle moves k·dim·P
  * partial sums, not data.
  */
object KMeans {

  /** Trained centroids, indexed by cell id 0..k-1. */
  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Train on `df(idCol: numeric non-negative, vecCol: array<float>)`.
    * Stops at `maxIters` or when an iteration leaves every centroid
    * bit-identical (exact, thanks to the decimal means). Cells that lose
    * all members keep their previous centroid. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIters: Int = 8): Model = {
    require(k > 0, s"k must be positive, got $k")
    require(maxIters > 0, s"maxIters must be positive, got $maxIters")
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .persist()
    try {
      // hash-seeded init: k smallest (bucket, id) — distributed top-k
      val init = base
        .withColumn("b", Sampling.bucketOf(col("id"), salt = 11L, buckets = 1 << 30))
        .orderBy("b", "id").limit(k)
        .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
      require(init.nonEmpty, "cannot fit k-means on an empty frame")
      var cents = init
      var it = 0
      var converged = false
      while (it < maxIters && !converged) {
        // ONE shuffle per iteration (r16): collect the k·dim flat rows and
        // group them on the driver — the former second groupBy("cell")
        // that packed them into per-cell structs was a whole extra
        // exchange + stage per iteration just to save a driver-side
        // groupBy over a model-sized (k·dim, never data-sized) result.
        // Measured: sim_ivf_trained 30 → 21 jobs, 3.2 → 2.4 s at sf0.1.
        val byCell = assignTo(base, "v", cents)
          .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cell", "pos")
          // try_cast/try_sum, not cast/sum: under ANSI (Spark 4 default) a
          // float beyond DECIMAL(38,10) capacity (|x| ≥ 10^28) or an
          // overflowing accumulation would THROW mid-job; the try_ forms
          // yield NULL instead, and bool_or pins the whole (cell, dim) mean
          // to NULL whenever any member was uncastable (a partial mean that
          // silently dropped members would be worse than no update)
          .agg(when(expr("bool_or(try_cast(x AS DECIMAL(38,10)) IS NULL)"),
              lit(null).cast("double"))
            .otherwise((expr("try_sum(try_cast(x AS DECIMAL(38,10)))") /
              count(lit(1))).cast("double")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
        // A decimal sum past DECIMAL(38,10) capacity (|Σx| ≥ 10^28 — only
        // reachable on adversarial float magnitudes) comes back NULL from
        // Spark; keep the previous centroid for that (cell, dim) instead of
        // NPEing inside fit. Cells that lose all members keep their previous
        // centroid wholesale, as before.
        val next = cents.indices.map { j =>
          byCell.get(j) match {
            case None => cents(j)
            case Some(dims) =>
              val arr = cents(j).clone()
              dims.foreach { row =>
                val pos = row.getInt(1)
                if (!row.isNullAt(2) && pos >= 0 && pos < arr.length)
                  arr(pos) = row.getDouble(2)
              }
              arr
          }
        }.toArray
        converged = next.zip(cents).forall { case (a, b) => a.sameElements(b) }
        cents = next
        it += 1
      }
      Model(cents)
    } finally { base.unpersist(); () }
  }

  /** Assign every row to its nearest centroid (squared L2, ties to the
    * lowest cell): adds `cell` (int) and `dist2` (double) columns. Pure
    * map-side — the centroids ride along as literals inside codegen. */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    assignTo(df, vecCol, model.centroids)

  /** One row per (input row, cell): squared L2 to EVERY centroid — the
    * probe-selection input for multi-cell IVF search. A map-side fan-out
    * of k rows per input row (k is model-sized, not data-sized). Adds
    * `cell` and `dist2` columns. */
  def assignAll(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val v = col(vecCol)
    val entries = model.centroids.zipWithIndex.map { case (c, j) =>
      val cf = c.map(_.toFloat)
      val cNorm = c.map(x => x * x).sum
      struct(lit(j).as("cell"),
        greatest(lit(cNorm) - lit(2.0) * VecDot(v, typedLit(cf.toSeq)) +
          VecDot(v, v), lit(0.0)).as("dist2"))
    }
    df.withColumn("__c", explode(array(entries.toIndexedSeq: _*)))
      .withColumn("cell", col("__c").getField("cell"))
      .withColumn("dist2", col("__c").getField("dist2"))
      .drop("__c")
  }

  // NOTE (r16 probe, kept as a record): rewriting the per-cell struct
  // array as transform(sequence(0,k-1), j -> ...) with the model as array
  // literals makes the generated source iteration-stable (array literals
  // are codegen reference objects; the per-cell scalar lit(cNorm) is
  // inlined and forces a fresh Janino compile per fit iteration) — but
  // higher-order functions do NOT participate in whole-stage codegen, so
  // every VecDot would run interpreted per element: a per-row regression
  // at data scale to save driver-side compiles that measured ~nothing
  // (fit wall time unchanged at sf0.1 — the cost there is the ~2 jobs per
  // iteration, inherent to Lloyd's). The codegen'd unrolled form stays.
  private def assignTo(df: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val v = col(vecCol)
    // ||x-c||² = x·x − 2·x·c + c·c; x·x is shared across cells, and adding
    // it to every term preserves the argmin, so drop it: score = c·c − 2x·c
    val scored = cents.zipWithIndex.map { case (c, j) =>
      val cf = c.map(_.toFloat)
      val cNorm = c.map(x => x * x).sum
      struct((lit(cNorm) - lit(2.0) * VecDot(v, typedLit(cf.toSeq))).as("s"),
        lit(j).as("cell"))
    }
    val best = array_min(array(scored.toIndexedSeq: _*))
    df.withColumn("cell", best.getField("cell"))
      .withColumn("dist2",
        greatest(best.getField("s") + VecDot(v, v), lit(0.0)))
  }
}
