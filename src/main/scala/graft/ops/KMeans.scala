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
        // ONE Spark JOB per iteration (r17, after r16's one-shuffle form):
        // the (cell, dim) decimal means ride a NARROW plan — codegen'd
        // assignment, per-partition exact-decimal partials in a
        // mapPartitions, driver-side combine — so Lloyd's barrier is a
        // single job round-trip with NO exchange at all (the former
        // groupBy(cell, pos) paid a shuffle materialization + result job
        // per iteration under AQE). The driver holds P·k·dim partials —
        // model-sized × partition count, the same bounded-state contract
        // as before; decimal addition is order-independent, so the result
        // is bit-identical on any partitioning (cellMeansSpec pins it
        // against the groupBy reference, poison values included).
        val byCell = cellMeans(assignTo(base, "v", cents))
        // An uncastable float (|x| ≥ 10^28) or a sum past DECIMAL(38,10)
        // capacity pins that (cell, dim) mean to None — keep the previous
        // centroid for it, as the try_cast/try_sum SQL form did. Cells
        // that lose all members keep their previous centroid wholesale.
        val next = cents.indices.map { j =>
          val arr = cents(j).clone()
          var touched = false
          byCell.foreach { case ((cell, pos), m) =>
            if (cell == j && pos >= 0 && pos < arr.length) {
              touched = true
              m.foreach(v => arr(pos) = v)
            }
          }
          if (touched) arr else cents(j)
        }.toArray
        converged = next.zip(cents).forall { case (a, b) => a.sameElements(b) }
        cents = next
        it += 1
      }
      Model(cents)
    } finally { base.unpersist(); () }
  }

  /** Per-(cell, dim) decimal means of an assignment frame (`cell` int,
    * `v` array<float>) in ONE narrow Spark job — no exchange. Exactness
    * contract, replicated from the former try_cast/try_sum SQL aggregate:
    *
    *  - every element is cast float → DECIMAL(38,10) BY SPARK (the same
    *    try_cast expression, so rounding is bit-identical); the closure
    *    receives plain decimal STRINGS — nothing re-rounds in transit;
    *  - per-partition partials sum exactly (java BigDecimal — unbounded,
    *    order-independent like decimal addition everywhere in this repo);
    *  - an uncastable element (try_cast NULL, |x| ≥ 10^28) poisons its
    *    (cell, dim) to None, as bool_or(isnull) did;
    *  - a combined sum past DECIMAL(38,10) capacity is None, as
    *    try_sum's null-on-overflow was;
    *  - mean = sum / count rounded HALF_UP at scale 10 then cast double —
    *    exactly Spark's Divide(DECIMAL(38,10), count) → cast("double").
    *
    * KMeansSpec pins equality against the groupBy reference, poison and
    * empty-cell cases included. */
  private[ops] def cellMeans(assigned: DataFrame): Map[(Int, Int), Option[Double]] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val partials = assigned
      .select(col("cell").cast("int").as("cell"),
        expr("transform(v, x -> cast(try_cast(x AS DECIMAL(38,10)) AS STRING))").as("vd"))
      .as[(Int, Seq[String])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[(Int, Int), (java.math.BigDecimal, Long, Boolean)]
        it.foreach { case (cell, vd) =>
          if (vd != null) {
            var p = 0
            val n = vd.size
            while (p < n) {
              val key = (cell, p)
              val (s, c, bad) = acc.getOrElse(key,
                (java.math.BigDecimal.ZERO, 0L, false))
              val x = vd(p)
              acc(key) =
                if (x == null) (s, c + 1L, true)
                else (s.add(new java.math.BigDecimal(x)), c + 1L, bad)
              p += 1
            }
          }
        }
        acc.iterator.map { case ((cell, pos), (s, c, bad)) =>
          (cell, pos, s.toPlainString, c, bad)
        }
      }
      .collect()
    val merged = scala.collection.mutable.HashMap
      .empty[(Int, Int), (java.math.BigDecimal, Long, Boolean)]
    partials.foreach { case (cell, pos, s, c, bad) =>
      val key = (cell, pos)
      val (s0, c0, b0) = merged.getOrElse(key, (java.math.BigDecimal.ZERO, 0L, false))
      merged(key) = (s0.add(new java.math.BigDecimal(s)), c0 + c, b0 || bad)
    }
    // DECIMAL(38,10) capacity: |unscaled| < 10^38, i.e. |value| < 10^28
    val cap = new java.math.BigDecimal(java.math.BigInteger.TEN.pow(28))
    merged.iterator.map { case (key, (s, c, bad)) =>
      key -> (if (bad || s.abs.compareTo(cap) >= 0) None
              else Some(s.divide(new java.math.BigDecimal(c), 10,
                java.math.RoundingMode.HALF_UP).doubleValue))
    }.toMap
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
