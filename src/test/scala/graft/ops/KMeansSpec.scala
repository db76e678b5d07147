package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {

  /** Three well-separated blobs in 4-D: 20 points each around distinct
    * corners, deterministic pseudo-noise from the point index. */
  private def blobs = {
    import spark.implicits._
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    (0 until 60).map { i =>
      val c = centers(i % 3)
      val noise = (d: Int) => ((i * 31 + d * 7) % 11 - 5) * 0.05f
      (i.toLong, c.zipWithIndex.map { case (x, d) => x + noise(d) })
    }.toDF("id", "emb")
  }

  test("k-means recovers well-separated blobs, one cell per blob") {
    val model = KMeans.fit(blobs, "id", "emb", k = 3)
    assert(model.k == 3)
    val assigned = KMeans.assign(blobs, "emb", model)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    // every point of a blob (id mod 3) lands in the same cell, and the
    // three blobs land in three distinct cells
    val byBlob = assigned.groupBy(_._1 % 3).map { case (b, xs) =>
      b -> xs.map(_._2).toSet
    }
    assert(byBlob.values.forall(_.size == 1), s"split blob: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, s"merged blobs: $byBlob")
  }

  test("cellMeans equals the groupBy decimal-mean reference, poison included") {
    import spark.implicits._
    // 4 cells, 3 dims; row 13 carries an uncastable first dim (1e30 is past
    // DECIMAL(38,10) capacity) so exactly one (cell, dim) must poison to None
    val rows = (0 until 57).map { i =>
      val v =
        if (i == 13) Seq(1.0e30f, 2.5f, -3.25f)
        else Seq(i * 0.1f, -i * 0.25f + 0.3f, (i % 7) * 1.5f)
      (i % 4, v)
    }.toDF("cell", "v").repartition(5)
    val got = KMeans.cellMeans(rows)
    val ref = rows
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(when(expr("bool_or(try_cast(x AS DECIMAL(38,10)) IS NULL)"),
          lit(null).cast("double"))
        .otherwise((expr("try_sum(try_cast(x AS DECIMAL(38,10)))") /
          count(lit(1))).cast("double")).as("m"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got.size == ref.size)
    assert(got((1, 0)).isEmpty, "the 1e30 dim must poison to None")
    ref.foreach { case (k, v) =>
      assert(got(k) == v, s"cellMeans diverged from the groupBy reference at $k")
    }
  }

  test("fit is bit-deterministic across input partitionings") {
    val a = KMeans.fit(blobs.repartition(7), "id", "emb", k = 3)
    val b = KMeans.fit(blobs.repartition(2).sortWithinPartitions(desc("id")),
      "id", "emb", k = 3)
    assert(a.centroids.length == b.centroids.length)
    a.centroids.zip(b.centroids).foreach { case (x, y) =>
      assert(x.sameElements(y), "centroids diverged across partitionings")
    }
  }

  test("assignment is map-side only: no exchange in the plan") {
    val model = KMeans.fit(blobs, "id", "emb", k = 3)
    val plan = KMeans.assign(blobs.repartition(4), "emb", model)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the input repartition itself
    assert(plan.split("Exchange").length <= 2, s"unexpected exchange:\n$plan")
  }

  test("trained IVF at full probe equals brute force; partial probe recalls most") {
    import graft.api.Similarity
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val brute = asMap(Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 3))
    // probing every cell searches the whole corpus: must equal brute force
    // exactly (same similarity, same tiebreaks)
    val full = asMap(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 3, nCells = 8, nProbe = 8, maxIters = 4))
    assert(full == brute, "full-probe IVF must be exhaustive search")
    // a 3-of-8-cell probe is approximate but must recall most of the truth
    // (set recall per query — a missed neighbor shifts ranks, so position-
    // exact comparison would understate it)
    val part = asMap(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 3, nCells = 8, nProbe = 3, maxIters = 4))
    def sets(m: Map[(Long, Int), Long]) =
      m.groupBy(_._1._1).view.mapValues(_.values.toSet).toMap
    val bs = sets(brute)
    val ps = sets(part)
    val hits = bs.map { case (q, s) => (s intersect ps.getOrElse(q, Set.empty)).size }.sum
    val recall = hits.toDouble / bs.values.map(_.size).sum
    assert(recall >= 0.5, s"partial-probe recall $recall collapsed")
  }

  test("extreme-magnitude floats degrade gracefully instead of NPEing in fit") {
    import spark.implicits._
    // Float.MaxValue ≈ 3.4·10³⁸ — ONE such value already exceeds the
    // DECIMAL(38,10) accumulator (integer capacity 10²⁸), so Spark returns
    // a NULL mean for that (cell, dim); fit must keep the previous centroid
    // coordinate there, not NPE on the collected row. The second dimension
    // stays sane and must still train normally.
    val hostile = Seq(
      (0L, Array(Float.MaxValue, 1f)), (1L, Array(Float.MaxValue, 2f)),
      (2L, Array(-1f, 10f)), (3L, Array(-2f, 11f))).toDF("id", "emb")
    val model = KMeans.fit(hostile, "id", "emb", k = 2, maxIters = 3)
    assert(model.k == 2 && model.centroids.forall(_.length == 2))
    assert(model.centroids.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
    // every row still lands in a cell
    assert(KMeans.assign(hostile, "emb", model).select("cell")
      .collect().map(_.getInt(0)).forall(c => c >= 0 && c < 2))
  }

  test("an empty cell keeps its previous centroid instead of crashing") {
    import spark.implicits._
    // two identical points, k = 3: at most one cell can own members
    val tiny = Seq((0L, Array(1f, 1f)), (1L, Array(1f, 1f))).toDF("id", "emb")
    val model = KMeans.fit(tiny, "id", "emb", k = 3, maxIters = 4)
    assert(model.k >= 1 && model.centroids.forall(_.length == 2))
    val cells = KMeans.assign(tiny, "emb", model)
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(cells.size == 1)
  }
}
