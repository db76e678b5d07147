package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * All math is done in double precision with a fixed left-to-right summation
  * order (array order), so the DuckDB oracle — written with the same
  * elementwise expansion — computes bit-identical values. Pure codegen'd
  * higher-order functions; no UDFs, no shuffles.
  */
object VectorFns {
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), _ + _)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Fixed-dimension variants: the dot/norm sums unrolled into plain column
    * arithmetic. Unlike the higher-order-function forms above (interpreted,
    * one closure call per element), these stay inside whole-stage codegen —
    * measured ~10× faster on the all-pairs similarity queries. Same
    * left-to-right summation order, so oracle values are unchanged. */
  def dotN(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  def normN(a: Column, dim: Int): Column =
    (1 to dim).map { i => val x = element_at(a, i).cast("double"); x * x }.reduce(_ + _)

  def cosineN(a: Column, b: Column, dim: Int): Column =
    dotN(a, b, dim) / (sqrt(normN(a, dim)) * sqrt(normN(b, dim)))

  /** Random-hyperplane-style LSH bucket, degenerated to deterministic axis
    * signs of the first `dims` components: a coarse but oracle-expressible
    * bucketing that prunes the candidate space for ANN search. */
  def signBucket(a: Column, dims: Int): Column =
    concat((0 until dims).map(i =>
      when(element_at(a, i + 1) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
