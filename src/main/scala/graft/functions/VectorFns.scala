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

  // NOTE: hot paths use graft.expressions.VecDot instead of the HOF forms
  // above — interpreted lambdas cost ~20ns/element, and a fully unrolled
  // column-arithmetic variant (tried in between) exceeded the JIT's
  // huge-method limit. The HOF forms remain the arbitrary-dim reference
  // implementation, equivalence-tested against VecDot in ExpressionsSpec.

  /** Random-hyperplane-style LSH bucket, degenerated to deterministic axis
    * signs of the first `dims` components: a coarse but oracle-expressible
    * bucketing that prunes the candidate space for ANN search. */
  def signBucket(a: Column, dims: Int): Column =
    concat((0 until dims).map(i =>
      when(element_at(a, i + 1) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
