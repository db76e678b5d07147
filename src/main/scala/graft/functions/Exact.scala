package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic arithmetic helpers.
  *
  * The driver hash-compares Spark results against a DuckDB oracle. Double
  * aggregation is order-dependent (FP addition is not associative), so any
  * `sum(double)` can differ in the last ulp between engines. The fix: cast to
  * DECIMAL(18,4) *before* aggregating (exact integer arithmetic in both
  * engines), aggregate exactly, and cast the final value back to DOUBLE
  * (decimal→double rounding is IEEE round-to-nearest in both engines, hence
  * bit-identical). Oracle-side mirror: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  *
  * This also scales: decimal sums still use partial (map-side) aggregation, so
  * nothing here changes the shuffle shape vs a plain double sum.
  */
object Exact {
  val D: DecimalType = DecimalType(18, 4)

  /** Scale-4 reduction type for sums of decimal PRODUCTS. A decimal(18,4)
    * product is decimal(37,8), and its sum decimal(38,8) — exact, but
    * DuckDB's DECIMAL→DOUBLE cast computes double(unscaled)/10^scale, which
    * double-rounds once the unscaled value exceeds 2^53 (≈9e7 at scale 8),
    * while Spark's BigDecimal cast rounds once. Reducing to scale 4 first
    * keeps the unscaled value below 2^53 for sums up to ~9e11, and is EXACT
    * whenever the factors' decimal places sum to <= 4 (TPC-H-style 2-dp
    * money x 2-dp rates). For genuinely 4-dp x 4-dp factors the reduction
    * rounds at 1e-4 — identically on both engines, so the oracle still
    * matches, but the sum is no longer the exact decimal value. */
  val D38: DecimalType = DecimalType(38, 4)

  def dec(c: Column): Column = c.cast(D)

  /** Exact sum of a double column, emitted as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact sum of a product of two double columns (e.g. extendedprice *
    * (1-discount)), reduced to scale 4 before the double cast — see [[D38]]. */
  def dsumProd(a: Column, b: Column): Column =
    sum(dec(a) * dec(b)).cast(D38).cast(DoubleType)

  /** SQL snippets for the DuckDB oracle side. */
  def sqlDsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlDsumProd(a: String, b: String): String =
    s"CAST(CAST(SUM(CAST($a AS DECIMAL(18,4)) * CAST($b AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)"
}
