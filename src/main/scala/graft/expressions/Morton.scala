package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression computing the 62-bit Morton (Z-order) code of
  * two dimension keys — the multi-dimensional clustering key behind
  * OPTIMIZE ZORDER-style data layout (Morton 1966; the same interleaving
  * Delta Lake / Iceberg use for file clustering). Sorting by this value
  * places rows that are close in BOTH dimensions into the same file, so
  * per-file min/max statistics prune box predicates on either column —
  * the 100 TB data-skipping story a single-column sort cannot give.
  *
  * Bit spreading uses the O(log w) binary-magic-number method (five
  * shift-mask steps per operand, public-domain "Bit Twiddling Hacks")
  * rather than a 32-step loop, and compiles to straight-line long
  * arithmetic inside whole-stage codegen.
  *
  * Inputs must be in [0, 2^31): 31 bits per dimension keeps the interleaved
  * code positive, so SIGNED long ordering equals Z-curve ordering. An
  * out-of-range input throws — a silently wrapped key would corrupt the
  * layout order with no error pointing here (same loud contract as
  * Sampling.bucketOf).
  */
case class MortonCode2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_morton2 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_morton2"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    MortonCode2.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expressions.MortonCode2.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCode2 =
    copy(left = newLeft, right = newRight)
}

object MortonCode2 {
  /** Spread the low 31 bits of v across the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def interleave(x: Long, y: Long): Long = {
    if ((x & ~0x7FFFFFFFL) != 0L || (y & ~0x7FFFFFFFL) != 0L)
      throw new IllegalArgumentException(
        s"graft_morton2 inputs must be in [0, 2^31), got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }

  /** Column-level entry point. */
  def apply(x: Column, y: Column): Column =
    GraftBridge.column(
      MortonCode2(GraftBridge.expression(x), GraftBridge.expression(y)))
}
