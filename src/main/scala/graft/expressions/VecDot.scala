package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns, accumulated in double
  * left-to-right (index order) — the exact summation order the DuckDB oracle
  * uses, so values are bit-identical.
  *
  * Why not unroll `element_at(a,i)*element_at(b,i)` into column arithmetic?
  * That generates a method so large HotSpot refuses to JIT it (the classic
  * -XX:-DontCompileHugeMethods cliff) and the all-pairs join runs interpreted
  * bytecode at ~1µs/pair. This is one static call wrapping a tight compiled
  * loop. Norm² is just VecDot(a, a).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  private def ok(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vec_dot requires two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Static entry point shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
