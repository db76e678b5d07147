package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: token array → 3-gram shingle hash array in one compiled
  * pass. sh[i] = ((h[i]*31 + h[i+1]) mod P * 31 + h[i+2]) mod P over
  * [[PolyHash]] token hashes; fewer than 3 tokens → empty array.
  *
  * The composable form (transform over sequence with element_at lookups into
  * a transform-built hash array) re-evaluates the token-hash array for every
  * element_at — interpreted higher-order lambdas get no common-subexpression
  * elimination — turning O(tokens) into O(tokens × shingles). This computes
  * each token hash exactly once.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import PolyHash.P

  /** Static entry point shared by interpreted eval and generated code.
    * Null tokens hash as 0 (split() never produces them in practice). */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) 0L else PolyHash.hash(t)
      i += 1
    }
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      out(i) = ((th(i) * 31L + th(i + 1)) % P * 31L + th(i + 2)) % P
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c)))
}
