package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's deterministic polynomial
  * string hash: fold (acc*31 + codePoint) mod 1_000_000_007 over the string.
  *
  * Semantically identical to the composable column form
  * `aggregate(split(s,""), 0L, (a,c) => (a*31+ascii(c)) % P)` (and to the
  * DuckDB oracle's list_reduce mirror), but ~30× faster: higher-order
  * functions are interpreted per element, while this compiles to a single
  * static call inside whole-stage codegen. Used on the dedup hot paths
  * (shingle/token hashing at millions of rows per partition).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_poly_hash requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P = 1000000007L

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column-level entry point. */
  def apply(c: Column): Column = GraftBridge.column(PolyHash(GraftBridge.expression(c)))
}
