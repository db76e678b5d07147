package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: token array → space-joined adjacent-pair (bigram) array
  * in one compiled pass; fewer than 2 tokens → empty array.
  *
  * The composable form (`transform(sequence(1, size-1), i =>
  * concat_ws(" ", element_at(toks, i), element_at(toks, i+1)))`) is evaluated
  * by the interpreted higher-order-function path, and projection collapse
  * re-inlines the token-array child into every `element_at` — the regex
  * tokenizer reruns per bigram index, turning O(tokens) into O(tokens²) per
  * document. This reads each token exactly once.
  */
case class Bigrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bigrams requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bigrams"

  override protected def nullSafeEval(input: Any): Any =
    Bigrams.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bigrams.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

object Bigrams {
  private val SPACE = UTF8String.fromString(" ")

  /** Static entry point shared by interpreted eval and generated code.
    * Null tokens render as empty strings (split() never produces them). */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = tokens.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = tokens.getUTF8String(i)
      out(i - 1) = UTF8String.concat(
        if (prev == null) UTF8String.EMPTY_UTF8 else prev,
        SPACE,
        if (cur == null) UTF8String.EMPTY_UTF8 else cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    GraftBridge.column(Bigrams(GraftBridge.expression(c)))
}
