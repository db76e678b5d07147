package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Native expression: token array → k-gram double-hash key array in one
  * compiled pass — the exact-substring dedup hot path (api.Dedup
  * .repeatedSpans). out[i] keys the k tokens starting at i:
  * g1·P2 + g2, where g1/g2 are the polynomial folds
  * (acc·31 + h) mod P1 / (acc·37 + h) mod P2 over [[PolyHash]] token
  * hashes — identical arithmetic to the DuckDB oracle's list_reduce twin,
  * so values match bit-for-bit. Fewer than k tokens → empty array.
  *
  * Each token hashes once, then both folds ROLL: g(i+1) derives from g(i)
  * by removing th[i]·mult^(k-1) and appending th[i+k] — O(tokens) total
  * per document, independent of k. The composable form (aggregate over
  * slice inside transform) re-folds every window from scratch: O(tokens·k)
  * with interpreted lambda dispatch per element, which at the production
  * k≈50 (Lee et al. 2022) is a 50× hot-path regression this expression
  * exists to avoid.
  */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 2 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires k >= 2, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GramHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  val P1 = 1000000007L
  val P2 = 999999937L

  private def powMod(base: Long, exp: Int, mod: Long): Long = {
    var r = 1L; var b = base % mod; var e = exp
    while (e > 0) {
      if ((e & 1) == 1) r = r * b % mod
      b = b * b % mod
      e >>= 1
    }
    r
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Null tokens hash as 0 (split() never produces them in practice).
    * All intermediates stay below 2^63: th, g < 2^30; th·pow < 2^60;
    * g·31 + th < 2^35; g1·P2 + g2 < 2^60. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) 0L else PolyHash.hash(t)
      i += 1
    }
    val pow31 = powMod(31L, k - 1, P1)
    val pow37 = powMod(37L, k - 1, P2)
    var g1 = 0L; var g2 = 0L
    i = 0
    while (i < k) { // initial window: the plain folds
      g1 = (g1 * 31L + th(i)) % P1
      g2 = (g2 * 37L + th(i)) % P2
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    out(0) = g1 * P2 + g2
    i = 1
    while (i <= n - k) { // roll: drop th(i-1), append th(i+k-1)
      g1 = ((g1 - th(i - 1) * pow31 % P1 + P1) % P1 * 31L + th(i + k - 1)) % P1
      g2 = ((g2 - th(i - 1) * pow37 % P2 + P2) % P2 * 37L + th(i + k - 1)) % P2
      out(i) = g1 * P2 + g2
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(GramHashes(GraftBridge.expression(c), k))
}
