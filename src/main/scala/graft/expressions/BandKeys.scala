package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All sign-LSH band keys of one embedding in a single compiled pass.
  *
  * Semantically identical to the HOF composition it replaces in
  * `api.Similarity.bandsOf` — for band `b`, the key is the concatenation over
  * plane `j ∈ [bits·b, bits·(b+1))` of `'1'` iff
  * `Σ_i x_i · hpSign(j, i) > 0`, with the projection accumulated in double
  * left-to-right (index order) exactly as `aggregate(sequence(1, size), …)`
  * does, so the DuckDB oracle twins (QueriesVector.sqlHpSign /
  * sqlBandKeyWide) remain bit-identical.
  *
  * Why an Expression: the HOF form evaluates nBands·bitsPerBand interpreted
  * `aggregate` lambdas per row — 128 array traversals through
  * `HigherOrderFunction.eval` at the (16,8) production geometry. This is one
  * static call over one traversal of the array, accumulating every plane's
  * projection in a flat double[], and it keeps the banded-index projection
  * pass inside whole-stage codegen.
  */
case class BandKeys(child: Expression, nBands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  require(nBands > 0 && bitsPerBand > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_band_keys requires ARRAY<FLOAT>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_band_keys"

  override protected def nullSafeEval(v: Any): Any =
    BandKeys.keys(v.asInstanceOf[ArrayData], nBands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BandKeys.keys($c, $nBands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

object BandKeys {
  /** Hyperplane sign table cache, keyed by plane count. hpSign(j, i) depends
    * only on (plane j, 1-based dimension i) — never on the data — so the two
    * 64-bit mods per (element × plane) the hot loop used to pay are computed
    * once per JVM and the projection loop becomes a pure FMA over this table.
    * At the adaptive geometry (~1.4k planes × 64 dims) that is the difference
    * between ~5 integer ops and 1 multiply per accumulate. Layout: row i-1
    * holds planes contiguously (`tbl((i-1)·planes + j)`), matching the inner
    * loop's stride. Values are exactly the ±1.0 the inline mod produced, so
    * results stay bit-identical to the HOF form and the SQL oracle. A racing
    * fill computes an identical table — last write wins harmlessly.
    *
    * BOUNDED: a table is cap×planes doubles (high-dim wide geometries reach
    * hundreds of MB), and geometry sweeps would otherwise accumulate one
    * per distinct plane count per executor JVM with no eviction. The cache
    * holds at most [[SignCacheMaxEntries]] plane counts; when full, it is
    * cleared wholesale before the new fill — tables are pure functions of
    * (planes, dim), so eviction only costs a deterministic recompute, and a
    * steady-state workload uses one geometry anyway.
    */
  private val SignCacheMaxEntries = 4
  private val signCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  private def signTable(planes: Int, dim: Int): Array[Double] = {
    val cur = signCache.get(planes)
    if (cur != null && cur.length >= dim * planes) cur
    else {
      if (signCache.size >= SignCacheMaxEntries && !signCache.containsKey(planes))
        signCache.clear()
      val cap = math.max(dim, 128)
      val t = new Array[Double](cap * planes)
      var i = 1L
      while (i <= cap) {
        val off = (i.toInt - 1) * planes
        var j = 0
        while (j < planes) {
          // hpSign(j, i): parity of (j+1)·(i+7)·2654435761 mod 1000000007.
          // All factors positive, product < 2^63 for any realistic dim count.
          t(off + j) =
            if (((j + 1L) * (i + 7L) * 2654435761L % 1000000007L) % 2L == 1L) 1.0 else -1.0
          j += 1
        }
        i += 1
      }
      signCache.put(planes, t)
      t
    }
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def keys(a: ArrayData, nBands: Int, bitsPerBand: Int): ArrayData = {
    val n = a.numElements()
    val planes = nBands * bitsPerBand
    val tbl = signTable(planes, n)
    val proj = new Array[Double](planes)
    var idx = 0
    while (idx < n) {
      // 1-based dimension index, matching sequence(1, size) in the HOF form
      // and generate_series(1, len(embedding)) in the oracle.
      val x = a.getFloat(idx).toDouble
      val off = idx * planes
      var j = 0
      while (j < planes) {
        proj(j) += x * tbl(off + j)
        j += 1
      }
      idx += 1
    }
    val out = new Array[Any](nBands)
    val buf = new java.lang.StringBuilder(bitsPerBand)
    var b = 0
    while (b < nBands) {
      buf.setLength(0)
      var k = 0
      while (k < bitsPerBand) {
        buf.append(if (proj(b * bitsPerBand + k) > 0) '1' else '0')
        k += 1
      }
      out(b) = UTF8String.fromString(buf.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(emb: Column, nBands: Int, bitsPerBand: Int): Column =
    GraftBridge.column(BandKeys(GraftBridge.expression(emb), nBands, bitsPerBand))
}
