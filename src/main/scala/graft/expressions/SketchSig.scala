package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** 256-plane sign signature of one `array<float>` embedding, packed as
  * `array<long>` of 4 — the coarse sketch behind the sketch-verified LSH
  * near-dup (api.Similarity.lshCosineNearDupSketched).
  *
  * The plane family is the same parity construction as [[BandKeys]] with the
  * plane index offset by 100000 (BandKeys never reaches plane 10⁵), so the
  * agreement estimate stays independent of the banding collisions that made
  * a pair a candidate — conditioning on "collided in ≥1 band" would bias a
  * shared-plane estimate upward and silently loosen the margin.
  *
  * Native + codegen so the signature rides the banded index as a 32-byte
  * column computed once per vector, instead of a driver-side collect of all
  * signatures (the r13 weak mark): at 100 TB the shuffle then carries
  * (id, sketch, band, key) rows — never the candidate multiset, never the
  * embedding payload per candidate.
  */
case class SigPlanes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sig_planes requires ARRAY<FLOAT>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sig_planes"

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(SigPlanes.sig256(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.SigPlanes.sig256($v))")

  override protected def withNewChildInternal(newChild: Expression): SigPlanes =
    copy(child = newChild)
}

object SigPlanes {
  /** Static entry shared by interpreted eval and generated code. Bit-identical
    * to the r12 driver-side `signature256` (same plane parity, same
    * left-to-right double accumulation), so the 4σ margin math and every
    * recorded ladder result carry over unchanged. */
  def sig256(a: ArrayData): Array[Long] = {
    val planes = 256
    val out = new Array[Long](4)
    val proj = new Array[Double](planes)
    val n = a.numElements()
    var i = 1
    while (i <= n) {
      val x = a.getFloat(i - 1).toDouble
      var j = 0
      while (j < planes) {
        proj(j) +=
          (if (((j + 100001L) * (i + 7L) * 2654435761L % 1000000007L) % 2L == 1L) x
           else -x)
        j += 1
      }
      i += 1
    }
    var j = 0
    while (j < planes) {
      if (proj(j) > 0) out(j >>> 6) |= (1L << (j & 63))
      j += 1
    }
    out
  }

  def apply(c: Column): Column =
    GraftBridge.column(SigPlanes(GraftBridge.expression(c)))
}

/** Plane-agreement count between two packed 256-plane signatures
  * (`array<long>` of 4): 256 − popcount(xor). Codegen'd so the cut applies
  * MAP-SIDE inside the banded self-join's post-condition — the candidate
  * stream is generated and filtered within one stage and never crosses a
  * shuffle. */
case class SketchAgree(left: Expression, right: Expression) extends BinaryExpression {
  private def ok(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sketch_agree requires two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sketch_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchAgree.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.SketchAgree.agree($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchAgree =
    copy(left = newLeft, right = newRight)
}

object SketchAgree {
  def agree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var agree = 64 * n
    var w = 0
    while (w < n) {
      agree -= java.lang.Long.bitCount(a.getLong(w) ^ b.getLong(w))
      w += 1
    }
    agree
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SketchAgree(GraftBridge.expression(a), GraftBridge.expression(b)))
}
