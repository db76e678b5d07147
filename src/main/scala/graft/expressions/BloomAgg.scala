package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Distributed Bloom-filter BUILD as a native Catalyst aggregate: each
  * partition folds its long inputs into a local bit array, partials merge
  * by bitwise OR, and the final value is the packed filter (binary).
  * This is the shape Spark's own runtime row-level filtering uses
  * internally — here as a public aggregate, because a 100 TB corpus's
  * membership index must be BUILT distributed (one pass, OR-merge) even
  * though the result is small enough to broadcast.
  *
  * Bit positions use Kirsch–Mitzenmacher double hashing over a
  * murmur-style finalizer ([[BloomAgg.mix]]): position_i =
  * (h1 + i·h2) mod numBits — k probes from two derived hashes, the
  * standard construction. Deterministic: the same inputs produce the same
  * bits on any partitioning (OR is commutative/associative).
  *
  * `numBits` is bounded to 2³⁰ (128 MB) — a filter beyond that should be
  * partitioned, not aggregated.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits <= (1 << 30),
    s"numBits must be in 1..2^30, got $numBits")
  require(numHashes > 0 && numHashes <= 16,
    s"numHashes must be in 1..16, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg requires a BIGINT input, got ${child.dataType.catalogString}")

  private def nWords: Int = (numBits + 63) >>> 6

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    // positions mod the PADDED width (nWords*64): the packed binary is what
    // [[BloomAgg.contains]] probes, and its length is the rounded-up word
    // count — set and probe must agree on the modulus
    if (v != null) BloomAgg.set(buffer, v.asInstanceOf[Long], nWords << 6, numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomAgg.pack(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = BloomAgg.pack(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomAgg.unpack(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {
  /** 64-bit murmur3-style finalizer — the avalanche step that turns raw
    * longs (often sequential ids or low-entropy hashes) into uniform bits. */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** Set the k double-hashed bit positions of `v`. */
  def set(words: Array[Long], v: Long, numBits: Int, numHashes: Int): Unit = {
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L // odd: full-period stride
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits.toLong).toInt
      words(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** Membership probe against a packed filter — shared by the scalar
    * expression's interpreted and generated code paths. */
  def contains(packed: Array[Byte], v: Long, numHashes: Int): Boolean = {
    val numBits = packed.length.toLong * 8
    if (numBits == 0) return false
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      if ((packed((pos >>> 3).toInt) & (1 << (pos & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Little-endian byte packing (bit b of the filter = bit b&7 of byte b>>3,
    * matching [[contains]]' probe arithmetic). */
  def pack(words: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](words.length * 8)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var j = 0
      while (j < 8) { out(i * 8 + j) = ((w >>> (8 * j)) & 0xff).toByte; j += 1 }
      i += 1
    }
    out
  }

  def unpack(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long]((bytes.length + 7) / 8)
    var i = 0
    while (i < bytes.length) {
      out(i >>> 3) |= (bytes(i) & 0xffL) << (8 * (i & 7))
      i += 1
    }
    out
  }
}

/** Scalar membership probe: `BloomContains(filter binary, value bigint)` —
  * true iff every one of the value's `numHashes` double-hashed bit
  * positions is set. False positives at the filter's designed rate; NO
  * false negatives (the dedup-safety contract). Codegen'd static call, so
  * a broadcast filter literal probes inside whole-stage codegen. */
case class BloomContains(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {
  require(numHashes > 0 && numHashes <= 16,
    s"numHashes must be in 1..16, got $numHashes")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires (BINARY, BIGINT), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(filter: Any, v: Any): Any =
    BloomAgg.contains(filter.asInstanceOf[Array[Byte]], v.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, v) =>
      s"graft.expressions.BloomAgg.contains($f, $v, $numHashes)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

/** Membership probe against a SparkContext-broadcast filter: same semantics
  * as [[BloomContains]], but the packed bits travel as a broadcast handle
  * instead of a plan literal — at the documented design ceiling (2³⁰ bits =
  * 128 MB) a literal would be re-serialized into every task binary, while
  * the broadcast ships once per executor. The generated code hoists
  * `bc.value()` into codegen init so the per-row probe is the same static
  * call as the literal path. */
case class BloomContainsBroadcast(
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression,
    numHashes: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numHashes > 0 && numHashes <= 16,
    s"numHashes must be in 1..16, got $numHashes")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains_bc requires a BIGINT input, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains_bc"

  override protected def nullSafeEval(v: Any): Any =
    BloomAgg.contains(bc.value, v.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomFilterBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val bytes = ctx.addMutableState("byte[]", "bloomFilterBytes",
      v => s"$v = (byte[]) $bcRef.value();")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.BloomAgg.contains($bytes, $v, $numHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsBroadcast =
    copy(child = newChild)
}
