package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.roaringbitmap.RoaringBitmap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** DELETION VECTORS — the Delta-protocol mechanism (public spec: the
  * `deletionVector` field of add-actions; Armbrust et al. VLDB 2020 evolved
  * by the 2023 DV extension) that makes a point DELETE/UPDATE cost
  * O(affected rows) instead of O(file bytes): instead of rewriting a
  * touched file without its deleted rows, the commit publishes a BITMAP of
  * deleted row positions next to the untouched immutable file, and every
  * reader masks those positions out. A daily GDPR erasure of 1k rows on a
  * 100 TB table commits kilobytes of bitmap instead of rewriting terabytes.
  *
  * Representation: one sidecar file per (data file, commit) under
  * `<table>/_deletion_vectors/`, holding a serialized RoaringBitmap
  * (org.roaringbitmap — the library Spark itself ships and Delta's DV
  * format uses) of the file's deleted PHYSICAL row indexes
  * (`_metadata.row_index`). The add-action gains
  * `"dv":{"path":…,"card":N}`; a new delete on an already-DV'd file ORs
  * the old bitmap in and publishes a fresh sidecar (sidecars are immutable
  * like data files — vacuum collects superseded ones).
  *
  * Row indexes are 32-bit: a single parquet file holding ≥2³¹ rows does not
  * exist in practice (row-group layout caps far below), and the writer
  * refuses loudly rather than truncate if one ever appears.
  */
object Dv {

  /** A DV reference recorded on an add-action: sidecar path + cardinality
    * (how many rows the bitmap masks — lets COUNT(*) answer from metadata
    * and the fraction guard reason without reading the bitmap). */
  final case class Ref(path: String, card: Long)

  private def dvDir(table: String): Path = Paths.get(table, "_deletion_vectors")

  /** Serialize and publish a bitmap as a new immutable sidecar file.
    * Temp-write → fsync → atomic move, the same durability protocol as
    * commits: a crashed writer leaves only unreferenced litter. */
  def write(table: String, bm: RoaringBitmap): Ref = {
    bm.runOptimize()
    val dir = dvDir(table)
    Files.createDirectories(dir)
    val out = new java.io.ByteArrayOutputStream()
    bm.serialize(new java.io.DataOutputStream(out))
    val bytes = out.toByteArray
    val target = dir.resolve(java.util.UUID.randomUUID().toString + ".dv")
    val tmp = Files.createTempFile(dir, ".dv-", ".tmp")
    try {
      scala.util.Using.resource(java.nio.channels.FileChannel.open(tmp,
          java.nio.file.StandardOpenOption.WRITE)) { ch =>
        ch.write(java.nio.ByteBuffer.wrap(bytes))
        ch.force(true)
      }
      Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } finally { Files.deleteIfExists(tmp); () }
    Ref(target.toString, bm.getLongCardinality)
  }

  /** Executor-side bitmap cache: sidecars are immutable, so a loaded bitmap
    * is valid for the JVM's lifetime. Entries are a few KB each; the table
    * formats this engine targets hold thousands of DVs at most between
    * OPTIMIZE absorptions. */
  private val cache = new ConcurrentHashMap[String, RoaringBitmap]()

  def read(path: String): RoaringBitmap =
    cache.computeIfAbsent(path, { p =>
      val bm = new RoaringBitmap()
      bm.deserialize(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(Files.readAllBytes(Paths.get(p)))))
      bm
    })

  private[graft] def cacheInvalidate(): Unit = cache.clear()

  /** `_metadata.file_path` is URI-spelled; decode to the plain absolute
    * path log lines use (same discipline as TxLog.uriPathUdf, needed here
    * as a plain static for executor-side closures). */
  def uriPath(s: String): String =
    if (s == null) null
    else try new java.net.URI(s).getPath
    catch { case _: java.net.URISyntaxException =>
      s.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/") }

  private def normalize(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  /** Filter column keeping only LIVE rows of a scan over files with DVs:
    * true iff the row's position is NOT in its file's bitmap. The path→DV
    * map travels as a broadcast (once per executor, not per task); the
    * bitmap loads lazily from the sidecar on first probe and caches. Rows
    * of files absent from the map pass through. */
  def liveRowFilter(spark: SparkSession, dvByFile: Map[String, String]): Column = {
    val bc = spark.sparkContext.broadcast(
      dvByFile.map { case (p, dv) => normalize(p) -> dv })
    val masked = udf { (fp: String, idx: Long) =>
      bc.value.get(normalize(uriPath(fp)))
        .exists(dv => idx <= Int.MaxValue && read(dv).contains(idx.toInt))
    }
    !masked(col("_metadata.file_path"), col("_metadata.row_index"))
  }

  /** Read `files` with deleted rows masked out: files WITHOUT a DV take the
    * plain vectorized scan (full codegen, zero per-row overhead — at steady
    * state almost every file is clean), files WITH one pay the broadcast
    * bitmap probe. One union, exact rows. */
  def maskedRead(spark: SparkSession,
      reader: org.apache.spark.sql.DataFrameReader,
      files: Seq[String], dvByFile: Map[String, String]): DataFrame = {
    val (dirty, clean) = files.partition(dvByFile.contains)
    val frames = Seq(
      if (clean.isEmpty) None else Some(reader.parquet(clean: _*)),
      if (dirty.isEmpty) None
      else Some(reader.parquet(dirty: _*)
        .where(liveRowFilter(spark, dvByFile.view.filterKeys(dirty.toSet).toMap)))
    ).flatten
    frames.reduce(_.unionByName(_))
  }

  /** Per-file new-deletion bitmaps of `hits` (a frame of matching LIVE
    * rows carrying `__fp` = decoded file path and `__idx` = physical row
    * index): one distributed groupBy-aggregate building RoaringBitmaps in
    * executors (partials OR-merge), one collected row per file — the
    * driver never sees row indexes, only compressed bitmaps. */
  def bitmapsByFile(hits: DataFrame): Map[String, RoaringBitmap] = {
    val agg = org.apache.spark.sql.GraftBridge.column(
      DvBitmapAgg(org.apache.spark.sql.GraftBridge.expression(col("__idx")))
        .toAggregateExpression())
    hits.groupBy(col("__fp")).agg(agg.as("__bm"))
      .collect()
      .map { r =>
        val bm = new RoaringBitmap()
        bm.deserialize(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("__bm"))))
        normalize(r.getString(0)) -> bm
      }.toMap
  }
}

/** Native aggregate building a RoaringBitmap of row indexes: update adds
  * the 32-bit position, merge ORs partials, eval emits the serialized
  * bitmap. The driver-side collect is O(compressed bitmap), never O(rows).
  * Refuses (loudly) a row index beyond 2³¹ — see the note on [[Dv]]. */
case class DvBitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RoaringBitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_dv_bitmap_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dv_bitmap_agg requires a BIGINT row index, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()

  override def update(buffer: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) {
      val idx = v.asInstanceOf[Long]
      require(idx >= 0 && idx <= Int.MaxValue,
        s"row index $idx exceeds the 32-bit deletion-vector range")
      buffer.add(idx.toInt)
    }
    buffer
  }

  override def merge(buffer: RoaringBitmap, other: RoaringBitmap): RoaringBitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: RoaringBitmap): Any = serialize(buffer)

  override def serialize(buffer: RoaringBitmap): Array[Byte] = {
    buffer.runOptimize()
    val out = new java.io.ByteArrayOutputStream()
    buffer.serialize(new java.io.DataOutputStream(out))
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DvBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DvBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DvBitmapAgg =
    copy(child = newChildren.head)
}
