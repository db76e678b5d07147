package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.{BlockMetaData, ColumnChunkMetaData}
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.SparkSession

/** Exact per-file metadata from parquet FOOTERS — row counts and column
  * min/max/null-count envelopes — so write-path stats recording and
  * metadata-only aggregates never pay a second Spark scan of bytes that
  * were just written (guide §1.2/§6: the cheapest pass is the one you
  * don't run; footers are O(files) driver-side metadata, no data I/O).
  *
  * TRUST BOUNDARY (the same one Spark's own parquet aggregate pushdown
  * draws): a statistics object surfaced by ParquetFileReader has already
  * passed parquet-mr's CorruptStatistics screening (pre-1.9 binary-order
  * bugs come back empty), so a non-empty footer stat is exact. Everything
  * else — missing stats, unknown null counts, types whose string
  * rendering could diverge from Spark's `cast(col AS string)` (floats,
  * decimals, timestamps) — returns None and the caller falls back to the
  * scan path, byte-identical to the old behavior.
  *
  * One documented widening (r16 ADVICE): BINARY/string stats from FOREIGN
  * writers using footer-statistics truncation (parquet-mr ≥ 1.12's
  * `parquet.statistics.truncate.length`) are a prefix-min / incremented-max
  * — a VALID envelope (pruning can only widen, never lose rows) but not
  * byte-exact values. Our own writer never truncates (FooterStatsSpec pins
  * byte equality on everything this repo writes), and the only consumer of
  * the strings-as-values is commitExisting's add-action recording, where a
  * widened envelope is still a correct prune bound.
  *
  * Rendering contract: the returned min/max STRINGS must equal what
  * `min(col).cast("string")` / `max(col).cast("string")` produce over the
  * same file, because TxLog records them verbatim in add-actions and
  * later prunes parse them back. Supported exactly: integral types
  * (toString), strings (UTF-8 bytes verbatim; parquet's unsigned byte
  * order == UTF8String's comparison order), booleans ("true"/"false"),
  * and dates within years 1000–9999 (ISO yyyy-MM-dd, both sides
  * zero-padded). FooterStatsSpec pins scan-path vs footer-path equality
  * per type.
  */
object ParquetFooters {

  /** One file's footer-derived metadata. `stats` maps a requested column
    * to its envelope; a column that is ALL NULL in the file is present in
    * `allNull` instead (the scan path records no envelope for it). */
  private[sources] final case class Meta(rows: Long,
      stats: Map[String, (String, String, Long)], allNull: Set[String])

  /** Footer metadata for every file, or None when ANY file or column
    * cannot be proven exact — the caller falls back to the scan for the
    * whole batch (mixed-path bookkeeping is not worth the rarity). */
  private[sources] def metaAll(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): Option[Map[String, Meta]] = {
    if (cols.exists(_.contains('.'))) return None // nested paths: scan path
    val conf = spark.sessionState.newHadoopConf()
    val out = Map.newBuilder[String, Meta]
    files.foreach { p =>
      metaOf(conf, p, cols) match {
        case Some(m) => out += p -> m
        case None    => return None
      }
    }
    Some(out.result())
  }

  /** Exact MAX of an integral column over a parquet file or directory
    * tree (Spark-visible files only), from footer stats alone — the
    * metadata answer to `df.agg(max(col))` (one less full scan in every
    * caller that only needs a boundary). None when any footer lacks an
    * exact stat: callers keep their scan fallback. All-null files
    * contribute nothing (like SQL MAX); None is also returned when every
    * row of every file is null (SQL MAX would be NULL — callers treat
    * that as "fall back"). */
  def maxLong(spark: SparkSession, path: String, colName: String): Option[Long] = {
    val files = listVisibleParquet(path)
    if (files.isEmpty) return None
    metaAll(spark, files, Seq(colName)).flatMap { metas =>
      val maxes = metas.values.flatMap(_.stats.get(colName)).map(_._2)
      if (maxes.isEmpty) None
      else {
        // rendered by our own integral path, so toLong is total; a
        // malformed value (foreign writer drift) falls back via the catch
        try Some(maxes.map(_.toLong).max) catch { case _: NumberFormatException => None }
      }
    }
  }

  /** Spark's hidden-path discipline: skip any path component starting
    * with `.`, or with `_` UNLESS it contains `=` — Spark's file index
    * treats `_name=value` partition directories as VISIBLE (r16 ADVICE:
    * skipping them would make maxLong compute an "exact" max over a
    * subset of the files Spark scans and silently mis-bound slice
    * appends on such layouts). `_SUCCESS`/committer litter still skips. */
  private def listVisibleParquet(path: String): Seq[String] = {
    val root = Paths.get(path)
    if (!Files.exists(root)) return Seq.empty
    if (Files.isRegularFile(root)) return Seq(root.toString)
    def visible(p: Path): Boolean =
      root.relativize(p).iterator().asScala.forall { seg =>
        val s = seg.toString
        !s.startsWith(".") && !(s.startsWith("_") && !s.contains("="))
      }
    scala.util.Using.resource(Files.walk(root)) { s =>
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && visible(p))
        .map(_.toString).toList.sorted
    }
  }

  private def metaOf(conf: org.apache.hadoop.conf.Configuration, file: String,
      cols: Seq[String]): Option[Meta] =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), conf)
      scala.util.Using.resource(ParquetFileReader.open(in)) { r =>
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val stats = Map.newBuilder[String, (String, String, Long)]
        val allNull = Set.newBuilder[String]
        cols.foreach { c =>
          colEnvelope(blocks, c) match {
            case Some(Some(env)) => stats += c -> env
            case Some(None)      => allNull += c
            case None            => return None // unprovable → whole-file fallback
          }
        }
        Some(Meta(rows, stats.result(), allNull.result()))
      }
    } catch { case _: Exception => None }

  /** Outer Option: None = cannot prove (fallback). Inner Option: None =
    * provably all-null (no envelope, like the scan path). */
  private def colEnvelope(blocks: Seq[BlockMetaData],
      c: String): Option[Option[(String, String, Long)]] = {
    var nulls = 0L
    var acc: Option[(Any, Any, PrimitiveType)] = None
    blocks.foreach { b =>
      val cc = b.getColumns.asScala.find(_.getPath.toDotString == c)
        .getOrElse(return None) // column absent from a block: scan path decides
      val st = cc.getStatistics
      if (st == null || st.isEmpty || !st.isNumNullsSet) return None
      nulls += st.getNumNulls
      if (st.hasNonNullValue) {
        val pt = cc.getPrimitiveType
        if (!supported(pt)) return None
        val (mn, mx) = (st.genericGetMin, st.genericGetMax)
        acc = acc match {
          case None => Some((mn, mx, pt))
          case Some((amn, amx, apt)) =>
            val lo = if (cmp(pt, mn, amn) < 0) mn else amn
            val hi = if (cmp(pt, mx, amx) > 0) mx else amx
            Some((lo, hi, apt))
        }
      } else if (st.getNumNulls != b.getRowCount) {
        // inconsistent footer (values exist but no envelope recorded)
        return None
      }
    }
    acc match {
      case None => Some(None) // every row null (or zero rows)
      case Some((mn, mx, pt)) =>
        (render(pt, mn), render(pt, mx)) match {
          case (Some(a), Some(b)) => Some(Some((a, b, nulls)))
          case _                  => None
        }
    }
  }

  private def supported(pt: PrimitiveType): Boolean = {
    import PrimitiveType.PrimitiveTypeName._
    val logical = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case INT64 => logical == null ||
        (logical.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] &&
          logical.asInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation].isSigned)
      case INT32 => logical == null ||
        (logical.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] &&
          logical.asInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation].isSigned) ||
        logical.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
      case BINARY =>
        logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case BOOLEAN => true
      case _ => false // floats/doubles (NaN + rendering), decimals, timestamps
    }
  }

  /** Typed comparison in the SAME order Spark's min/max aggregate uses:
    * integral/date numerically, booleans false<true, strings by unsigned
    * byte order (== UTF8String.compareTo == parquet's UNSIGNED order). */
  private def cmp(pt: PrimitiveType, a: Any, b: Any): Int = {
    import PrimitiveType.PrimitiveTypeName._
    pt.getPrimitiveTypeName match {
      case INT64   => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case INT32   => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
      case BOOLEAN => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
      case BINARY =>
        val (x, y) = (a.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
          b.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
        var i = 0
        val n = math.min(x.length, y.length)
        while (i < n) {
          val d = (x(i) & 0xff) - (y(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        x.length - y.length
      case other => sys.error(s"unsupported comparison type $other") // unreachable: supported() gates
    }
  }

  /** Render exactly as Spark's `cast(col AS string)` would. None when the
    * value sits outside the provably-identical range (date years beyond
    * 1000–9999). */
  private def render(pt: PrimitiveType, v: Any): Option[String] = {
    import PrimitiveType.PrimitiveTypeName._
    pt.getPrimitiveTypeName match {
      case INT64 => Some(v.asInstanceOf[Long].toString)
      case INT32 =>
        if (pt.getLogicalTypeAnnotation
            .isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]) {
          val days = v.asInstanceOf[Int]
          // years 1000–9999: LocalDate.toString == Spark's yyyy-MM-dd
          if (days < -354285 || days > 2932896) None
          else Some(java.time.LocalDate.ofEpochDay(days.toLong).toString)
        } else Some(v.asInstanceOf[Int].toString)
      case BOOLEAN => Some(v.asInstanceOf[Boolean].toString)
      case BINARY => Some(new String(
        v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
        java.nio.charset.StandardCharsets.UTF_8))
      case _ => None
    }
  }
}
