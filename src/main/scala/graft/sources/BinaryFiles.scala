package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Raw-file ingestion for multimodal corpora: Spark's `binaryFile` source
  * reads a directory tree as one row per file — (path, modificationTime,
  * length, content: binary) — which is exactly the "opaque bytes + typed
  * metadata" column contract [[graft.ops.Multimodal]] consumes. This is the
  * step in FRONT of the multimodal operators: crawl output on object
  * storage → one scan → (id, kind, payload) rows → imageStats / audioStats /
  * videoFrameIndex.
  *
  * Scale posture (100 TB of media): parallelism is per file and task input
  * is bounded by `spark.sql.files.maxPartitionBytes`; `pathGlobFilter`
  * prunes non-media files AT THE LISTING, before any byte is read, and a
  * partitioned directory layout keeps the listing itself pruned. Kind
  * sniffing is a per-row expression over the first bytes of the content —
  * no UDF, no shuffle anywhere in the source.
  */
object BinaryFiles {

  /** One row per file under `dir`: (path, modificationTime, length,
    * content). `glob` prunes at the listing (e.g. "*.{png,jpg}"). */
  def read(spark: SparkSession, dir: String, glob: Option[String] = None,
      recursive: Boolean = true): DataFrame = {
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", recursive.toString)
    glob.fold(reader)(g => reader.option("pathGlobFilter", g)).load(dir)
  }

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Media-kind sniff by magic bytes, as a codegen'd expression: PNG/JPEG →
    * image, RIFF-WAVE / FORM-AIFF → audio, ISO-BMFF `ftyp` → video,
    * anything else → other. (`substring` is 1-based and works on binary.) */
  def kindOf(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(substring(content, 1, 4) === lit(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)) ||
         substring(content, 1, 3) === lit(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)), "image")
      .when(substring(content, 1, 4) === lit(ascii("RIFF")) &&
            substring(content, 9, 4) === lit(ascii("WAVE")), "audio")
      .when(substring(content, 1, 4) === lit(ascii("FORM")) &&
            substring(content, 9, 4) === lit(ascii("AIFF")), "audio")
      .when(substring(content, 5, 4) === lit(ascii("ftyp")), "video")
      .otherwise("other")

  /** Project a [[read]] frame into the Multimodal contract: doc_id =
    * xxhash64(path) (stable across runs and cluster sizes — derived from
    * content location, not row order), kind sniffed from magic bytes,
    * payload = raw content. */
  def toMedia(files: DataFrame): Dataset[Multimodal.MediaRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(
        xxhash64(col("path")).as("doc_id"),
        kindOf(col("content")).as("kind"),
        col("content").as("payload"))
      .as[Multimodal.MediaRow]
  }
}
