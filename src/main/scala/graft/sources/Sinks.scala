package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** Sink surface (SURVEY.md §2.1 S3/S4/S5).
  *
  * The reference writes one CSV per (char, version) for restartability
  * (web_scraper.py:1165-1183), three final omnibus CSVs (:1266-1282), and
  * appends to Postgres in one transaction (:1286-1291). Spark-first:
  * per-key files fall out of a partitioned write, the "omnibus" is just the
  * unpartitioned dataset, and JDBC append is the built-in connector.
  *
  * At 100 TB: `partitionBy` keys must be low-cardinality (they become
  * directories); never `coalesce(1)` an engine path — single-file outputs
  * exist only in driver-side verify dumps.
  */
object Sinks {

  /** S3: per-key checkpointed CSV layout (one directory per key value). */
  def csvPartitioned(df: DataFrame, path: String, keys: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(keys: _*)
      .option("header", "true").csv(path)

  /** S3 restartability: resume-aware per-key CSV write. The reference's
    * per-char temp CSVs double as restart checkpoints — a rerun skips every
    * character whose file already exists (web_scraper.py:1164-1183,
    * README.md:54-56). Spark-first: the partition DIRECTORY is the
    * checkpoint marker. One driver-side listing of `path` yields the done
    * keys (cheap — partition keys are low-cardinality by contract), a
    * broadcast left-anti join drops their rows, and ONLY the missing
    * partitions are appended. Completed partitions are never rewritten, so
    * a rerun after a crash does exactly the remaining work — at 100 TB this
    * is the difference between re-shuffling the whole output and finishing
    * the tail.
    *
    * Same caveat as the reference: a key is "done" iff its directory exists,
    * so a run killed mid-partition-commit should clear that partition dir
    * before resuming (Spark's job commit makes the window small: files land
    * in `_temporary` until task commit). Keys must be non-null.
    *
    * Returns the number of key values written by THIS run (0 = everything
    * was already checkpointed).
    */
  def csvResumePartitioned(df: DataFrame, path: String, key: String): Long = {
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Directory names are decoded with Spark's OWN partition-path unescape
    // (only %XX sequences), the exact inverse of the escapePathName the
    // writer used. java.net.URLDecoder is NOT that inverse: it also maps
    // '+' to space, while the writer leaves '+' unescaped — under it a key
    // containing '+' never matched its own directory and its completed
    // partition was re-appended (duplicated) on every resume.
    val done: Seq[String] =
      if (!fs.exists(hPath)) Seq.empty
      else fs.listStatus(hPath).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith(s"$key="))
        .map(n => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(n.substring(key.length + 1)))
    val pending =
      if (done.isEmpty) df
      else {
        import spark.implicits._
        // anti join beats a giant isin(): the done list stays a broadcast
        // relation, not a thousand-term expression tree
        df.join(broadcast(done.toDF("__done_key")),
          col(key).cast("string") === col("__done_key"), "left_anti")
      }
    val pendingKeys = pending.select(key).distinct().count()
    if (pendingKeys > 0)
      pending.write.mode("append").partitionBy(key)
        .option("header", "true").csv(path)
    pendingKeys
  }

  /** S4: omnibus CSV (parallel multi-part; readers glob the directory). */
  def csvOmnibus(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Parquet with keyed layout — the engine's durable format of choice
    * (typed, splittable, prunable), partitioned for downstream pruning. */
  def parquetPartitioned(df: DataFrame, path: String, keys: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(keys: _*).parquet(path)

  /** ORC sink (columnar alternative; same partitioned-layout semantics as
    * parquet — useful where the downstream stack is ORC-native). */
  def orcPartitioned(df: DataFrame, path: String, keys: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(keys: _*).orc(path)

  /** Bucketed parquet table: rows hash-partitioned into a fixed number of
    * buckets on `key` at write time, sorted within each bucket. Two tables
    * bucketed the same way co-locate their join keys, so a join between
    * them needs NO exchange and NO sort — at 100 TB this turns the
    * biggest fact-fact joins from full-shuffle into local merge joins.
    * Bucketed layout requires the catalog (`saveAsTable`), not a bare path. */
  def parquetBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** S5: transactional-append JDBC sink (to_sql if_exists='append' analog).
    * Exercised in SinksSpec against embedded Derby (append semantics, batch
    * size, type round-trip); the same options drive any production RDBMS. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      user: String, password: String, batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .option("isolationLevel", "READ_COMMITTED")
      .mode("append")
      .save()
}
