package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic testdata tables (TESTDATA.md, FIXTURES.md §3).
  *
  * Parquet is self-describing, so we read the embedded schema; filters and column
  * pruning applied by callers push down into the scan (verified via
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`). At 100 TB these reads
  * become multi-file partitioned scans; nothing here assumes a single file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS). How Spark surfaces that depends
    * on the runtime: older 4.x rejects it in the vectorized reader unless read
    * as raw long nanos (the legacy `nanosAsLong` flag), while Spark ≥ 4.1
    * reads it natively as TIMESTAMP_NTZ truncated to micros and ignores the
    * flag at schema inference. Branch on the inferred type so either runtime
    * lands on the same session-zoned TIMESTAMP at microsecond precision —
    * exactly the value DuckDB produces when it reads the same file (its
    * TIMESTAMP is micros; both floor-truncate), so oracle comparisons see
    * identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: ns values exceed 2^53 and would lose
        // precision through a double division.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // sessions here run UTC, so the NTZ→LTZ cast is value-preserving
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // fail LOUDLY on the next schema-inference drift: silently skipping
        // the micros/zone normalization would hash-mismatch every events
        // oracle with no error pointing here
        sys.error(s"events.ts surfaced as unexpected type $other — " +
          "extend Tables.events for this Spark runtime")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
