package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("partitioned CSV sink creates one directory per key and round-trips") {
    val out = "target/sinks-spec/csv_keyed"
    Sinks.csvPartitioned(graft.Tables.nation(spark, dir), out, Seq("n_regionkey"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == (0 to 4).map(k => s"n_regionkey=$k"))
    val back = spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("header", "true").csv(out)
    assert(back.count() == 25)
    assert(back.select("n_regionkey").distinct().count() == 5)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val out = "target/sinks-spec/pq_keyed"
    Sinks.parquetPartitioned(graft.Tables.orders(spark, dir), out, Seq("o_orderstatus"))
    val one = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition pruning missing:\n$plan")
    assert(one.count() > 0)
  }

  test("omnibus CSV sink writes a readable multi-part directory") {
    val out = "target/sinks-spec/csv_omnibus"
    Sinks.csvOmnibus(graft.Tables.region(spark, dir), out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 5)
  }
}
