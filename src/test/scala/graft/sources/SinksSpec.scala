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

  test("bucketed tables co-locate a join: no exchange, no sort in the plan") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Sinks.parquetBucketed(graft.Tables.orders(spark, dir), "b_orders", "o_custkey", 4)
    Sinks.parquetBucketed(
      graft.Tables.customer(spark, dir).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", 4)
    val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
    val expected = joined.count()
    // Disable broadcast so the co-located layout (not a broadcast) is what
    // eliminates the shuffle; SMJ over pre-bucketed pre-sorted inputs.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val again = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      val plan = again.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // A within-partition Sort survives: with multiple writer tasks each
      // bucket holds several files, and Spark only trusts sortBy order for
      // single-file buckets. The exchange elimination is the scale win; the
      // local sort is spill-free and per-bucket.
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      assert(again.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("ORC sink round-trips with partition pruning") {
    val out = "target/sinks-spec/orc_keyed"
    Sinks.orcPartitioned(graft.Tables.orders(spark, dir), out, Seq("o_orderstatus"))
    val back = spark.read.orc(out)
    assert(back.count() == graft.Tables.orders(spark, dir).count())
    val one = back.filter(col("o_orderstatus") === "F")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"ORC partition pruning missing:\n$plan")
  }

  test("JDBC append sink round-trips against embedded Derby; append doubles rows") {
    // Derby ships on the Spark classpath (metastore dependency) — an embedded
    // in-JVM database, so the reference's load step (web_scraper.py:1286-1291,
    // to_sql if_exists='append') is exercised end-to-end: table auto-creation
    // on first append, true append (not overwrite) on the second, and type
    // fidelity through Spark's DerbyDialect both directions.
    System.setProperty("derby.system.home", "target/sinks-spec/derby-home")
    val url = "jdbc:derby:target/sinks-spec/derbydb;create=true"
    val table = "graft_region"
    // clean slate across test re-runs (Derby has no DROP TABLE IF EXISTS)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(s"DROP TABLE $table")
    catch { case _: java.sql.SQLException => () } finally conn.close()

    val src = graft.Tables.region(spark, dir)
    Sinks.jdbcAppend(src, url, table, "app", "app", batchSize = 2)
    Sinks.jdbcAppend(src, url, table, "app", "app", batchSize = 2)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", "app").option("password", "app").load()
    assert(back.count() == 10, "two appends of 5 rows must yield 10")
    // types survive: the int key is still numeric (summable), strings round-trip
    assert(back.select(sum("r_regionkey")).first().getLong(0) == 2L * (0 to 4).sum)
    assert(back.select("r_name").distinct().count() == 5)
    assert(back.schema("r_regionkey").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("resume-aware CSV sink: a rerun writes ONLY the missing partitions") {
    val out = "target/sinks-spec/csv_resume"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val nation = graft.Tables.nation(spark, dir) // 25 rows, 5 regions
    // "crashed" first run: only regions 0 and 1 got checkpointed
    val firstRun = Sinks.csvResumePartitioned(
      nation.filter(col("n_regionkey") < 2), out, "n_regionkey")
    assert(firstRun == 2)
    // snapshot the files of the completed partitions (name -> mtime)
    def partFiles(k: Int) = {
      val d = new java.io.File(s"$out/n_regionkey=$k")
      d.listFiles().filter(_.getName.endsWith(".csv")).map(f => f.getName -> f.lastModified()).toMap
    }
    val before = (0 to 1).map(k => k -> partFiles(k)).toMap
    // resume with the FULL dataset: only the 3 missing regions are written
    val resumed = Sinks.csvResumePartitioned(nation, out, "n_regionkey")
    assert(resumed == 3, s"resume should write exactly the 3 missing keys, wrote $resumed")
    // completed partitions untouched: same files, same mtimes (not rewritten)
    (0 to 1).foreach(k => assert(partFiles(k) == before(k), s"partition $k was rewritten"))
    // and the union is complete + duplicate-free
    val back = spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("header", "true").csv(out)
    assert(back.count() == 25)
    assert(back.select("n_nationkey").distinct().count() == 25)
    // idempotent: a third run with everything checkpointed writes nothing
    assert(Sinks.csvResumePartitioned(nation, out, "n_regionkey") == 0)
  }

  test("resume-aware CSV sink: keys with '+' and escaped chars are not re-appended") {
    val out = "target/sinks-spec/csv_resume_escape"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    import spark.implicits._
    // '+' is written unescaped by the partition writer (URLDecoder would
    // decode it to a space and break the done-match); ':' is %XX-escaped.
    val df = Seq(("a+b", 1), ("c:d", 2), ("plain", 3)).toDF("k", "v")
    assert(Sinks.csvResumePartitioned(df, out, "k") == 3)
    // a full rerun must see every key as done — nothing appended
    assert(Sinks.csvResumePartitioned(df, out, "k") == 0)
    val back = spark.read.schema("v INT, k STRING").option("header", "true").csv(out)
    assert(back.count() == 3, "a re-appended partition would duplicate rows")
    assert(back.select("k").as[String].collect().toSet == Set("a+b", "c:d", "plain"))
  }

  test("omnibus CSV sink writes a readable multi-part directory") {
    val out = "target/sinks-spec/csv_omnibus"
    Sinks.csvOmnibus(graft.Tables.region(spark, dir), out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 5)
  }
}
