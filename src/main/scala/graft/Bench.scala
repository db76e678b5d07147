package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    // Optional YAML run config (S2): env beats YAML beats default, so the
    // driver's env-driven contract is unchanged.
    val yml = graft.sources.YamlConfig.fromEnv()
    val res = graft.sources.YamlConfig.resolve(sys.env.get, yml) _
    val sfDir = res("SPARK_GRAFT_SF_DIR", "data.sf_dir", "/root/testdata/sf0.1")
    val cpus = res("SPARK_GRAFT_CPUS", "spark.cpus", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    yml.foreach(_.applySparkConfs(builder))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state warmup: absorb JVM classloading, Janino codegen compiles,
    // parquet footer reads and shuffle-machinery init so the first timed query
    // measures the operator, not session bring-up. The whole catalog runs
    // once against the SMALLEST sibling scale (sf0.001 — milliseconds per
    // query) so every query's specific codegen/classload path is compiled
    // before its timed run: without this, whichever expensive query runs
    // first eats several seconds of one-time Janino cost and the per-query
    // numbers measure JVM bring-up order, not operator cost (the r5
    // dedup_ngram_jaccard "regression" was exactly this amplification).
    // Dev-only knob (the driver never sets it): comma-separated query ids to
    // skip, for scale probes where quadratic-by-contract ops are excluded.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    try {
      import org.apache.spark.sql.functions._
      val warm = spark.read.parquet(s"$sfDir/nation.parquet")
      warm.groupBy("n_regionkey").count().count()
      warm.join(broadcast(spark.read.parquet(s"$sfDir/region.parquet")),
        col("n_regionkey") === col("r_regionkey")).count()
      spark.range(1000).selectExpr("sum(id)").collect()
      val warmDir = {
        val p = java.nio.file.Paths.get(sfDir)
        Option(p.getParent).map(_.resolve("sf0.001"))
          .filter(java.nio.file.Files.exists(_)).map(_.toString).getOrElse(sfDir)
      }
      // Skip-listed queries are excluded from warmup too: when no sf0.001
      // sibling exists the warmup falls back to sfDir itself, and running a
      // quadratic-by-contract op at full probe scale just to warm codegen
      // would cost more than the timed run it serves.
      SparkEntry.queries.foreach { case (name, fn) =>
        if (!skip(name)) { try fn(spark, warmDir).count() catch { case _: Throwable => () } }
      }
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.filter(q => !skip(q._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
