package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator catalog lives in Relational/Text/Dedup/Vector Queries;
  * each entry pairs the Spark implementation with its DuckDB oracle SQL
  * (identical column aliases, explicit ORDER BY, exact-decimal aggregation
  * — see graft.functions.Exact for the determinism conventions).
  */
object SparkEntry {
  private val catalog: List[(String, Q)] =
    RelationalQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      VectorQueries.all ++ TimeQueries.all ++ SketchQueries.all ++
      SampleQueries.all

  /** Flagship query (SURVEY §7.2): latest-snapshot pick → 5-way join →
    * conditional revenue rollup. Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.joinMultiway.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Insertion-ordered so Bench timings are attributed deterministically. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      catalog.map { case (name, q) => name -> q.fn }: _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (name, Q(_, Some(sql))) => name -> sql }.toMap
}
