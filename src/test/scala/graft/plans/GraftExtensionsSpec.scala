package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.{Bigrams, PolyHash}
import graft.functions.TextFns

/** The SQL function surface must agree with the Column API it wraps. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate the native expressions") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq("one two three", "solo", "").toDF("text")
    docs.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT graft_poly_hash(text) AS h,
               graft_bigrams(split(trim(text), '\\s+')) AS g,
               graft_shingle_hashes(split(trim(text), '\\s+')) AS sh
        FROM ext_docs""").collect()
    val viaCol = docs.select(
      PolyHash(col("text")).as("h"),
      Bigrams(TextFns.tokens(col("text"))).as("g"),
      graft.expressions.ShingleHashes(TextFns.tokens(col("text"))).as("sh")).collect()
    assert(viaSql.toSeq == viaCol.toSeq)

    val dot = spark.sql(
      "SELECT graft_vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d").as[Double].head()
    assert(dot == 11.0)

    val viaSqlGrams = spark.sql(
      "SELECT graft_gram_hashes(split(trim(text), '\\\\s+'), 2) AS gh FROM ext_docs")
      .as[Seq[Long]].collect().toSeq
    val viaColGrams = docs.select(
      graft.expressions.GramHashes(TextFns.tokens(col("text")), 2).as("gh"))
      .as[Seq[Long]].collect().toSeq
    assert(viaSqlGrams == viaColGrams)
    // non-literal k must fail loudly, not silently misparse
    val err = intercept[Exception](spark.sql(
      "SELECT graft_gram_hashes(split(text, ' '), length(text)) FROM ext_docs").collect())
    assert(err.getMessage.toLowerCase.contains("literal"))

    // bloom build + probe entirely in SQL: every inserted value is a member
    spark.range(100).selectExpr("id * 7 AS v").createOrReplaceTempView("ext_vals")
    val missing = spark.sql(
      """SELECT count(*) FROM ext_vals,
              (SELECT graft_bloom_agg(v, 4096, 5) AS f FROM ext_vals)
        WHERE NOT graft_bloom_contains(f, v, 5)""").as[Long].head()
    assert(missing == 0L)
  }

  test("extensions class injects the same functions at session build") {
    // The JVM-wide test session already exists, so exercise the injector
    // directly against a fresh SparkSessionExtensions instance.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)  // must not throw; registration list is shared
    assert(GraftExtensions.functions.map(_._1).toSet ==
      Set("graft_poly_hash", "graft_shingle_hashes", "graft_bigrams", "graft_vec_dot",
        "graft_gram_hashes", "graft_bloom_agg", "graft_bloom_contains",
        "graft_morton2"))
  }
}
