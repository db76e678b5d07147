package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("native expressions are callable from SQL text after registration") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("spark hello there", Array(1.0f, 2.0f))).toDF("text", "v")
      .createOrReplaceTempView("gf_t")
    val row = spark.sql(
      """SELECT graft_poly_hash(text) AS h,
                graft_shingle_hashes(split(text, ' ')) AS sh,
                graft_vec_dot(v, v) AS d
         FROM gf_t""").head()
    val viaColumn = Seq("spark hello there").toDF("text")
      .select(PolyHash(col("text"))).as[Long].head()
    assert(row.getAs[Long]("h") == viaColumn)
    assert(row.getAs[scala.collection.Seq[Long]]("sh").length == 1)
    assert(row.getAs[Double]("d") == 5.0)
  }
}
