package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scaling-evidence generator must not manufacture fake workload
  * structure — BASELINE.md's sf0.1→sf1→sf10 tables rest on these properties.
  */
class GenScaleSpec extends SparkSpec {

  private lazy val dir = {
    val out = "target/genscale-spec/sf12x"
    GenScale.generate(spark, sf("sf0.001"), out, copies = 12)
    out
  }

  test("keys are re-based per copy: counts scale, referential integrity holds") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val n0 = spark.read.parquet(sf("sf0.001") + "/orders.parquet").count()
    assert(orders.count() == 12 * n0)
    assert(orders.select("o_orderkey").distinct().count() == orders.count(),
      "order keys must stay unique across copies")
    val dangling = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"), "left_anti").count()
    assert(dangling == 0, "every copied order must resolve to a customer in its copy")
  }

  test("document texts are distinct across ALL copies (incl. the 2nd-alphabet range i>=10)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    // duplicate RATIO must be preserved: distinct texts scale by exactly the
    // copy count (verbatim cross-copy clones would make this < 12x and fake
    // K^2 near-dup pairs; a non-injective transform would collapse
    // within-copy duplicate structure and make it drift either way)
    assert(docs.select("text").distinct().count() ==
      12 * base.select("text").distinct().count())
    // length preserved (rotation, not substitution noise)
    assert(docs.filter(col("doc_id") < 1000).select(sum(length(col("text")))).head().getLong(0) ==
      base.select(sum(length(col("text")))).head().getLong(0))
  }

  test("embedding sign flip is orthogonal: within-copy dot products bit-identical") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val k = 10000000000L
    // dot(Sx, Sy) = dot(x, y) exactly in IEEE754: the +/-1 factors cancel per
    // term before summation, order unchanged. Compare copy 0 and copy 11.
    def dots(offset: Long) = emb
      .filter(col("vec_id") >= offset && col("vec_id") < offset + 50)
      .select((col("vec_id") - offset).as("i"), col("embedding").as("e"))
      .as("a").join(emb
        .filter(col("vec_id") >= offset && col("vec_id") < offset + 50)
        .select((col("vec_id") - offset).as("j"), col("embedding").as("f")).as("b"),
        col("i") < col("j"))
      .select(col("i"), col("j"),
        graft.expressions.VecDot(col("e"), col("f")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val d0 = dots(0L)
    val d11 = dots(11L * k)
    assert(d0.nonEmpty && d0 == d11, "within-copy dot products must be exactly preserved")
  }
}
