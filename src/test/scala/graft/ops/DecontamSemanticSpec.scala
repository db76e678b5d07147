package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Decontaminate.semanticFlags edge cases the catalog entry's oracle can't
  * isolate: empty benchmark, self-flagging, and the exact-τ boundary. */
class DecontamSemanticSpec extends SparkSpec {

  private def vecs(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("empty benchmark flags nothing; every corpus row still gets a zero row") {
    val corpus = vecs(1L -> Array(1f, 0f), 2L -> Array(0f, 1f))
    val bench = vecs().filter(col("vec_id") < 0)
    val got = Decontaminate.semanticFlags(corpus, "vec_id", "embedding",
        bench, "embedding", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 0L, false), (2L, 0L, false)))
  }

  test("a benchmark vector present in the corpus flags itself at cosine 1.0") {
    val shared = Array(0.6f, 0.8f)
    val corpus = vecs(1L -> shared, 2L -> Array(-1f, 0f))
    val bench = vecs(10L -> shared)
    val got = Decontaminate.semanticFlags(corpus, "vec_id", "embedding",
        bench, "embedding", tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got == Map(1L -> true, 2L -> false))
  }

  test("threshold is >= : a pair exactly at tau is flagged") {
    // cos((1,0),(1,1)/|.|) = 1/sqrt(2); pick tau = that exact double
    val tau = 1.0 / math.sqrt(2.0)
    val corpus = vecs(1L -> Array(1f, 0f))
    val bench = vecs(10L -> Array(1f, 1f))
    val got = Decontaminate.semanticFlags(corpus, "vec_id", "embedding",
        bench, "embedding", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 1L, "boundary cosine == tau must count as a hit")
  }

  test("n_hits counts every clearing benchmark vector, not just one") {
    val corpus = vecs(1L -> Array(1f, 0f))
    val bench = vecs(10L -> Array(2f, 0f), 11L -> Array(3f, 0.1f), 12L -> Array(0f, 1f))
    val got = Decontaminate.semanticFlags(corpus, "vec_id", "embedding",
        bench, "embedding", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 2L)
  }
}
