package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.expressions.{BandKeys, Bigrams, GramHashes, MortonCode2, PolyHash, ShingleHashes, VecDot}
import graft.functions.TextFns

/** The native expressions must agree exactly with their composable
  * column-function twins (which in turn mirror the DuckDB oracle SQL). */
class ExpressionsSpec extends SparkSpec {
  private def samples[A](g: Gen[A], n: Int = 30): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
  import TextFns.P

  private def refPolyHash(s: String): Long = {
    var acc = 0L
    s.codePoints().toArray.foreach(cp => acc = (acc * 31 + cp) % P)
    acc
  }

  test("PolyHash matches the fold definition, incl. edge cases") {
    val samples = Seq("", "a", "spark", "hello world", "ünïcödé", "a b  c\t d", "0" * 500)
    import spark.implicits._
    val got = samples.toDF("s").select(PolyHash(col("s"))).as[Long].collect()
    assert(got.toSeq == samples.map(refPolyHash))
  }

  test("PolyHash property: range [0, P) and equality with reference fold") {
    samples(Gen.asciiPrintableStr, 100).foreach { s =>
      val h = refPolyHash(s)
      assert(h >= 0 && h < P)
    }
    import spark.implicits._
    val gen = samples(Gen.asciiPrintableStr, 50).toList
    val got = gen.toDF("s").select(PolyHash(col("s"))).as[Long].collect()
    assert(got.toSeq == gen.map(refPolyHash))
  }

  test("ShingleHashes matches the column-function composition") {
    import spark.implicits._
    val docs = Seq("one two three four five", "a b", "", "x y z", "w1 w2 w3 w4")
    val df = docs.toDF("text")
    val viaExpr = df.select(ShingleHashes(TextFns.tokens(col("text"))).as("h"))
      .as[Seq[Long]].collect()
    val viaFns = df.select(
      TextFns.shingleHashes3(TextFns.tokenHashes(TextFns.tokens(col("text")))).as("h"))
      .as[Seq[Long]].collect()
    assert(viaExpr.toSeq == viaFns.toSeq)
    assert(viaExpr(1).isEmpty && viaExpr(2).isEmpty) // <3 tokens → empty
    assert(viaExpr(0).length == 3)
  }

  test("GramHashes matches the fold-from-scratch HOF composition at several k") {
    import spark.implicits._
    val docs = Seq("one two three four five six seven eight nine ten",
      "a b c", "", "repeat repeat repeat repeat repeat",
      "w1 w2 w3 w4 w5 w6 w7 w8")
    val df = docs.toDF("text")
    val toks = TextFns.tokens(col("text"))
    def hofGrams(k: Int) = {
      val th = TextFns.tokenHashes(toks)
      def fold(sl: Column, mult: Long, mod: Long) =
        aggregate(sl, lit(0L), (a, h) => (a * mult + h) % mod)
      when(size(th) < k, array().cast("array<long>"))
        .otherwise(transform(sequence(lit(1), size(th) - (k - 1)),
          i => fold(slice(th, i, lit(k)), 31L, GramHashes.P1) * GramHashes.P2 +
            fold(slice(th, i, lit(k)), 37L, GramHashes.P2)))
    }
    for (k <- Seq(2, 3, 8)) {
      val viaExpr = df.select(GramHashes(toks, k).as("g")).as[Seq[Long]].collect()
      val viaHof = df.select(hofGrams(k).as("g")).as[Seq[Long]].collect()
      assert(viaExpr.toSeq == viaHof.toSeq, s"k=$k (rolling != fold-from-scratch)")
    }
    // shape: n-k+1 grams, none for short docs; identical windows hash equal
    val g8 = df.select(GramHashes(toks, 8).as("g")).as[Seq[Long]].collect()
    assert(g8(0).length == 3 && g8(1).isEmpty && g8(2).isEmpty && g8(4).length == 1)
    val rep = df.select(GramHashes(toks, 2).as("g")).as[Seq[Long]].collect()(3)
    assert(rep.distinct.length == 1, "identical 2-gram windows must collide")
  }

  test("Bigrams property: matches a Scala reference on random token arrays") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const("ü"), Gen.const("")))
    val cases = samples(gen, 40).filter(_.nonEmpty)
    val df = cases.map(l => Tuple1(l)).toDF("toks")
    val got = df.select(Bigrams(col("toks")).as("g")).as[Seq[String]].collect()
    val want = cases.map(l =>
      if (l.length < 2) Seq.empty[String]
      else l.sliding(2).map(_.mkString(" ")).toSeq)
    assert(got.toSeq == want)
  }

  test("Bigrams matches the HOF composition, incl. edge cases") {
    import spark.implicits._
    val docs = Seq("one two three four", "solo", "", "a b", "x  y\tz")
    val df = docs.toDF("text")
    val toks = TextFns.tokens(col("text"))
    val viaExpr = df.select(Bigrams(toks).as("g")).as[Seq[String]].collect()
    val viaHof = df.select(
      when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))).as("g"))
      .as[Seq[String]].collect()
    assert(viaExpr.toSeq == viaHof.toSeq)
    assert(viaExpr(0) == Seq("one two", "two three", "three four"))
    assert(viaExpr(1).isEmpty && viaExpr(2).isEmpty)
    assert(viaExpr(4) == Seq("x y", "y z"))
  }

  test("VecDot matches the HOF dot product and oracle summation order") {
    import spark.implicits._
    val vs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(-0.3f, 0.4f)),
      (Array.empty[Float], Array.empty[Float]))
    val df = vs.toDF("a", "b")
    val viaExpr = df.select(VecDot(col("a"), col("b"))).as[Double].collect()
    val viaHof = df.select(graft.functions.VectorFns.dot(col("a"), col("b"))).as[Double].collect()
    assert(viaExpr.toSeq == viaHof.toSeq)
    assert(viaExpr(0) == (4.0 + 10.0 + 18.0))
  }

  test("BandKeys matches the per-band aggregate() HOF composition") {
    import spark.implicits._
    // Mixed signs/magnitudes plus a length-1 vector; same hyperplanes as
    // api.Similarity.hpSign, accumulated in the same index order.
    val vs = Seq(
      Array(0.5f, -1.25f, 3.0f, 0.25f, -0.75f, 2.5f),
      Array(-0.125f, 0.875f, -2.0f),
      Array(1.0f))
    val df = vs.map(Tuple1(_)).toDF("e")
    def hofKeys(nBands: Int, bits: Int) = {
      def bandKey(b: Int) = concat((bits * b until bits * (b + 1)).map { j =>
        val proj = aggregate(sequence(lit(1), size(col("e"))), lit(0.0),
          (acc, i) => acc + element_at(col("e"), i) * graft.api.Similarity.hpSign(j, i))
        when(proj > 0, lit("1")).otherwise(lit("0"))
      }: _*)
      array((0 until nBands).map(bandKey): _*)
    }
    for ((nb, bits) <- Seq((4, 4), (16, 8), (1, 3))) {
      val viaExpr = df.select(BandKeys(col("e"), nb, bits).as("k")).as[Seq[String]].collect()
      val viaHof = df.select(hofKeys(nb, bits).as("k")).as[Seq[String]].collect()
      assert(viaExpr.toSeq == viaHof.toSeq, s"geometry ($nb,$bits)")
      assert(viaExpr.forall(ks => ks.length == nb && ks.forall(_.length == bits)))
    }
  }

  test("MortonCode2 matches the bit-by-bit interleave reference") {
    // Reference: result bit 2i carries x bit i, bit 2i+1 carries y bit i —
    // the definition the magic-number spreading must reproduce.
    def ref(x: Long, y: Long): Long =
      (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val edge = Seq(0L, 1L, 2L, 3L, 255L, 256L, (1L << 30), (1L << 31) - 1)
    for (x <- edge; y <- edge)
      assert(MortonCode2.interleave(x, y) == ref(x, y), s"($x, $y)")
    val rng = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val x = rng.nextLong() & 0x7FFFFFFFL
      val y = rng.nextLong() & 0x7FFFFFFFL
      val z = MortonCode2.interleave(x, y)
      assert(z == ref(x, y), s"($x, $y)")
      assert(z >= 0L, "31-bit inputs must keep the code positive (sort order)")
    }
    // out-of-range inputs fail LOUDLY, never wrap into a corrupt layout key
    intercept[IllegalArgumentException](MortonCode2.interleave(1L << 31, 0L))
    intercept[IllegalArgumentException](MortonCode2.interleave(0L, -1L))
  }

  test("MortonCode2 column form agrees with the kernel, incl. via SQL registration") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (5L, 9L), (149L, 49002L), ((1L << 31) - 1, 7L))
    val df = rows.toDF("x", "y")
    val viaCol = df.select(MortonCode2(col("x"), col("y"))).as[Long].collect().toSeq
    assert(viaCol == rows.map { case (x, y) => MortonCode2.interleave(x, y) })
    graft.plans.GraftExtensions.register(spark)
    df.createOrReplaceTempView("mxy")
    val viaSql = spark.sql("SELECT graft_morton2(x, y) FROM mxy").as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("custom expressions: interpreted eval agrees with codegen") {
    // All four expressions route eval and doGenCode through one static
    // kernel, so divergence is impossible by construction — this guards the
    // construction: if someone inlines a tweaked kernel into doGenCode, the
    // codegen-disabled fallback (what Spark silently uses when a generated
    // method fails to compile) would start returning different values.
    import spark.implicits._
    def run(): Any = {
      val sdf = Seq("", "a", "hello world", "ünïcödé").toDF("s")
      val p = sdf.select(PolyHash(col("s"))).as[Long].collect().toSeq
      val docs = Seq("one two three four five", "a b", "").toDF("text")
      val sh = docs.select(ShingleHashes(TextFns.tokens(col("text"))))
        .as[Seq[Long]].collect().toSeq
      val bg = docs.select(Bigrams(TextFns.tokens(col("text"))))
        .as[Seq[String]].collect().toSeq
      val vs = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      val vd = vs.select(VecDot(col("a"), col("b"))).as[Double].collect().toSeq
      val bk = vs.select(BandKeys(col("a"), 4, 4)).as[Seq[String]].collect().toSeq
      val gh = docs.select(GramHashes(TextFns.tokens(col("text")), 3))
        .as[Seq[Long]].collect().toSeq
      val mc = Seq((5L, 9L), (149L, 49002L)).toDF("x", "y")
        .select(MortonCode2(col("x"), col("y"))).as[Long].collect().toSeq
      (p, sh, bg, vd, bk, gh, mc)
    }
    val underCodegen = run()
    val confs = Seq("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try assert(run() == underCodegen)
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("row fan-out conserves attack counts (P6 invariant)") {
    import spark.implicits._
    samples(Gen.listOfN(20, Gen.chooseNum(0, 16)), 5).foreach { sizes =>
      val df = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "n")
      val base = struct(lit("base").as("variant"), col("n").as("v"))
      val extra = when(col("n") > 8, struct(lit("extra").as("variant"), (col("n") - 8).as("v")))
      val out = df.select(col("id"), explode(array_compact(array(
          when(col("n") > 8, struct(lit("base").as("variant"), lit(8).as("v"))).otherwise(base),
          extra))).as("x"))
        .groupBy("id").agg(sum(col("x.v")).as("total"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      sizes.zipWithIndex.foreach { case (n, i) => assert(out(i.toLong) == n.toLong) }
    }
  }

  test("F11 list-literal codec round-trips") {
    import spark.implicits._
    val lists = Seq(Seq("Magic", "FollowUp"), Seq("Uncapped"), Seq.empty[String])
    val df = lists.map(l => l.mkString("['", "', '", "']")).map(s => if (s == "['']") "[]" else s)
      .toDF("txt")
    val parsed = df.select(graft.domain.Staging.listLiteral(col("txt")).as("a"))
      .as[Seq[String]].collect()
    assert(parsed(0) == Seq("Magic", "FollowUp") && parsed(2).isEmpty)
  }
}
