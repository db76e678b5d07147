package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Randomized model check of the two stats tests against row-by-row truth.
  *
  * The contract both sites skip by:
  *  - `mayContain` is an OVER-approximation: whenever ANY row of the file
  *    satisfies the predicate, it must answer true (a false negative here
  *    is a wrongly skipped file = silent wrong answer);
  *  - `mustMatchAll` is an UNDER-approximation: whenever it answers true,
  *    EVERY row (nulls included) must satisfy the predicate (a false
  *    positive here is a whole-file drop that erases live rows).
  *
  * The model: random small files of nullable longs, per-file stats derived
  * exactly as stageFiles records them (min/max of the non-null values as
  * strings + a null count), random predicates over the supported shapes
  * PLUS deliberately-unsupported ones (arithmetic on the attribute), and
  * ground truth = Catalyst's own eval with the attribute substituted by
  * each row's literal. 2,000 seeded iterations — deterministic, no Spark
  * session (driver-side interpreted eval, exactly how the production sites
  * run it). */
class StatsSkippingSpec extends AnyFunSuite {

  private val attr = AttributeReference("k", LongType, nullable = true)()
  private val tz = "UTC"

  private def leaf(r: scala.util.Random): Expression = {
    def l = Literal(r.between(-5L, 15L))
    r.nextInt(9) match {
      case 0 => EqualTo(attr, l)
      case 1 => EqualTo(l, attr)
      case 2 => GreaterThan(attr, l)
      case 3 => GreaterThan(l, attr)
      case 4 => LessThan(attr, l)
      case 5 => LessThanOrEqual(attr, l)
      case 6 => GreaterThanOrEqual(attr, l)
      case 7 => In(attr, Seq(l, l))
      case 8 => IsNotNull(attr)
    }
  }

  // a shape the matchers do NOT understand: both tests must stay
  // conservative on it (keep for pruning, refuse for whole-file proofs)
  private def unknownLeaf(r: scala.util.Random): Expression =
    EqualTo(Add(attr, Literal(1L)), Literal(r.between(-5L, 15L)))

  private def gen(r: scala.util.Random, depth: Int): Expression =
    if (depth == 0 || r.nextInt(3) == 0) {
      if (r.nextInt(6) == 0) unknownLeaf(r) else leaf(r)
    } else if (r.nextBoolean()) And(gen(r, depth - 1), gen(r, depth - 1))
    else Or(gen(r, depth - 1), gen(r, depth - 1))

  /** Ground truth for one row: the predicate with the attribute replaced by
    * the row's value, evaluated by Catalyst itself. */
  private def rowSatisfies(e: Expression, v: Option[Long]): Boolean =
    e.transform {
      case a: AttributeReference if a.name == "k" =>
        Literal.create(v.map(Long.box).orNull, LongType)
    }.eval() == true

  test("mayContain over-approximates and mustMatchAll under-approximates, 2000 random cases") {
    val r = new scala.util.Random(42)
    var provenAll = 0
    var anyHit = 0
    for (iter <- 0 until 2000) {
      val n = 1 + r.nextInt(5)
      val values: Seq[Option[Long]] =
        Seq.fill(n)(if (r.nextInt(5) == 0) None else Some(r.between(-5L, 15L)))
      val nonNull = values.flatten
      // stats exactly as stageFiles records them: no entry when the column
      // is entirely null; null count rides the entry otherwise
      val stats: Map[String, (String, String)] =
        if (nonNull.isEmpty) Map.empty
        else Map("k" -> ((nonNull.min.toString, nonNull.max.toString)))
      val nulls: Map[String, Long] =
        if (nonNull.isEmpty) Map.empty
        else Map("k" -> values.count(_.isEmpty).toLong)
      val pred = gen(r, 2)
      val truth = values.map(v => rowSatisfies(pred, v))
      val may = StatsSkipping.mayContain(stats, pred, tz)
      val all = StatsSkipping.mustMatchAll(stats, nulls, pred, tz)
      if (truth.exists(identity)) {
        anyHit += 1
        assert(may,
          s"iter $iter: mayContain=false but a row satisfies $pred on $values")
      }
      if (all) {
        provenAll += 1
        assert(truth.forall(identity),
          s"iter $iter: mustMatchAll=true but some row fails $pred on $values")
      }
    }
    // the proofs must actually FIRE on this domain, or the test is vacuous
    assert(anyHit > 500, s"degenerate generator: only $anyHit any-hit cases")
    assert(provenAll > 50,
      s"mustMatchAll never proves anything on this domain ($provenAll) — " +
        "the whole-file delete path would be dead code")
  }
}
