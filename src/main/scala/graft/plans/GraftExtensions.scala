package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{Bigrams, BloomAgg, BloomContains, GramHashes, MortonCode2, PolyHash, ShingleHashes, VecDot}

/** Session extension entry point: registers graft's native Catalyst
  * expressions as SQL functions, so the library's hot-path primitives are
  * callable from pure `spark.sql` text as well as the Column API.
  *
  * Two ways in:
  *  - cluster config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (applies at session build — the standard deployment path);
  *  - [[GraftExtensions.register]] on a live session (tests, notebooks).
  *
  * Besides the functions, ONE parser is injected ([[GraftSqlParser]]) for
  * the TXLOG maintenance statements; it delegates everything that is not a
  * TXLOG statement to Spark's parser verbatim. No custom optimizer rules or
  * strategies: every graft operator plans through Catalyst's existing
  * rules, and the native expressions carry their own codegen. Extension
  * scope stays minimal on purpose — the declarative plans are the
  * optimization surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(builder.getClass.getName, name),
        builder))
    }
    // TXLOG maintenance statements (OPTIMIZE/VACUUM/DESCRIBE HISTORY) — a
    // delegating parser, so standard SQL is never reinterpreted
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // `SELECT ... FROM txlog.`<path>[@vN]`` — resolves the two-part txlog
    // identifier to the log-backed file relation. Injected into the HINT
    // resolution slot (the analyzer batch that runs BEFORE resolution), not
    // the resolution slot: Spark's own ResolveSQLOnFile claims every
    // `<registered-source>.`path`` reference and hard-fails on V1 providers
    // ("unsupported data source type for direct query") before appended
    // resolution rules ever see the node — resolving the leaf one batch
    // earlier is the sanctioned way around it. Because this slot runs
    // BEFORE catalog resolution, the rule guards itself: it only fires on
    // the exact `txlog` head with a PATH-SHAPED second part (contains `/`),
    // so a real database named txlog keeps resolving its tables normally.
    ext.injectHintResolutionRule(session => ResolveTxLogRelation(session))
  }
}

object GraftExtensions {
  private def unary(f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(e) => f(e)
    case args => throw new IllegalArgumentException(s"expected 1 argument, got ${args.length}")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_poly_hash" -> unary(PolyHash(_)),
    "graft_shingle_hashes" -> unary(ShingleHashes(_)),
    "graft_bigrams" -> unary(Bigrams(_)),
    "graft_vec_dot" -> { (args: Seq[Expression]) =>
      require(args.length == 2, s"expected 2 arguments, got ${args.length}")
      VecDot(args(0), args(1))
    },
    "graft_gram_hashes" -> { (args: Seq[Expression]) =>
      require(args.length == 2, s"expected 2 arguments (tokens, k), got ${args.length}")
      val k = args(1) match {
        case lit: org.apache.spark.sql.catalyst.expressions.Literal
            if lit.dataType == org.apache.spark.sql.types.IntegerType =>
          lit.value.asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"k must be an integer literal, got $other")
      }
      GramHashes(args(0), k)
    },
    "graft_bloom_agg" -> { (args: Seq[Expression]) =>
      require(args.length == 3,
        s"expected 3 arguments (value, numBits, numHashes), got ${args.length}")
      BloomAgg(args(0), intLit(args(1), "numBits"), intLit(args(2), "numHashes"))
        .toAggregateExpression()
    },
    "graft_bloom_contains" -> { (args: Seq[Expression]) =>
      require(args.length == 3,
        s"expected 3 arguments (filter, value, numHashes), got ${args.length}")
      BloomContains(args(0), args(1), intLit(args(2), "numHashes"))
    },
    "graft_morton2" -> { (args: Seq[Expression]) =>
      require(args.length == 2, s"expected 2 arguments, got ${args.length}")
      MortonCode2(args(0), args(1))
    })

  private def intLit(e: Expression, name: String): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal
        if lit.dataType == org.apache.spark.sql.types.IntegerType =>
      lit.value.asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Register all graft SQL functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftBridge.registerExpression(spark, name, builder)
    }
}
