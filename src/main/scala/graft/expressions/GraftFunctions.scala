package graft.expressions

import org.apache.spark.sql.{GraftBridge, SparkSession}

/** SQL-surface registration for the native expressions, so spark.sql text
  * can call them alongside the Column API:
  *
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_poly_hash(text), graft_vec_dot(e, e) FROM t")
  *
  * Idempotent per session (createOrReplace).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    GraftBridge.registerExpression(spark, "graft_poly_hash",
      args => PolyHash(args.head))
    GraftBridge.registerExpression(spark, "graft_shingle_hashes",
      args => ShingleHashes(args.head))
    GraftBridge.registerExpression(spark, "graft_vec_dot",
      args => VecDot(args(0), args(1)))
  }
}
