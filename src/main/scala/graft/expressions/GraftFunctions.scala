package graft.expressions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the native expressions, so spark.sql text
  * can call them alongside the Column API:
  *
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_poly_hash(text), graft_vec_dot(e, e) FROM t")
  *
  * Idempotent per session (createOrReplace). The single source of truth for
  * the function list is [[graft.plans.GraftExtensions.functions]] — this is
  * the live-session convenience alias of the same registry.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    graft.plans.GraftExtensions.register(spark)
}
