package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters so graft
  * can expose native Catalyst expressions as ordinary Columns (the classic
  * extension-library pattern). Scope limited to exactly these two calls.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → Catalyst conversion: `expression` can return a lazy
    * `ColumnNodeExpression` LEAF (the whole ColumnNode tree opaque inside
    * it, deferred to analysis) — useless for tree surgery. This runs the
    * classic converter NOW, yielding real `UnresolvedAttribute` /
    * `UnresolvedFunction` catalyst nodes a `transformUp` can rewrite. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a native expression under a SQL function name in this session,
    * making it callable from spark.sql text. */
  def registerExpression(
      spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "internal")

  /** Rebind a V1 streaming Sink's per-batch DataFrame (which wraps the
    * engine's IncrementalExecution and must not be re-analyzed — any
    * DataFrame-writer call on it fails with "streaming sources must be
    * executed with writeStream") into an ordinary BATCH DataFrame over the
    * already-planned rows: the executed RDD is wrapped verbatim, so no
    * recomputation, no re-analysis, same schema. The per-partition
    * `copy()` is required because Spark reuses `InternalRow` buffers. */
  def rebatch(data: Dataset[Row]): Dataset[Row] = {
    val ds = data.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd.map(_.copy()), ds.schema, isStreaming = false)
  }

  /** Wrap a source relation as a LogicalPlan node — the analyzer-rule
    * counterpart of `DataFrameReader.load` (LogicalRelation.apply is
    * `private[sql]`; this bridge is the one sanctioned crossing). */
  def logicalRelation(rel: org.apache.spark.sql.sources.BaseRelation):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    execution.datasources.LogicalRelation(rel)

  /** Analyze + wrap a LogicalPlan as a DataFrame — the command-side
    * counterpart of `spark.sql` for a plan captured BEFORE analysis (an
    * INSERT command defers its source query to run time; `Dataset.ofRows`
    * is `private[sql]`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
