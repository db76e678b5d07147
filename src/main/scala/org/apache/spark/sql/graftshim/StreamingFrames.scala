/** The ONE deliberate use of Spark's `private[sql]` surface in this library.
  *
  * A V1 streaming source's `getBatch` must return a DataFrame whose logical
  * plan is flagged `isStreaming = true` — MicroBatchExecution asserts it —
  * and that flag is only settable through `private[sql]` constructors
  * (`Dataset.ofRows`, `LogicalRelation.copy`, `LocalRelation`). Spark's own
  * FileStreamSource does exactly what this shim does (FileStreamSource
  * builds its batch as a LogicalRelation with `isStreaming = true` and wraps
  * it via `Dataset.ofRows`); third-party V1 sources conventionally bridge
  * from a file in the `org.apache.spark.sql` namespace, which is what this
  * is. Everything here is structural plan re-tagging — no behavior, no data
  * movement — and it is the entire private-API footprint of
  * [[graft.sources.TxLogStreamSource]].
  */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

object StreamingFrames {

  /** Re-tag a BATCH file-scan DataFrame as a streaming one (the plan's
    * relation leaves get `isStreaming = true`), so a V1 `Source.getBatch`
    * can serve it. The plan itself is unchanged — pushdown, pruning and
    * codegen behave exactly as in the batch read. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSparkSession]
    val tagged = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
      case loc: LocalRelation if !loc.isStreaming =>
        loc.copy(isStreaming = true)
    }
    require(tagged.isStreaming,
      s"could not re-tag plan as streaming (unexpected leaf): ${df.queryExecution.analyzed}")
    ClassicDataset.ofRows(spark, tagged)
  }

  /** Re-tag ONLY the FILE-relation leaves as streaming, leaving
    * LocalRelation leaves (driver-built broadcast maps, e.g. the change
    * feed's file→version attribution frames) as batch sides: the result
    * plans as stream-static joins, which the unsupported-operations
    * checker admits — tagging both sides would spell stream-stream join
    * and be rejected. Returns None when the plan has no file leaf (an
    * empty feed range — serve [[emptyStreaming]] instead). */
  def asStreamingFiles(df: DataFrame): Option[DataFrame] = {
    val spark = df.sparkSession.asInstanceOf[ClassicSparkSession]
    val tagged = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
    }
    if (!tagged.isStreaming) None
    else Some(ClassicDataset.ofRows(spark, tagged))
  }

  /** An empty streaming-tagged DataFrame of `schema` — the no-new-files
    * micro-batch. */
  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      new LocalRelation(DataTypeUtils.toAttributes(schema),
        Seq.empty[InternalRow], true, None))
}
