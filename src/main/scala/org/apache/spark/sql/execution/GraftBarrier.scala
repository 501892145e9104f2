package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** The one `private[sql]` shim this library carries (the standard
  * Spark-package-object technique used by open-source Spark
  * extensions): rebuild a `localCheckpoint`ed frame's `LogicalRDD`
  * WITHOUT the origin plan's carried statistics.
  *
  * Why not `createDataFrame(cp.rdd, cp.schema)` (the round-10 first
  * cut): the external-Row rebuild resets the statistic but DROPS the
  * checkpoint's output partitioning and pays an InternalRow → Row →
  * InternalRow re-encode per round — measured 2× on q347's coloring
  * loop, whose per-round anti joins rode the checkpoint's hash
  * partitioning. Rebuilding the `LogicalRDD` node itself keeps the
  * materialized InternalRow RDD, the partitioning, and the ordering,
  * and clears ONLY `originStats` — so the optimizer falls back to the
  * flat `defaultSizeInBytes` instead of the round-over-round
  * multiplying product (the SCALING.md q344 trap).
  */
object GraftBarrier {

  /** `df` must be the result of `localCheckpoint` (its analyzed plan
    * is a single `LogicalRDD`); returns the same data with stats
    * cleared. Falls back to the external-Row rebuild for any other
    * plan shape rather than failing. */
  def resetStats(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val session = classic.sparkSession.asInstanceOf[SparkSession]
    classic.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        Dataset.ofRows(session, new LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          None)(session, None, None))
      case _ =>
        session.createDataFrame(classic.rdd, classic.schema)
    }
  }
}
