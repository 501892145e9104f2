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
    * is a single `LogicalRDD`); returns the same data with the
    * carried statistic replaced by the TRUE materialized block size
    * from the block manager. Clearing the statistic outright is NOT
    * enough: a stats-less `LogicalRDD` reports `defaultSizeInBytes`
    * (effectively infinite), which forbids broadcast planning for the
    * small per-round frames these loops join — measured +30% on the
    * coloring loop. The checkpoint's blocks are already materialized,
    * so their exact size is a free lookup; it is bounded by the data
    * (no round-over-round product) AND keeps broadcast decisions
    * honest. Falls back to no statistic (flat default) when the
    * storage info is not yet visible, and to the external-Row rebuild
    * for any non-LogicalRDD plan. */
  def resetStats(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val session = classic.sparkSession.asInstanceOf[SparkSession]
    classic.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val measured = session.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize))
          .filter(_ > 0)
          .map(s => org.apache.spark.sql.catalyst.plans.logical
            .Statistics(sizeInBytes = s))
        Dataset.ofRows(session, new LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          None)(session, measured, None))
      case _ =>
        session.createDataFrame(classic.rdd, classic.schema)
    }
  }
}
