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
        // PINNED to Spark 4.1.x: positional LogicalRDD constructor
        // (6 primary + 3 curried args, verified against the shipped
        // spark-sql_2.13-4.1.2 jar); lr.stream and the origin
        // constraints are deliberately dropped (checkpoints are
        // batch, and constraints would re-derive the origin stats
        // problem). GraftBarrierSpec pins this shape so a Spark
        // upgrade that reshapes the constructor or stops analyzing
        // localCheckpoint to a bare LogicalRDD fails CI loudly
        // instead of silently degrading to the external-Row branch.
        Dataset.ofRows(session, new LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          None)(session, measured, None))
      case _ =>
        session.createDataFrame(classic.rdd, classic.schema)
    }
  }

  /** Spec probe (LogicalRDD is `private[sql]`, so graft-package tests
    * cannot pattern-match it directly): when `df`'s analyzed plan is a
    * single LogicalRDD, its (output attribute names, partitioning,
    * ordering) rendered as strings — the exact invariants
    * [[resetStats]] must preserve. None for any other plan shape,
    * which is the upgrade canary: a Spark version whose
    * `localCheckpoint` no longer analyzes to LogicalRDD would make
    * resetStats silently take the slow external-Row fallback. */
  def logicalRddShape(df: DataFrame): Option[(Seq[String], String, String)] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        Some((lr.output.map(_.name),
          lr.outputPartitioning.toString,
          lr.outputOrdering.map(_.sql).mkString(", ")))
      case _ => None
    }
}
