package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialization barrier for iterative DataFrame loops (Pregel-style
  * fixpoints: MST, SALSA, HITS, power iteration, LPA, coloring,
  * matching).
  *
  * `localCheckpoint` truncates the LINEAGE but carries the origin
  * plan's `sizeInBytes` statistic forward — and in a loop whose next
  * round JOINS the checkpointed frame, those statistics MULTIPLY round
  * over round (measured in SCALING.md: ×3 digits per round,
  * megabyte-BigInteger statistics arithmetic on the driver and 85 s
  * planning stalls by round 15 of the q344 loop). Rebuilding the frame
  * from the checkpointed RDD resets the statistic to the flat
  * `defaultSizeInBytes`, so every round plans in constant time. The
  * Row round-trip is partition-local and costs the same order as the
  * round's own join — no shuffle, no driver collect.
  *
  * Use this INSTEAD of a bare `localCheckpoint` whenever the
  * checkpointed frame is joined again inside the loop. For a terminal
  * materialization (result reused by several downstream aggregations,
  * never re-joined iteratively) a bare `localCheckpoint` is fine and
  * one plan-rebuild cheaper.
  */
object Iterate {

  /** Materialize `df` eagerly and return a frame with TRUNCATED
    * lineage and RESET statistics (flat default `sizeInBytes`) —
    * KEEPING the checkpoint's internal row format, partitioning, and
    * ordering (see [[org.apache.spark.sql.execution.GraftBarrier]]:
    * the naive external-Row rebuild also resets the statistic, but
    * drops the partitioning and re-encodes every row — measured 2× on
    * the q347 coloring loop whose per-round anti joins ride the
    * checkpoint's hash partitioning). */
  def barrier(df: DataFrame): DataFrame =
    org.apache.spark.sql.execution.GraftBarrier.resetStats(
      df.localCheckpoint(eager = true))

  /** `.barrier` as a chainable drop-in for an in-loop
    * `.localCheckpoint(eager = true)`. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier: DataFrame = Iterate.barrier(df)
  }

  /** Decimal digit count of the optimized plan's `sizeInBytes` stat —
    * the probe behind the MSTDEBUG finding, exposed so specs can
    * assert the statistic stays FLAT across rounds (a loop whose digit
    * count grows round-over-round has the multiplication trap). */
  def statDigits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length
}
