package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared rank/order shapes used by the sketch and CDF operators —
  * extracted so the subtle parts (bucket counts, tie-break order,
  * exclusive vs inclusive frames) cannot drift between copies.
  */
object Ranks {

  /** Two-phase k-min: the k smallest rows per `sideCol` by
    * (`hCol`, `tieCol`), computed without ever sorting one side's
    * whole domain in a single window partition. Phase 1 takes a
    * per-(side, hCol mod buckets) partial top-k (each partition sees
    * only its bucket's share); phase 2 runs the exact final window
    * over ≤ sides·buckets·k survivors. Correct because the global
    * k-min per side is a subset of the union of bucket k-mins.
    * Used by the KMV sketch builders (q92, q203). */
  def twoPhaseKMin(df: DataFrame, sideCol: String, hCol: String,
      tieCol: String, k: Int, buckets: Int = 64): DataFrame = {
    val wBkt = Window.partitionBy(col(sideCol), col("_bkt"))
      .orderBy(col(hCol), col(tieCol))
    val wFin = Window.partitionBy(col(sideCol))
      .orderBy(col(hCol), col(tieCol))
    df.withColumn("_bkt", pmod(col(hCol), lit(buckets.toLong)))
      .withColumn("_rn", row_number().over(wBkt))
      .filter(col("_rn") <= k)
      .drop("_rn", "_bkt")
      .withColumn("_rn", row_number().over(wFin))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Coarse-bucket prefix offsets for the distributed-CDF shape
    * (q76/q114): given per-bucket totals, the sum of every LOWER
    * bucket's totals — the offset each partitioned within-bucket
    * running sum adds to become a global cumulative. The triangular
    * join touches only the tiny bucket table. `sums` maps input total
    * columns to output offset names; `group` adds extra partition
    * keys (buckets compare only within the same group — the q299
    * per-segment CDF shape, composed by [[graft.ops.Cdf]]). */
  def prefixOffsets(grpTot: DataFrame, grpCol: String,
      sums: Seq[(String, String)],
      group: Seq[String] = Seq.empty): DataFrame = {
    val aggs = sums.map { case (in, out) =>
      coalesce(sum(col(s"h.$in")), lit(0L)).as(out)
    }
    val cond = group.map(g => col(s"h.$g") === col(s"g.$g"))
      .foldRight(col(s"h.$grpCol") < col(s"g.$grpCol"))(_ && _)
    val keys = group :+ grpCol
    grpTot.as("g")
      .join(grpTot.as("h"), cond, "left_outer")
      .groupBy(keys.map(k => col(s"g.$k").as(k)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
