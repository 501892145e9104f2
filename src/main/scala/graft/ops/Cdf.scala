package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum over a value-keyed count table — the
  * "q76/q289 CDF shape" extracted from its hand-rolled call sites
  * (ntile q76, KS q210, Mann–Whitney q299, sequence packing q289, …):
  * coarse-bucket totals → triangular offset join over the TINY bucket
  * table ([[graft.pipeline.Ranks.prefixOffsets]]) → within-bucket
  * partitioned running-sum window. Never a global single-task window:
  * the only unpartitioned object is the bucket-totals table, whose
  * size is the value domain divided by the bucket width — independent
  * of row count, which is what lets the shape survive 100 TB.
  */
object Cdf {

  /** Add running-sum columns to `df`: for each row and each
    * (cntCol → outCol) in `cnts`, the sum of cntCol over rows of the
    * same `group` with smaller `value` — `inclusive` adds the row's
    * own count (CDF at v) vs the strict prefix (CDF below v). `df`
    * must hold ONE row per (group, value) — a count table, not raw
    * rows — and already carry a monotone bucket column `bucket`
    * (e.g. `value div 4096`; kept caller-side because value types
    * differ: cents, decimals, ranks). Window partitions are
    * (group, bucket): bounded by the bucket's value range, never by
    * data volume; the offset-table broadcast is value-domain-sized by
    * the same argument. */
  def prefixSum(df: DataFrame, group: Seq[String], bucket: String,
      value: String, cnts: Seq[(String, String)],
      inclusive: Boolean): DataFrame = {
    require(cnts.nonEmpty, "prefixSum needs >= 1 count column")
    val keys = group :+ bucket
    val totAggs = cnts.map { case (c, _) => sum(col(c)).as(s"__t_$c") }
    val btot = df.groupBy(keys.map(col): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val offs = graft.pipeline.Ranks.prefixOffsets(btot, bucket,
      cnts.map { case (c, out) => s"__t_$c" -> s"__off_$out" }, group)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(value))
    val withOffs = df.join(broadcast(offs), keys)
    val cumd = cnts.foldLeft(withOffs) { case (acc, (c, out)) =>
      val inBucket =
        if (inclusive)
          sum(col(c)).over(w.rowsBetween(Window.unboundedPreceding, 0))
        else
          coalesce(sum(col(c))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L))
      acc.withColumn(out, col(s"__off_$out") + inBucket)
    }
    cumd.drop(cnts.map { case (_, out) => s"__off_$out" }: _*)
  }

  /** Single-count convenience form. */
  def prefixSum(df: DataFrame, group: Seq[String], bucket: String,
      value: String, cnt: String, out: String,
      inclusive: Boolean): DataFrame =
    prefixSum(df, group, bucket, value, Seq(cnt -> out), inclusive)
}
