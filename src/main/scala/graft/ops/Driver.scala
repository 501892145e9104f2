package graft.ops

import org.apache.spark.sql.{DataFrame, Row}

/** Loudly-bounded driver folds — the guard discipline behind the DP /
  * greedy / synopsis operators (V-optimal q331, Haar q348, Huffman
  * q356, Kaplan–Meier q318, PAVA q322, …) whose final step is exact
  * driver arithmetic over a POST-AGGREGATION frame that is bounded by
  * construction (value-domain cells, histogram buckets, code tables).
  *
  * The rule this encodes: a `collect()` in operator code is legal ONLY
  * when the collected frame has a construction-time bound, and the
  * bound must be CHECKED, not assumed — silently collecting an
  * unbounded frame is the classic driver-OOM at 100 TB. The check here
  * also protects the driver itself: the scan is capped at bound+1
  * rows, so even a wildly unbounded frame fails fast instead of
  * OOMing the driver before the assertion fires.
  */
object Driver {

  /** Collect `df` asserting it holds at most `maxRows` rows. Fails
    * loudly (naming `what`) on violation — after transferring at most
    * `maxRows + 1` rows, never the full frame. Ordering: a sorted `df`
    * collects in sort order (limit-after-sort folds to TakeOrdered);
    * an unsorted one has no order guarantee, same as bare collect. */
  def boundedCollect(df: DataFrame, maxRows: Int, what: String)
      : Array[Row] = {
    require(maxRows >= 1, s"$what: maxRows must be >= 1 (got $maxRows)")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: driver fold bound exceeded — more than $maxRows rows " +
        "reached collect(); the upstream aggregation no longer bounds " +
        "its output, which is a scale defect, not a tuning knob")
    rows
  }
}
