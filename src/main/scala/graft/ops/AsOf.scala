package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — the canonical operator relational engines
  * bolt on for event/state alignment ("the latest right row at or
  * before each left row's time, per key").
  *
  * Implemented by composition (SURVEY §7.3 disposition (a)): tag both
  * inputs, union, and carry the payload forward with a
  * last(ignoreNulls) window — ONE hash shuffle on the key, state
  * bounded per key, no time-range join explosion. This is the shape
  * that survives 100 TB: a range join would replicate rows per
  * candidate window; the union+window form streams each partition once
  * in time order.
  */
object AsOf {

  /** For each left row, attach the right `payload` with the greatest
    * right `time` ≤ the left row's `time` for the same `key` (NULL when
    * no prior right row exists — filter for inner semantics).
    *
    * Both inputs must expose `key` and `time` under the same names;
    * `right` additionally exposes `payload`. Ties: a right row at
    * exactly the left row's time matches (≤); multiple right rows at
    * the same (key, time) resolve to the greatest payload — mirror
    * with a max-per-(key,time) pre-dedup when comparing against
    * engines whose ASOF tie behavior is unspecified.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      time: String, payload: String): DataFrame = {
    // a left-side column named like the payload would alias into the
    // payload slot and make every left row "match itself" — fail fast
    require(!left.columns.contains(payload),
      s"left input must not contain the payload column '$payload'")
    Seq("_kind", "_asof").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"inputs must not contain the reserved column '$c'")
    }
    // a right row with a NULL time would sort first (ascending
    // nulls-first) and carry its payload forward to every left row of
    // the key — a match true as-of semantics (and e.g. DuckDB ASOF
    // JOIN) excludes. Drop them; null keys partition separately and
    // only ever meet null-key left rows, which is the same no-match.
    val r0 = right.select(col(key), col(time), col(payload))
      .filter(col(time).isNotNull)
      .withColumn("_kind", lit(0))
    val l0 = left.withColumn("_kind", lit(1))
    val u = l0.unionByName(r0, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_kind"), col(payload))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof", last(col(payload), ignoreNulls = true).over(w))
      .filter(col("_kind") === 1)
      .drop("_kind", payload)
      .withColumnRenamed("_asof", payload)
  }
}
