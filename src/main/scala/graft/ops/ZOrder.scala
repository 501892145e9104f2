package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * primitive behind Delta/Iceberg `ZORDER BY`: interleaving the bits of
  * two columns gives a 1-D sort key whose ranges are simultaneously
  * selective on BOTH dimensions, so min/max file statistics prune scans
  * for predicates on either column. At 100 TB this is how a table
  * serves two access paths without storing itself twice.
  *
  * Pure integer shift/mask arithmetic (no UDF, codegen-friendly), with
  * the SQL mirror emitted from the same bit schedule so the two sides
  * cannot drift.
  */
object ZOrder {

  /** 2×16-bit Morton interleave: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Inputs are masked to 16 bits. */
  def zkey16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      (shiftleft(shiftright(a.cast("long"), i) % 2, 2 * i) +
        shiftleft(shiftright(b.cast("long"), i) % 2, 2 * i + 1)).cast("long")
    }.reduce(_ + _)

  /** DuckDB mirror of [[zkey16]] (same bit schedule; `>>`/`%`/`<<` on
    * BIGINT behave identically for the non-negative keys used here). */
  def zkey16Sql(aExpr: String, bExpr: String): String =
    (0 until 16).map { i =>
      s"(((($aExpr) >> $i) % 2) << ${2 * i})" +
        s" + (((($bExpr) >> $i) % 2) << ${2 * i + 1})"
    }.mkString(" + ")
}
