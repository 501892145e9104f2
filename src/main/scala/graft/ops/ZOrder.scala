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

/** Hilbert-curve clustering keys — the alternative to [[ZOrder]] used by
  * e.g. Databricks liquid clustering: the Hilbert curve visits grid
  * cells so that CONSECUTIVE keys are always grid-adjacent (Morton order
  * jumps), which tightens per-file bounding boxes and therefore min/max
  * pruning. This is the classic iterative xy2d transform (one
  * rotate-and-accumulate step per bit level), emitted as engine-portable
  * SQL (`CASE`/`&`/`*` only — identical semantics in Spark SQL and
  * DuckDB) from a single level schedule so the two sides cannot drift.
  * Continuity and bijectivity of the transform are property-tested in
  * ScaleAlgoSpec, which pins the rotation conventions.
  */
object Hilbert {

  /** Per-level SQL steps for a `n`×`n` grid (n a power of two). Each
    * element is (rxExpr, ryExpr, dStep, xStep, yStep) over column names
    * (x, y, d, rx, ry); apply rx/ry first, then d/x/y simultaneously. */
  def levels(n: Int): Seq[(String, String, String, String, String)] = {
    require(n >= 2 && (n & (n - 1)) == 0, s"grid side $n not a power of 2")
    Iterator.iterate(n / 2)(_ / 2).takeWhile(_ > 0).toSeq.map { s =>
      (s"CASE WHEN (x & $s) <> 0 THEN 1 ELSE 0 END",
        s"CASE WHEN (y & $s) <> 0 THEN 1 ELSE 0 END",
        s"d + ${s.toLong * s} * (CASE WHEN rx = 1 AND ry = 1 THEN 2 " +
          "WHEN rx = 1 THEN 3 WHEN ry = 1 THEN 1 ELSE 0 END)",
        s"CASE WHEN ry = 0 AND rx = 1 THEN ${n - 1} - y " +
          "WHEN ry = 0 THEN y ELSE x END",
        s"CASE WHEN ry = 0 AND rx = 1 THEN ${n - 1} - x " +
          "WHEN ry = 0 THEN x ELSE y END")
    }
  }

  /** Apply the xy2d transform to a frame with integer columns (x, y) in
    * [0, n); adds column `d` (the Hilbert index) and restores x, y. */
  def withIndex(df: org.apache.spark.sql.DataFrame, n: Int)
      : org.apache.spark.sql.DataFrame = {
    val withD = levels(n).foldLeft(
      df.withColumn("d", lit(0L))
        .withColumn("x0", col("x")).withColumn("y0", col("y"))) {
      case (acc, (rx, ry, dStep, xStep, yStep)) =>
        acc.withColumn("rx", expr(rx)).withColumn("ry", expr(ry))
          .withColumn("d", expr(dStep))
          .withColumn("x1", expr(xStep)).withColumn("y1", expr(yStep))
          .drop("x", "y", "rx", "ry")
          .withColumnRenamed("x1", "x").withColumnRenamed("y1", "y")
    }
    withD.drop("x", "y")
      .withColumnRenamed("x0", "x").withColumnRenamed("y0", "y")
  }

  /** DuckDB mirror of [[withIndex]] as chained CTEs. `baseCte` must
    * expose columns (x, y) plus any carry-through columns named in
    * `carry`; the final CTE `hilb` has (x, y, d, carry...). */
  def sql(baseCte: String, n: Int, carry: Seq[String]): String = {
    val carryCols = (Seq("x0", "y0") ++ carry).mkString(", ")
    val steps = levels(n).zipWithIndex.map {
      case ((rx, ry, dStep, xStep, yStep), i) =>
        s"""ha$i AS (
           |  SELECT x, y, d, $carryCols, $rx AS rx, $ry AS ry
           |  FROM h$i),
           |h${i + 1} AS (
           |  SELECT ($xStep) AS x, ($yStep) AS y, ($dStep) AS d,
           |    $carryCols
           |  FROM ha$i)""".stripMargin
    }.mkString(",\n")
    val last = levels(n).size
    s"""h0 AS (
       |  SELECT x, y, CAST(0 AS BIGINT) AS d, x AS x0, y AS y0${
        if (carry.nonEmpty) ", " + carry.mkString(", ") else ""}
       |  FROM ($baseCte)),
       |$steps,
       |hilb AS (
       |  SELECT x0 AS x, y0 AS y, d${
        if (carry.nonEmpty) ", " + carry.mkString(", ") else ""}
       |  FROM h$last)""".stripMargin
  }
}
