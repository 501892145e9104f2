package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global ordinal — the "q262 discipline" extracted from
  * its hand-rolled call sites (suffix doubling q262, sorted
  * neighborhood q277, epoch shuffle q324, Zipf/vocab ranks
  * q333/q342/…): `repartitionByRange` on the sort key, partition-local
  * sort, `zipWithIndex`. A plain distributed sort — NEVER the
  * single-task global `row_number()` window that serializes the whole
  * input through one executor. `zipWithIndex` indexes by (partition,
  * offset) and range partitions are ordered, so the ordinal is the
  * global 1-based rank under the sort key at any scale.
  */
object Rank {

  /** Append 1-based global ordinal `rankCol` to `df`, ordered by
    * `sortCols`. `sortCols` MUST totally order the rows (append a
    * unique id as the last key) — under ties the ordinal would be
    * partition-placement-dependent and oracle comparison breaks.
    * `numParts` sizes the range partitioning (the repo convention is
    * the session's shuffle parallelism, 32). */
  def globalOrdinal(df: DataFrame, rankCol: String, numParts: Int,
      sortCols: Column*): DataFrame = {
    require(sortCols.nonEmpty, "globalOrdinal needs >= 1 sort column")
    val sorted = df.repartitionByRange(numParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
