package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the co-located-join storage strategy for
  * fact⋈fact joins at 100 TB: tables bucketed (and sorted) on the join
  * key with the same bucket count join with NO shuffle and no sort;
  * the Parquet analog of the pre-partitioned layouts the bench's
  * big joins assume (see SCALING.md "Relational layer").
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
