package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family:
  *   - graft.queries.Relational — SURVEY §2.2–§2.7 relational ops
  *   - graft.queries.GraphQueries — traversal/closure ops (§2.3 J2/J4/J5)
  *   - graft.pipeline.* — training-data ops (dedup, similarity, text)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-field ranked search (SURVEY P3+O1) — the reference's most
    * user-visible query shape (codegraph query search).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_search_rank")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.QualityQueries.queries ++
      graft.queries.ApiQueries.queries ++
      graft.queries.RetrievalQueries.queries ++
      graft.queries.ProfilingQueries.queries ++
      graft.queries.AugmentQueries.queries ++
      graft.queries.StatQueries.queries ++
      graft.queries.IntegrityQueries.queries ++
      graft.queries.TrainPrepQueries.queries ++
      graft.queries.MetricQueries.queries ++
      graft.queries.LinkageQueries.queries ++
      graft.queries.ScaleQueries.queries ++
      graft.queries.SelectQueries.queries ++
      graft.queries.PlannerQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.ExtendedQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.QualityQueries.oracles ++
      graft.queries.ApiQueries.oracles ++
      graft.queries.RetrievalQueries.oracles ++
      graft.queries.ProfilingQueries.oracles ++
      graft.queries.AugmentQueries.oracles ++
      graft.queries.StatQueries.oracles ++
      graft.queries.IntegrityQueries.oracles ++
      graft.queries.TrainPrepQueries.oracles ++
      graft.queries.MetricQueries.oracles ++
      graft.queries.LinkageQueries.oracles ++
      graft.queries.ScaleQueries.oracles ++
      graft.queries.SelectQueries.oracles ++
      graft.queries.PlannerQueries.oracles
}
