package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Random-walk corpus generation (DeepWalk, Perozzi et al. 2014): the
  * node "sentences" graph-embedding training feeds on. Classic walkers
  * draw the next hop from an RNG; here the choice is a HASH-ARGMIN —
  * step t of walk w moves to the neighbour minimizing
  * hash60("rw<t>:<w>:<nbr>") — which keeps the hop distribution
  * uniform-ish over neighbours while making every walk a pure function
  * of (graph, walk_id): reproducible across engines, partitionings and
  * reruns, and therefore DuckDB-oracle-able. All walks advance together
  * in bulk — one walks⋈edges shuffle plus one argmin aggregation per
  * step, never a per-walk loop — so the cost is O(steps · Σdeg(cur)),
  * independent of walk count on the driver.
  */
object Walks {

  /** `edges` (src, dst) is symmetrized (undirected walk space,
    * self-loops dropped). Walks start at every node satisfying
    * `startPred` (over column `id`) and take `steps` hops; a node with
    * no neighbours holds its position (the walk just stops extending).
    * Returns (walk_id, final_node, path) with path like "9->4->2". */
  def deterministicWalks(edges: DataFrame, startPred: Column,
      steps: Int): DataFrame = {
    require(steps >= 1 && steps <= 12,
      s"steps ($steps) out of the sane unrolled range")
    val raw = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val sym = raw
      .unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .repartition(col("src")).localCheckpoint(eager = true)
    var walks = graft.ops.Iterate.barrier(
      sym.select(col("src").as("id")).distinct()
        .filter(startPred)
        .select(col("id").as("walk_id"), col("id").as("cur"),
          col("id").cast("string").as("path")))
    for (t <- 1 to steps) {
      val cand = walks.select(col("walk_id"), col("cur"))
        .join(sym, col("cur") === col("src"))
        .select(col("walk_id"), col("dst"),
          Sampling.hash60(s"rw$t",
            concat(col("walk_id").cast("string"), lit(":"),
              col("dst").cast("string"))).as("h"))
      val pick = cand.groupBy(col("walk_id"))
        .agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("walk_id"), col("m.dst").as("nxt"))
      walks = graft.ops.Iterate.barrier(
        walks.join(pick, Seq("walk_id"), "left_outer")
          .select(col("walk_id"),
            coalesce(col("nxt"), col("cur")).as("cur"),
            when(col("nxt").isNotNull,
              concat(col("path"), lit("->"), col("nxt").cast("string")))
              .otherwise(col("path")).as("path")))
    }
    walks.select(col("walk_id"), col("cur").as("final_node"), col("path"))
  }

  /** SQL mirror of [[deterministicWalks]] — unrolled hop CTEs; the
    * final CTE is `w<steps>` with (walk_id, cur, path). `edgesSql` must
    * select (src, dst); `startPredSql` is a boolean over `id`. */
  def deterministicWalksSql(edgesSql: String, startPredSql: String,
      steps: Int): String = {
    val stepsSql = (1 to steps).map { t =>
      val h = Sampling.hash60Sql(s"rw$t",
        "CAST(w.walk_id AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR)")
      s"""c$t AS (
         |  SELECT w.walk_id, e.dst, $h AS h
         |  FROM w${t - 1} w JOIN sym e ON e.src = w.cur),
         |p$t AS (
         |  SELECT walk_id, dst, ROW_NUMBER() OVER (
         |    PARTITION BY walk_id ORDER BY h, dst) AS rn
         |  FROM c$t),
         |w$t AS MATERIALIZED (
         |  SELECT w.walk_id, COALESCE(p.dst, w.cur) AS cur,
         |    CASE WHEN p.dst IS NOT NULL
         |      THEN w.path || '->' || CAST(p.dst AS VARCHAR)
         |      ELSE w.path END AS path
         |  FROM w${t - 1} w
         |  LEFT JOIN (SELECT walk_id, dst FROM p$t WHERE rn = 1) p
         |    ON p.walk_id = w.walk_id)""".stripMargin
    }.mkString(",\n")
    s"""raw AS ($edgesSql),
       |sym AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM raw
       |    UNION ALL SELECT dst, src FROM raw)
       |  WHERE src <> dst),
       |w0 AS (
       |  SELECT id AS walk_id, id AS cur, CAST(id AS VARCHAR) AS path
       |  FROM (SELECT DISTINCT src AS id FROM sym)
       |  WHERE $startPredSql),
       |$stepsSql""".stripMargin
  }
}
