package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality in INTEGER arithmetic — rank functions/services by
  * call centrality (the "what is load-bearing" query over a code
  * property graph) with results that are bit-identical on any engine.
  *
  * Floating-point PageRank sums per-edge contributions in partition
  * order, so two runs of the same job can disagree in the last ulp —
  * unacceptable for a correctness-gated pipeline. Here ranks are ppm
  * integers and every step is add/multiply/floor-div: synchronized
  * iterations produce exactly one answer everywhere (and the fixed
  * iteration count unrolls into plain SQL CTEs for the oracle).
  */
object Centrality {

  /** Integer PageRank over `edges(src, dst)`: damping 0.85 in ppm,
    * `iters` synchronized iterations from a uniform 10⁶ start.
    *
    *   r₀(v)    = 10⁶
    *   rₖ₊₁(v) = 150000 + (850000 · Σ_{(u,v)∈E} (rₖ(u) div outdeg(u)))
    *              div 10⁶
    *
    * Dangling nodes (no out-edges) leak rank mass — the standard
    * simplification, applied identically by any mirror. Returns
    * (id, rank_ppm).
    *
    * Scale shape: one join per iteration keyed on the edge endpoint
    * (partial-aggregated), outdeg computed once and broadcast-joined.
    * Unlike the traversal loops (whose frontier feeds TWO consumers and
    * must materialize per level), each rank is consumed exactly once by
    * the next iteration — so iterations chain LAZILY into one job, and
    * a localCheckpoint barrier is inserted only every few iterations to
    * bound plan-analysis depth on long runs.
    */
  def pageRankInteger(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters ($iters) out of the sane unrolled range")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(eager = true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(eager = true)
    var rank = nodes.withColumn("rank_ppm", lit(1000000L))
    for (i <- 1 to iters) {
      val contrib = e
        .join(broadcast(deg), Seq("src"))
        .join(rank.select(col("id").as("src"), col("rank_ppm")), Seq("src"))
        .select(col("dst").as("id"),
          expr("rank_ppm div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      rank = nodes.join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          expr("150000 + (850000 * coalesce(s, 0L)) div 1000000")
            .as("rank_ppm"))
      if (i % 8 == 0) rank = rank.localCheckpoint(eager = true)
    }
    rank
  }

  /** The SQL mirror: the same iterations unrolled as chained CTEs.
    * `edgesSql` must select (src, dst). Emitted for oracle use so the
    * two sides cannot drift in formula shape. */
  def pageRankIntegerSql(edgesSql: String, iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    150000 + (850000 * COALESCE(SUM(p.rank_ppm // deg.outdeg),
         |      0)) // 1000000 AS rank_ppm
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.id
         |  LEFT JOIN deg ON deg.src = e.src
         |  LEFT JOIN r${k - 1} p ON p.id = e.src
         |  GROUP BY n.id)""".stripMargin
    }.mkString(",\n")
    s"""edges AS ($edgesSql),
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT id FROM
       |  (SELECT src AS id FROM edges UNION SELECT dst FROM edges)),
       |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_ppm FROM nodes),
       |$steps""".stripMargin
  }
}
