package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Minimum spanning tree by Borůvka (1926) with randomized star
  * contraction — the log-round distributed MST (the formulation behind
  * Pregel/Giraph MST and the AKLSZ MapReduce line): each round every
  * component selects its minimum-weight out-edge (safe by the cut
  * property), and a contraction happens only on TAIL→HEAD coin pairs —
  * a deterministic per-(component, round) hash coin — so every merge is
  * ONE pointer hop and no chain of component labels ever forms (the
  * trap that would need an inner pointer-jumping loop). A constant
  * fraction of components merges per round in expectation, so rounds =
  * O(log n) w.h.p.; each round is two label joins + one per-component
  * min + one label update, all hash-partitioned — no step depends on
  * graph diameter, the property that survives 100 TB edge lists.
  *
  * Weights must come with the (w, a, b) lexicographic tie-break, which
  * makes the MST unique even under hash-weight collisions (a total
  * order on edges is all Borůvka needs).
  */
object Mst {

  private def coin(c: Column, round: Int): Column =
    pmod(Sampling.hash60("coin", c * 131 + round), lit(2L))

  /** Materialization barrier for the iterative loop. localCheckpoint
    * truncates the LINEAGE but carries the origin plan's sizeInBytes
    * statistic forward — and in a loop whose next round JOINS the
    * checkpointed frame, those statistics MULTIPLY round over round
    * (measured here: ×3 digits per round, megabyte-BigInteger stats
    * arithmetic on the driver and 85 s planning stalls by round 15).
    * Rebuilding the frame from the checkpointed RDD resets the
    * statistic to the flat default, so every round plans in constant
    * time. The Row round-trip is partition-local and vertex-sized —
    * the same order as the round's own join. */
  private def barrier(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(eager = true)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** Run Borůvka to convergence (no cross-component edge left).
    * `vertices` must select (v); `edges` (a, b, w) CANONICAL a < b,
    * one row per undirected edge. Returns the merge log
    * (round, a, b, w) — the MST edge set with the round that
    * contracted it. Fails loudly past `maxRounds`. */
  def boruvka(vertices: DataFrame, edges: DataFrame,
      maxRounds: Int = 96): DataFrame = {
    var comp = barrier(vertices.select(col("v"), col("v").as("c")))
    val ed = barrier(edges.select(col("a"), col("b"), col("w")))
    var out: DataFrame = null
    var r = 0
    var done = false
    val debug = sys.env.contains("GRAFT_MST_DEBUG")
    while (!done) {
      r += 1
      require(r <= maxRounds,
        s"Boruvka did not converge in $maxRounds rounds")
      val t0 = System.nanoTime()
      val ec = barrier(ed
        .join(comp.select(col("v").as("a"), col("c").as("ca")), "a")
        .join(comp.select(col("v").as("b"), col("c").as("cb")), "b")
        .filter(col("ca") =!= col("cb"))) // empty-test + both directions
      if (ec.limit(1).count() == 0) done = true
      else {
        val cand = ec.select(col("ca").as("cu"), col("cb").as("cv"),
            col("w"), col("a"), col("b"))
          .unionAll(ec.select(col("cb").as("cu"), col("ca").as("cv"),
            col("w"), col("a"), col("b")))
        val sel = cand.groupBy(col("cu"))
          .agg(min(struct(col("w"), col("a"), col("b"), col("cv")))
            .as("m"))
          .select(col("cu"), col("m.w").as("w"), col("m.a").as("a"),
            col("m.b").as("b"), col("m.cv").as("cv"))
        val merges = barrier(sel
          .filter(coin(col("cu"), r) === 0L &&
            coin(col("cv"), r) === 1L)) // label update + merge log
        comp = barrier(comp
          .join(merges.select(col("cu").as("c"), col("cv").as("nc")),
            Seq("c"), "left_outer")
          .select(col("v"), coalesce(col("nc"), col("c")).as("c")))
        val w = merges.select(lit(r.toLong).as("round"), col("a"),
          col("b"), col("w"))
        out = if (out == null) w else out.unionAll(w)
      }
      if (debug)
        println(f"MSTDEBUG round $r done=$done " +
          f"dt=${(System.nanoTime() - t0) / 1e9}%.2f " +
          s"statDigits=${comp.queryExecution.optimizedPlan.stats
            .sizeInBytes.toString.length}")
    }
    if (out == null)
      vertices.sparkSession.emptyDataFrame
        .select(lit(0L).as("round"), lit(0L).as("a"), lit(0L).as("b"),
          lit(0L).as("w")).limit(0)
    else out
  }

  /** DuckDB mirror of [[boruvka]] as UNROLLED round CTEs (the
    * q271-style replay: `rounds` must upper-bound the true round
    * count; converged rounds are no-ops). `verticesSql` selects (v),
    * `edgesSql` (a, b, w) canonical. Final CTE `mst` has
    * (round, a, b, w) — one row per contracted edge. */
  def boruvkaSql(verticesSql: String, edgesSql: String,
      rounds: Int): String = {
    def coinSql(c: String, r: Int): String =
      s"(${Sampling.hash60Sql("coin", s"$c * 131 + $r")} % 2)"
    val steps = (1 to rounds).map { r =>
      s"""ec$r AS (
         |  SELECT e.a, e.b, e.w, la.c AS ca, lb.c AS cb
         |  FROM mstEd e
         |  JOIN lab${r - 1} la ON la.v = e.a
         |  JOIN lab${r - 1} lb ON lb.v = e.b
         |  WHERE la.c <> lb.c),
         |sel$r AS (
         |  SELECT cu, cv, w, a, b FROM (
         |    SELECT cu, cv, w, a, b, ROW_NUMBER() OVER (
         |      PARTITION BY cu ORDER BY w, a, b) AS rn
         |    FROM (SELECT ca AS cu, cb AS cv, w, a, b FROM ec$r
         |          UNION ALL
         |          SELECT cb AS cu, ca AS cv, w, a, b FROM ec$r))
         |  WHERE rn = 1),
         |mg$r AS (
         |  SELECT cu, cv, w, a, b FROM sel$r
         |  WHERE ${coinSql("cu", r)} = 0 AND ${coinSql("cv", r)} = 1),
         |lab$r AS MATERIALIZED (
         |  SELECT l.v, COALESCE(m.cv, l.c) AS c
         |  FROM lab${r - 1} l LEFT JOIN mg$r m ON m.cu = l.c)"""
        .stripMargin
    }.mkString(",\n")
    val log = (1 to rounds)
      .map(r => s"SELECT $r AS round, a, b, w FROM mg$r")
      .mkString("\n  UNION ALL ")
    s"""mstV AS ($verticesSql),
       |mstEd AS MATERIALIZED ($edgesSql),
       |lab0 AS (SELECT v, v AS c FROM mstV),
       |$steps,
       |mst AS (
       |  $log)""".stripMargin
  }
}
