package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.Communities
import graft.pipeline.Dedup

/** Round-8 continuation tier — named at-scale algorithms, each the
  * distributed-by-construction form of an operation the reference's
  * single-node engine could only run in memory (`pkg/query/advanced.go`
  * ranks and groups what fits in one process; these are the shapes that
  * survive when the same questions are asked of 100 TB):
  *
  *   - q269 prefix-filtered all-pairs similarity join (AllPairs/PPJoin)
  *   - q271 Luby maximal independent set (fixed priorities)
  *   - q272 bipartite butterfly counting (wedge aggregation)
  *
  * Determinism contract: all outputs integer-exact (counts, ×1000
  * fixed-point), every tie broken by a total order, every aggregate
  * CAST to BIGINT on the DuckDB side (SUM yields HUGEINT there).
  */
object ScaleQueries {

  // -------------------------------------------------------------------
  // q269 — prefix-filtered exact-threshold Jaccard self-join (Bayardo
  // 2007 "Scaling Up All Pairs Similarity Search"; Xiao 2008 PPJoin).
  // q23's inverted-list join pays Σ df² over the WHOLE vocabulary —
  // stopword lists explode it at corpus scale. The prefix filter
  // indexes only each doc's |x| − ⌈t·|x|⌉ + 1 RAREST tokens (global
  // df-ascending order), which is lossless for Jaccard ≥ t: a
  // qualifying pair must collide inside the prefix. The oracle computes
  // the naive all-pairs answer — a green row proves the pruned plan
  // found EVERY pair. Threshold t = 0.9.
  // -------------------------------------------------------------------
  private val Thr269 = 900L

  def q269_prefix_filter_join(spark: SparkSession, dir: String)
      : DataFrame = {
    val sh = Dedup.shingleRows(Tables.documents(spark, dir),
      "doc_id", "text", 1)
    Dedup.prefixFilteredJaccardPairs(sh, Thr269)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q269_sql: String =
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id,
       |           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |    FROM documents WHERE trim(text) <> '')),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
       |  FROM toks a JOIN toks b
       |    ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(n AS BIGINT) AS intersection,
       |  CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
       |  CAST((1000 * n) // (sa.sz + sb.sz - n) AS BIGINT) AS jac_x1000
       |FROM inter
       |JOIN sizes sa ON id_a = sa.doc_id
       |JOIN sizes sb ON id_b = sb.doc_id
       |WHERE 1000 * n >= $Thr269 * (sa.sz + sb.sz - n)
       |ORDER BY id_a, id_b""".stripMargin

  // -------------------------------------------------------------------
  // q271 — maximal independent set via Luby's algorithm (Luby 1986)
  // with fixed collision-free priorities (Knuth multiplicative hash —
  // odd multiplier, bijective mod 2^32, so no ties). Graph: the union
  // of three stride paths over part keys (k ↔ k−7, k−17, k−23),
  // degree ≤ 6, diameter O(n) — the regime where the sequential greedy
  // MIS is a single O(n) chain but Luby converges in
  // O(longest priority-descending path) ≈ O(log n) rounds of hash
  // joins. The oracle unrolls the SAME rounds (32 ≫ the ~16 observed;
  // spent rounds are no-ops), so a green row pins the round-by-round
  // winner sets, and MIS independence/maximality are property-tested
  // in ScaleAlgoSpec.
  // -------------------------------------------------------------------
  private val MisStrides = Seq(7, 17, 23)
  private val MisRounds = 32

  def q271_luby_mis(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val nodes = part.select(col("p_partkey").as("v"),
      expr("(p_partkey * 2654435761) % 4294967296").as("h"))
    val fwd = MisStrides.map { s =>
      part.filter(col("p_partkey") >= s)
        .select(col("p_partkey").as("u"), (col("p_partkey") - s).as("w"))
    }.reduce(_ unionAll _)
    val sym = fwd.unionAll(fwd.select(col("w").as("u"), col("u").as("w")))
    Communities.maximalIndependentSet(nodes, sym, MisRounds)
      .orderBy(col("node"))
  }

  val q271_sql: String = {
    val nodesSql =
      "SELECT p_partkey AS v, (p_partkey * 2654435761) % 4294967296 AS h " +
        "FROM part"
    val fwd = MisStrides.map(s =>
      s"SELECT p_partkey AS u, p_partkey - $s AS w FROM part " +
        s"WHERE p_partkey >= $s").mkString(" UNION ALL ")
    val edgesSql =
      s"WITH fwd AS ($fwd) " +
        "SELECT u, w FROM fwd UNION ALL SELECT w, u FROM fwd"
    s"""WITH ${Communities.maximalIndependentSetSql(nodesSql, edgesSql,
          MisRounds)}
       |SELECT node, round FROM mis ORDER BY node""".stripMargin
  }

  // -------------------------------------------------------------------
  // q272 — butterfly (2×2 biclique) counting in the bipartite
  // customer–part purchase graph (Wang 2014; Sanei-Mehri 2018). The
  // butterfly is the bipartite clustering primitive (triangles don't
  // exist in bipartite graphs). Count by WEDGE AGGREGATION: join the
  // edge list with itself on the customer pivot, group the (p1 < p2)
  // endpoints, and every pair with codeg common customers contributes
  // C(codeg, 2) butterflies — one shuffle join + one aggregation,
  // Σ_c d(c)² work, the side to pivot on chosen so that sum is the
  // smaller (here: customers, whose degree is bounded by order count
  // per customer). Output: top-25 part pairs by co-purchase degree,
  // each row carrying the GLOBAL butterfly total.
  // -------------------------------------------------------------------
  def q272_butterflies(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_partkey").as("p")), Seq("o_orderkey"))
      .select(col("c"), col("p")).distinct()
    val pr = e.as("a")
      .join(e.as("b"),
        col("a.c") === col("b.c") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("codeg"))
      .withColumn("pair_bf", expr("codeg * (codeg - 1) div 2"))
      .localCheckpoint(eager = true) // feeds the global sum AND the top-k
    val tot = pr.agg(sum(col("pair_bf")).as("total_bf"))
    pr.crossJoin(broadcast(tot))
      .select(col("p1"), col("p2"), col("codeg"), col("pair_bf"),
        col("total_bf"))
      .orderBy(col("codeg").desc, col("p1"), col("p2"))
      .limit(25)
  }

  val q272_sql: String =
    """WITH e AS (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |pr AS (
      |  SELECT a.p AS p1, b.p AS p2, COUNT(*) AS codeg
      |  FROM e a JOIN e b ON a.c = b.c AND a.p < b.p
      |  GROUP BY 1, 2),
      |pb AS (
      |  SELECT p1, p2, CAST(codeg AS BIGINT) AS codeg,
      |         CAST(codeg * (codeg - 1) // 2 AS BIGINT) AS pair_bf
      |  FROM pr),
      |t AS (SELECT CAST(SUM(pair_bf) AS BIGINT) AS total_bf FROM pb)
      |SELECT p1, p2, codeg, pair_bf, total_bf FROM pb CROSS JOIN t
      |ORDER BY codeg DESC, p1, p2 LIMIT 25""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q269_prefix_filter_join" -> q269_prefix_filter_join _,
    "q271_luby_mis" -> q271_luby_mis _,
    "q272_butterflies" -> q272_butterflies _)

  val oracles: Map[String, String] = Map(
    "q269_prefix_filter_join" -> q269_sql,
    "q271_luby_mis" -> q271_sql,
    "q272_butterflies" -> q272_sql)
}
