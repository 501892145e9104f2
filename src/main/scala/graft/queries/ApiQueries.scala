package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-gated entries for the MCP/CLI API surface (SURVEY §2 J7 +
  * the analyze-function flow, reference `mcp-server/main.go:423-519`).
  *
  * These run the REAL `CodeGraph` methods — not re-derived DataFrame
  * shapes — over a deterministic synthetic code graph built from the
  * part table, so the DuckDB oracle can reconstruct the same graph:
  *
  *   nodes: one Function per part key (name `fn_<k>`, file
  *          `src/pkg<k mod 10>/file.go`, startLine `k mod 1000`)
  *   CALLS edges: `fn_k` calls `fn_(k*7+3 mod 50)` — a hub graph where
  *          low-id functions have MANY callers, so the reference's
  *          LIMIT 10 (`main.go:479-506`) actually binds and the
  *          deterministic (name, id) tie-break is exercised.
  *
  * Scale shape: callersOf/calleesOf are one equi-join keyed on the
  * target id (frontier side is a handful of rows → broadcast) followed
  * by a TakeOrderedAndProject — no full sort.
  */
object ApiQueries {

  private def graphNodes(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey").as("id"),
      lit("Function").as("label"),
      concat(lit("fn_"), col("p_partkey")).as("name"),
      concat(lit("src/pkg"), col("p_partkey") % 10, lit("/file.go"))
        .as("filePath"),
      (col("p_partkey") % 1000).cast("int").as("startLine"),
      concat(lit("func fn_"), col("p_partkey"), lit("()")).as("signature"))

  private def callEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey").as("src"),
      ((col("p_partkey") * 7 + 3) % 50).as("dst"),
      lit("CALLS").as("relType"))

  private val nodesSql =
    """SELECT p_partkey AS id, 'Function' AS label,
      |  'fn_' || CAST(p_partkey AS VARCHAR) AS name,
      |  'src/pkg' || CAST(p_partkey % 10 AS VARCHAR) || '/file.go'
      |    AS file_path,
      |  CAST(p_partkey % 1000 AS INT) AS start_line,
      |  'func fn_' || CAST(p_partkey AS VARCHAR) || '()' AS signature
      |FROM part""".stripMargin

  private val edgesSql =
    "SELECT p_partkey AS src, (p_partkey * 7 + 3) % 50 AS dst FROM part"

  private def cg(spark: SparkSession, dir: String): CodeGraph =
    new CodeGraph(graphNodes(spark, dir), callEdges(spark, dir))

  // -------------------------------------------------------------------
  // q101 — J7 callers/callees (`mcp-server/main.go:479-506`): both
  // directional edge joins with the reference's LIMIT 10, tagged and
  // unioned so one entry gates both directions.
  // -------------------------------------------------------------------
  def q101_callers_callees(spark: SparkSession, dir: String): DataFrame = {
    val g = cg(spark, dir)
    g.callersOf("fn_24", 10)
      .select(lit("caller").as("direction"),
        col("callerId").as("neighbor_id"), col("name"),
        col("filePath").as("file_path"))
      .unionByName(
        g.calleesOf("fn_24", 10)
          .select(lit("callee").as("direction"),
            col("calleeId").as("neighbor_id"), col("name"),
            col("filePath").as("file_path")))
      .orderBy(col("direction"), col("neighbor_id"))
  }

  val q101_sql: String =
    s"""WITH nodes AS ($nodesSql),
       |edges AS ($edgesSql),
       |callers AS (
       |  SELECT 'caller' AS direction, n.id AS neighbor_id, n.name,
       |         n.file_path
       |  FROM nodes t JOIN edges e ON e.dst = t.id
       |  JOIN nodes n ON n.id = e.src
       |  WHERE t.name = 'fn_24'
       |  ORDER BY n.name, n.id LIMIT 10),
       |callees AS (
       |  SELECT 'callee' AS direction, n.id AS neighbor_id, n.name,
       |         n.file_path
       |  FROM nodes s JOIN edges e ON e.src = s.id
       |  JOIN nodes n ON n.id = e.dst
       |  WHERE s.name = 'fn_24'
       |  ORDER BY n.name, n.id LIMIT 10)
       |SELECT direction, neighbor_id, name, file_path
       |FROM (SELECT * FROM callers UNION ALL SELECT * FROM callees)
       |ORDER BY direction, neighbor_id""".stripMargin

  // -------------------------------------------------------------------
  // q102 — the MCP analyze_function flow (`mcp-server/main.go:423-519`):
  // metadata + callers + callees in one tagged union, exactly the three
  // round-trips the reference's tool handler issues.
  // -------------------------------------------------------------------
  def q102_analyze_function(spark: SparkSession, dir: String): DataFrame =
    cg(spark, dir).analyzeFunction("fn_31", 10)
      .select(col("part"), col("name"), col("filePath").as("file_path"),
        col("startLine").as("start_line"), col("signature"))
      .orderBy(col("part"), col("name"))

  val q102_sql: String =
    s"""WITH nodes AS ($nodesSql),
       |edges AS ($edgesSql),
       |meta AS (
       |  SELECT 'metadata' AS part, name, file_path, start_line, signature
       |  FROM nodes WHERE name = 'fn_31'
       |  ORDER BY file_path, start_line LIMIT 1),
       |callers AS (
       |  SELECT 'caller' AS part, n.name, n.file_path,
       |         CAST(NULL AS INT) AS start_line,
       |         CAST(NULL AS VARCHAR) AS signature
       |  FROM nodes t JOIN edges e ON e.dst = t.id
       |  JOIN nodes n ON n.id = e.src
       |  WHERE t.name = 'fn_31'
       |  ORDER BY n.name, n.id LIMIT 10),
       |callees AS (
       |  SELECT 'callee' AS part, n.name, n.file_path,
       |         CAST(NULL AS INT) AS start_line,
       |         CAST(NULL AS VARCHAR) AS signature
       |  FROM nodes s JOIN edges e ON e.src = s.id
       |  JOIN nodes n ON n.id = e.dst
       |  WHERE s.name = 'fn_31'
       |  ORDER BY n.name, n.id LIMIT 10)
       |SELECT * FROM (
       |  SELECT * FROM meta
       |  UNION ALL SELECT * FROM callers
       |  UNION ALL SELECT * FROM callees)
       |ORDER BY part, name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_callers_callees" -> q101_callers_callees _,
    "q102_analyze_function" -> q102_analyze_function _)

  val oracles: Map[String, String] = Map(
    "q101_callers_callees" -> q101_sql,
    "q102_analyze_function" -> q102_sql)
}
