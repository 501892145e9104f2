package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection — deterministic label propagation.
  *
  * The reference ranks "which functions belong together" only implicitly
  * (module grouping via DEFINES, `pkg/graph/queries.go` service-dependency
  * aggregation); LPA is the standard scalable refinement: each node adopts
  * the most frequent label among its neighbours until stable.
  *
  * Classic LPA is nondeterministic (random visit order, random
  * tie-breaks). This variant is fully deterministic so any engine
  * reproduces it bit-for-bit: updates are SYNCHRONOUS (iteration k reads
  * only iteration k−1's labels) and ties break on the SMALLEST label.
  * Each iteration is one shuffle-join (edges ⋈ labels on dst) plus one
  * aggregation — O(E) per round, no per-node driver loop — and the label
  * frame is materialized per round to keep the lineage flat (the same
  * localCheckpoint discipline as [[Centrality.sssp]]). At cluster scale
  * the edge list is hash-partitioned once and reused every round.
  */
object Communities {

  /** `edges` must select (src, dst); treated as UNDIRECTED (symmetrized,
    * self-loops dropped, duplicates collapsed). Returns (id, label) after
    * `iters` synchronous rounds, labels seeded with the node id. */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters ($iters) out of the sane unrolled range")
    val raw = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val sym = raw
      .unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .repartition(col("dst")).localCheckpoint(eager = true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iters) {
      val nbr = sym
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .select(col("src").as("id"), col("label"))
      val cnt = nbr.groupBy(col("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      // mode with smallest-label tie-break as ONE hash aggregation:
      // max over (count, -label) structs picks highest count, then
      // lowest label — no per-id sort, unlike a row_number window
      val pick = cnt.groupBy(col("id"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("new_label"))
      // every node in sym has >=1 neighbour (symmetrized, no isolates),
      // so the coalesce is a safety net, not a live path
      labels = labels.join(pick, Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(eager = true)
    }
    labels
  }

  /** The SQL mirror: the same synchronous min-tie-break rounds unrolled
    * as chained CTEs (emitted from here so the two sides cannot drift).
    * `edgesSql` must select (src, dst); the final CTE is `l<iters>`
    * with columns (id, label). */
  def labelPropagationSql(edgesSql: String, iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""c$k AS (
         |  SELECT e.src AS id, l.label, COUNT(*) AS c
         |  FROM sym e JOIN l${k - 1} l ON l.id = e.dst
         |  GROUP BY 1, 2),
         |p$k AS (
         |  SELECT id, label,
         |    ROW_NUMBER() OVER (PARTITION BY id
         |      ORDER BY c DESC, label) AS rn
         |  FROM c$k),
         |l$k AS MATERIALIZED (
         |  SELECT n.id, COALESCE(p.label, n.label) AS label
         |  FROM l${k - 1} n
         |  LEFT JOIN (SELECT id, label FROM p$k WHERE rn = 1) p
         |    ON p.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""raw AS ($edgesSql),
       |sym AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM raw
       |    UNION ALL SELECT dst, src FROM raw)
       |  WHERE src <> dst),
       |l0 AS (SELECT DISTINCT src AS id, src AS label FROM sym),
       |$steps""".stripMargin
  }
}
