package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.Model.{Labels, RelTypes}
import graft.graph.Traversals
import graft.store.GraphStore

/** The reference's query layer (`pkg/neo4j/query.go`, `pkg/query/lsp.go`,
  * `pkg/query/advanced.go`, `mcp-server/main.go`) re-expressed over the
  * nodes/edges Datasets.
  * Every Cypher MATCH hop `(a)-[:T]->(b)` is an equi-join
  * nodes ⋈ edges(relType=T) ⋈ nodes; dimension-sized sides are broadcast.
  */
class CodeGraph(nodes: DataFrame, edges: DataFrame) {

  private def n(label: String): DataFrame =
    nodes.filter(col("label") === label)
  private def e(relType: String): DataFrame =
    edges.filter(col("relType") === relType)
  /** Edge projection with renamed endpoints — each hop gets unique column
    * names so chains of joins over the same edges table never hit
    * ambiguous-self-join resolution. */
  private def hop(relType: String, s: String, d: String): DataFrame =
    edges.filter(col("relType") === relType)
      .select(col("src").as(s), col("dst").as(d))

  /** P1 — `MATCH (n:Label) RETURN n LIMIT k` (`query.go:25-37`). */
  def findNodesByLabel(label: String, limit: Int = 100): DataFrame =
    n(label).orderBy(col("id")).limit(limit)

  /** P2 — property equality lookup (`query.go:40-50`). */
  def findByProperty(label: String, prop: String, value: String): DataFrame =
    n(label).filter(col(prop) === value)

  /** P3 + O1 — multi-field case-insensitive search with the reference's
    * CASE-ranked ordering (`query.go:348-414`): rank 1 Function/Method,
    * 2 Class/Interface, 3 Variable/Parameter, 4 File/Feature/Document,
    * 5 Symbol, 6 else; then name; then LIMIT (default 50, `lsp.go:149`).
    */
  def searchNodes(term: String, labels: Seq[String] = Nil,
      limit: Int = 50): DataFrame = {
    val t = lit(term.toLowerCase)
    def m(c: String): Column =
      lower(coalesce(col(c), lit(""))).contains(t)
    val base = if (labels.nonEmpty) nodes.filter(col("label").isin(labels: _*))
      else nodes
    base.filter(m("name") || m("displayName") || m("signature") ||
        m("symbol") || m("path"))
      .withColumn("rank",
        when(col("label").isin(Labels.Function, Labels.Method), 1)
          .when(col("label").isin(Labels.Class, Labels.Interface), 2)
          .when(col("label").isin(Labels.Variable, Labels.Parameter), 3)
          .when(col("label").isin(Labels.File, Labels.Feature,
            Labels.Document), 4)
          .when(col("label") === Labels.Symbol, 5)
          .otherwise(6))
      .orderBy(col("rank"), col("name"), col("id"))
      .limit(limit)
  }

  /** Completion (`pkg/query/lsp.go:239`): name-prefix lookup, default
    * limit 20, ranked like searchNodes. */
  def completions(prefix: String, limit: Int = 20): DataFrame = {
    val p = lit(prefix.toLowerCase)
    nodes.filter(lower(coalesce(col("name"), col("displayName")))
        .startsWith(p))
      .withColumn("rank",
        when(col("label").isin(Labels.Function, Labels.Method), 1)
          .when(col("label").isin(Labels.Class, Labels.Interface), 2)
          .otherwise(3))
      .select(col("rank"), col("label"),
        coalesce(col("name"), col("displayName")).as("name"), col("id"))
      .orderBy(col("rank"), col("name"), col("id"))
      .limit(limit)
  }

  /** J1 — go-to-definition (`query.go:53-118`):
    * `(s:Symbol {symbol:$s})<-[:DEFINES]-(def)`. */
  def goToDefinition(symbol: String): DataFrame = {
    val sym = broadcast(n(Labels.Symbol).filter(col("symbol") === symbol)
      .select(col("id").as("symId")))
    val defs = e(RelTypes.Defines)
    sym.join(defs, sym("symId") === defs("dst"))
      .join(nodes.as("def"), defs("src") === col("def.id"))
      .select(col("def.id").as("defId"), col("def.label").as("defLabel"),
        col("def.name").as("name"), col("def.filePath").as("filePath"),
        col("def.startLine").as("startLine"), col("def.endLine").as("endLine"),
        col("def.signature").as("signature"))
      .orderBy(col("filePath"), col("startLine"))
  }

  /** J2 — find-references (`query.go:121-163`):
    * `(s:Symbol)<-[:REFERENCES]-(usage)`, then CONTAINS* ancestor File,
    * ORDER BY file path, line. The closure is bounded (containment trees
    * are shallow; reference depth is unbounded `*` but finite).
    */
  def findReferences(symbol: String, maxDepth: Int = 10): DataFrame = {
    val sym = broadcast(n(Labels.Symbol).filter(col("symbol") === symbol)
      .select(col("id").as("symId")))
    val refs = e(RelTypes.References)
    val usages = sym.join(refs, sym("symId") === refs("dst"))
      .join(nodes.as("u"), refs("src") === col("u.id"))
      .select(col("u.id").as("usageId"), col("u.label").as("usageLabel"),
        col("u.filePath").as("usageFilePath"),
        col("u.startLine").as("startLine"),
        col("u.startColumn").as("startColumn"))
    // ancestor File via CONTAINS closure: restrict the closure to File
    // ancestors BEFORE joining, so non-File ancestors (Module, Class…)
    // cannot fan a usage out into duplicate rows
    val contains = e(RelTypes.Contains).select(col("src"), col("dst"))
    val files = n(Labels.File).select(col("id").as("fileId"),
      col("path").as("filePath"))
    val fileAncestors = Traversals.closure(contains, maxDepth)
      .join(broadcast(files), col("ancestor") === col("fileId"))
      .select(col("descendant"), col("filePath"))
    usages.join(fileAncestors, usages("usageId") === col("descendant"),
        "left_outer")
      .select(col("usageId"), col("usageLabel"),
        coalesce(col("filePath"), col("usageFilePath")).as("path"),
        col("startLine"), col("startColumn"))
      .distinct()
      .orderBy(col("path"), col("startLine"), col("usageId"))
  }

  /** J3 — find-implementations (`query.go:166-200`):
    * Symbol ←DEFINES− Interface ←IMPLEMENTS− Class. */
  def findImplementations(symbol: String): DataFrame = {
    val sym = broadcast(n(Labels.Symbol).filter(col("symbol") === symbol)
      .select(col("id").as("symId")))
    val defs = hop(RelTypes.Defines, "defSrc", "defDst")
    val impls = hop(RelTypes.Implements, "implSrc", "implDst")
    val ifaces = sym.join(defs, col("symId") === col("defDst"))
      .select(col("defSrc").as("ifaceId"))
    ifaces.join(impls, col("ifaceId") === col("implDst"))
      .join(nodes.as("c"), col("implSrc") === col("c.id"))
      .select(col("c.id").as("classId"), col("c.name").as("name"),
        col("c.fqn").as("fqn"), col("c.filePath").as("filePath"),
        col("c.startLine").as("startLine"))
      .orderBy(col("fqn"), col("classId"))
  }

  /** J4 — impact analysis (`query.go:203-242`): everything reachable from
    * a function over CALLS within ≤10 hops, plus any APIRoutes those
    * downstream functions expose; DISTINCT.
    */
  def impactAnalysis(funcId: Long, maxDepth: Int = 10): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val seeds = Seq(funcId).toDF("id")
    val downstream = Traversals.reachable(
      e(RelTypes.Calls).select(col("src"), col("dst")), seeds, maxDepth)
    val exposes = e(RelTypes.ExposesApi)
    val routes = n(Labels.APIRoute).select(col("id").as("routeId"),
      col("path").as("routePath"))
    downstream.join(nodes.as("f"), downstream("id") === col("f.id"))
      .join(exposes, downstream("id") === exposes("src"), "left_outer")
      .join(broadcast(routes), exposes("dst") === routes("routeId"),
        "left_outer")
      .select(col("f.id").as("affectedId"), col("f.name").as("name"),
        col("f.label").as("label"), col("depth"), col("routePath"))
      .distinct()
      .orderBy(col("depth"), col("name"), col("affectedId"))
  }

  /** J5 — data lineage with path capture (`query.go:245-285`):
    * `path = (param)-[:FLOWS_TO*1..15]->(usage)` where the terminal usage
    * is a Parameter contained in a Method; returns the node-id path.
    */
  def dataLineage(paramId: Long, maxDepth: Int = 15): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val seeds = Seq(paramId).toDF("id")
    val flows = e(RelTypes.FlowsTo).select(col("src"), col("dst"))
    val allPaths = Traversals.paths(flows, seeds, maxDepth)
    val params = n(Labels.Parameter).select(col("id").as("pId"))
    val contains = hop(RelTypes.Contains, "cSrc", "cDst")
    val methods = n(Labels.Method).select(col("id").as("mId"),
      col("name").as("methodName"))
    // terminal must be a Parameter with a Method CONTAINS-parent
    allPaths.join(params, allPaths("end") === params("pId"))
      .join(contains, allPaths("end") === col("cDst"))
      .join(broadcast(methods), col("cSrc") === methods("mId"))
      .select(col("start"), col("end"), col("depth"), col("path"),
        col("methodName"))
      .orderBy(col("depth"), col("end"))
  }

  /** J6 — service dependencies (`query.go:288-323`): for a service, every
    * foreign service whose symbols its code calls; extracts the foreign
    * service name from the SCIP symbol's 3rd field (`split(symbol,' ')[2]`),
    * excluding self. Go-side grouping `advanced.go:148-177` (A6) included:
    * per foreign service, the calling functions + call count.
    */
  def serviceDependencies(serviceName: String, maxDepth: Int = 10): DataFrame = {
    val svc = n(Labels.Service).filter(col("name") === serviceName)
      .select(col("id"))
    val contains = e(RelTypes.Contains).select(col("src"), col("dst"))
    val descendants = Traversals.reachable(contains, svc, maxDepth)
      .select(col("id").as("callerId"))
    val calls = hop(RelTypes.Calls, "callSrc", "callDst")
    val defs = hop(RelTypes.Defines, "defSrc", "defDst")
    val syms = n(Labels.Symbol)
      .filter(col("symbol").contains(" ") &&
        !col("symbol").contains(serviceName))
      .select(col("id").as("symId"), col("symbol"))
    val callerNames = nodes.select(col("id").as("cnId"),
      col("name").as("callingFunction"))
    descendants
      .join(calls, descendants("callerId") === col("callSrc"))
      .join(defs, col("callDst") === col("defSrc"))
      .join(syms, col("defDst") === syms("symId"))
      .join(callerNames, descendants("callerId") === callerNames("cnId"))
      .select(split(col("symbol"), " ").getItem(2)
        .as("foreignServiceName"), col("callingFunction"))
      .groupBy(col("foreignServiceName"))
      .agg(array_sort(collect_set(col("callingFunction")))
        .as("callingFunctions"),
        count(lit(1)).as("callCount"))
      .orderBy(col("foreignServiceName"))
  }

  /** J7 — callers / callees (`mcp-server/main.go:479-506`), LIMIT 10. */
  def callersOf(funcName: String, limit: Int = 10): DataFrame = {
    val target = n(Labels.Function).unionByName(n(Labels.Method))
      .filter(col("name") === funcName).select(col("id").as("tId"))
    val calls = e(RelTypes.Calls)
    target.join(calls, target("tId") === calls("dst"))
      .join(nodes.as("c"), calls("src") === col("c.id"))
      .select(col("c.id").as("callerId"), col("c.name").as("name"),
        col("c.filePath").as("filePath"))
      .orderBy(col("name"), col("callerId")).limit(limit)
  }

  def calleesOf(funcName: String, limit: Int = 10): DataFrame = {
    val src = n(Labels.Function).unionByName(n(Labels.Method))
      .filter(col("name") === funcName).select(col("id").as("sId"))
    val calls = e(RelTypes.Calls)
    src.join(calls, src("sId") === calls("src"))
      .join(nodes.as("c"), calls("dst") === col("c.id"))
      .select(col("c.id").as("calleeId"), col("c.name").as("name"),
        col("c.filePath").as("filePath"))
      .orderBy(col("name"), col("calleeId")).limit(limit)
  }

  /** MCP analyze-function tool (`mcp-server/main.go:423-519`): the
    * reference issues three sequential round-trips (metadata, callers,
    * callees); here one call returns the union, tagged by part. */
  def analyzeFunction(funcName: String, limit: Int = 10): DataFrame = {
    val meta = n(Labels.Function).unionByName(n(Labels.Method))
      .filter(col("name") === funcName)
      .select(lit("metadata").as("part"), col("name"),
        col("filePath"), col("startLine"), col("signature"))
      .orderBy(col("filePath"), col("startLine")).limit(1)
    val callers = callersOf(funcName, limit)
      .select(lit("caller").as("part"), col("name"), col("filePath"),
        lit(null).cast("int").as("startLine"),
        lit(null).cast("string").as("signature"))
    val callees = calleesOf(funcName, limit)
      .select(lit("callee").as("part"), col("name"), col("filePath"),
        lit(null).cast("int").as("startLine"),
        lit(null).cast("string").as("signature"))
    meta.unionByName(callers).unionByName(callees)
  }

  /** A1/A2 — count by label / relType (`system_test.go:72,238`). */
  def countByLabel(): DataFrame =
    nodes.groupBy(col("label")).count()
      .orderBy(col("count").desc, col("label"))

  def countByRelType(): DataFrame =
    edges.groupBy(col("relType")).count()
      .orderBy(col("count").desc, col("relType"))

  /** A3 — document pipeline stats (`documents/indexer.go:179-199`). */
  def documentStats(): DataFrame = {
    val docs = n(Labels.Document)
    val describes = hop(RelTypes.Describes, "descSrc", "descDst")
    val mentions = hop(RelTypes.Mentions, "menSrc", "menDst")
    val feats = n(Labels.Feature).select(col("id").as("fId"))
    val syms = n(Labels.Symbol).select(col("id").as("sId"))
    val d2f = docs.join(describes, docs("id") === col("descSrc"), "left_outer")
      .join(feats, col("descDst") === feats("fId"), "left_outer")
    val agg1 = d2f.agg(
      countDistinct(docs("id")).as("nDocuments"),
      countDistinct(col("fId")).as("nFeatures"),
      array_sort(collect_set(docs("type"))).as("docTypes"))
    val nMentioned = docs.join(mentions, docs("id") === col("menSrc"))
      .join(syms, col("menDst") === syms("sId"))
      .agg(countDistinct(col("sId")).as("nMentionedSymbols"))
    agg1.crossJoin(nMentioned)
  }

  /** J10 — integrity checks (`indexing_test.go:412-466`): orphaned
    * Reference nodes (no REFERENCES edge to a Symbol) and Services without
    * any CONTAINS→File. Returns (check, violationCount). */
  def integrityChecks(): DataFrame = {
    val refs = n(Labels.Reference).select(col("id"))
    val refEdges = e(RelTypes.References).select(col("src"))
    val orphanRefs = refs.join(refEdges, refs("id") === refEdges("src"),
      "left_anti").agg(count(lit(1)).as("violationCount"))
      .withColumn("check", lit("orphaned_references"))
    val svcs = n(Labels.Service).select(col("id"))
    val files = n(Labels.File).select(col("id").as("fileId"))
    val svcFiles = e(RelTypes.Contains)
      .join(files, col("dst") === col("fileId"), "left_semi")
      .select(col("src"))
    val lonelySvcs = svcs.join(svcFiles, svcs("id") === svcFiles("src"),
      "left_anti").agg(count(lit(1)).as("violationCount"))
      .withColumn("check", lit("services_without_files"))
    orphanRefs.unionByName(lonelySvcs).select(col("check"),
      col("violationCount"))
  }

  /** LSP hover (`pkg/query/lsp.go` GetHover — a placeholder in the
    * reference returning "not yet implemented"; implemented for real
    * here): definition metadata + documentation for a symbol, the
    * content a hover tooltip renders. */
  def hover(symbol: String): DataFrame = {
    val sym = broadcast(n(Labels.Symbol).filter(col("symbol") === symbol)
      .select(col("id").as("symId"), col("displayName").as("symDisplay"),
        col("documentation").as("symDoc")))
    val defs = e(RelTypes.Defines)
    sym.join(defs, sym("symId") === defs("dst"))
      .join(nodes.as("def"), defs("src") === col("def.id"))
      .select(
        coalesce(col("symDisplay"), col("def.name")).as("name"),
        col("def.label").as("kind"),
        coalesce(col("def.signature"), col("def.name")).as("signature"),
        coalesce(col("symDoc"), col("def.docstring"), lit(""))
          .as("documentation"),
        col("def.filePath").as("filePath"),
        col("def.startLine").as("startLine"))
      .orderBy(col("filePath"), col("startLine"))
      .limit(1)
  }

  /** A9 — complexity summary (`advanced.go` AnalyzeComplexity — a
    * placeholder returning zeros in the reference; implemented for
    * real): per-file function totals, avg/max complexity, and the
    * high-complexity count (> threshold). */
  def complexitySummary(threshold: Int = 10): DataFrame =
    n(Labels.Function).unionByName(n(Labels.Method))
      .groupBy(col("filePath"))
      .agg(count(lit(1)).as("totalFunctions"),
        avg(coalesce(col("complexity"), lit(0))).as("avgComplexity"),
        max(coalesce(col("complexity"), lit(0))).as("maxComplexity"),
        count(when(col("complexity") > threshold, 1))
          .as("highComplexityCount"))
      .orderBy(col("filePath"))

  /** Call graph (`advanced.go` BuildCallGraph — a placeholder returning
    * empty in the reference): depth-capped CALLS neighborhood of a root
    * function, callee-direction ("out") or caller-direction ("in").
    * Returns the edge list with hop depth of the source node. */
  def callGraph(funcName: String, direction: String = "out",
      maxDepth: Int = 5): DataFrame = {
    val root = n(Labels.Function).unionByName(n(Labels.Method))
      .filter(col("name") === funcName).select(col("id"))
    val calls = e(RelTypes.Calls).select(col("src"), col("dst"))
    val oriented =
      if (direction == "out") calls
      else calls.select(col("dst").as("src"), col("src").as("dst"))
    val reach = Traversals.reachable(oriented, root, maxDepth)
      .select(col("id"), col("depth"))
    // min depth per node: reachable() rediscovers a root via a cycle at
    // depth ≥ 1, which would duplicate the root's edges at two depths
    val inScope = root.select(col("id")).withColumn("depth", lit(0))
      .unionByName(reach)
      .groupBy(col("id")).agg(min(col("depth")).as("depth"))
    val scoped = oriented
      .join(inScope.withColumnRenamed("id", "src"), Seq("src"))
      .filter(col("depth") < maxDepth)
    scoped
      .join(nodes.select(col("id").as("src"), col("name").as("srcName")),
        Seq("src"))
      .join(nodes.select(col("id").as("dst"), col("name").as("dstName")),
        Seq("dst"))
      .select(col("srcName"), col("dstName"), col("depth").as("srcDepth"))
      .distinct()
      .orderBy(col("srcDepth"), col("srcName"), col("dstName"))
  }

  /** O4/S15 — source span lookup (`query.go:425-493`): location metadata
    * for a named Function/Method, for byte-span extraction. */
  def sourceLocation(name: String): DataFrame =
    n(Labels.Function).unionByName(n(Labels.Method))
      .filter(col("name") === name &&
        col("startByte").isNotNull && col("endByte").isNotNull)
      .select(col("name"), col("filePath"), col("startByte"), col("endByte"),
        col("startLine"), col("endLine"), col("linesOfCode"))
      .orderBy(col("filePath"), col("startLine")).limit(1)
}

object CodeGraph {
  def apply(store: GraphStore): CodeGraph =
    new CodeGraph(store.nodes, store.edges)

  /** Byte-span source extraction with line fallback — semantics of
    * `query.go:449-493`: prefer content[startByte:endByte), fall back to
    * line slicing. Plain Scala; used driver-side on a single looked-up row
    * (the reference does os.ReadFile the same way).
    */
  def extractSpan(content: String, startByte: Option[Int],
      endByte: Option[Int], startLine: Int, endLine: Int): String =
    (startByte, endByte) match {
      case (Some(s), Some(e)) if s >= 0 && e <= content.length && s < e =>
        content.substring(s, e)
      case _ =>
        val lines = content.split("\n", -1)
        val lo = math.max(startLine - 1, 0)
        val hi = math.min(endLine, lines.length)
        if (lo >= hi) "" else lines.slice(lo, hi).mkString("\n")
    }
}
