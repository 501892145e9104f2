package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Model.{Labels, RelTypes}
import graft.store.GraphStore

/** The FIXTURES.md §3 mini-graph: 1 Service → 2 Files → Modules/Functions,
  * Symbols + DEFINES/REFERENCES, a CALLS chain of depth 3 ending in an
  * EXPOSES_API route, a FLOWS_TO chain, Class IMPLEMENTS Interface.
  * Node ids are fixed small longs for readable asserts.
  */
object FixtureGraph {
  // ids
  val svc = 1L
  val fileA = 10L; val fileB = 11L
  val modA = 20L
  val fMain = 30L; val fHelper = 31L; val fDeep = 32L; val fHandler = 33L
  val cls = 40L; val iface = 41L
  val symMain = 50L; val symHelper = 51L; val symIface = 52L
  val ref1 = 60L; val ref2 = 61L
  val route = 70L
  val pIn = 80L; val vMid = 81L; val pOut = 82L
  val meth = 90L

  // public: Janino-generated encoder code must call the accessors; a
  // `private` case class silently drops the whole stage to interpreted
  case class N(id: Long, label: String, name: String = null,
      fqn: String = null, path: String = null, signature: String = null,
      symbol: String = null, kind: String = null, filePath: String = null,
      startLine: Option[Int] = None, endLine: Option[Int] = None,
      startByte: Option[Int] = None, endByte: Option[Int] = None)

  def nodes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      N(svc, Labels.Service, name = "test-service"),
      N(fileA, Labels.File, name = "a.go", path = "pkg/a.go"),
      N(fileB, Labels.File, name = "b.go", path = "pkg/b.go"),
      N(modA, Labels.Module, name = "pkg", fqn = "test-service/pkg"),
      N(fMain, Labels.Function, name = "Main", signature = "func Main()",
        filePath = "pkg/a.go", startLine = Some(1), endLine = Some(10),
        startByte = Some(0), endByte = Some(120)),
      N(fHelper, Labels.Function, name = "Helper",
        signature = "func Helper()", filePath = "pkg/a.go",
        startLine = Some(12), endLine = Some(20), startByte = Some(130),
        endByte = Some(260)),
      N(fDeep, Labels.Function, name = "Deep", signature = "func Deep()",
        filePath = "pkg/b.go", startLine = Some(1), endLine = Some(8)),
      N(fHandler, Labels.Function, name = "Handler",
        signature = "func Handler()", filePath = "pkg/b.go",
        startLine = Some(10), endLine = Some(30)),
      N(cls, Labels.Class, name = "Impl", fqn = "pkg.Impl",
        filePath = "pkg/b.go", startLine = Some(32), endLine = Some(60)),
      N(iface, Labels.Interface, name = "Doer", fqn = "pkg.Doer",
        filePath = "pkg/a.go", startLine = Some(22), endLine = Some(25)),
      N(symMain, Labels.Symbol,
        symbol = "scip-go go test-service v1 pkg/Main().", kind = "method"),
      N(symHelper, Labels.Symbol,
        symbol = "scip-go go test-service v1 pkg/Helper().", kind = "method"),
      N(symIface, Labels.Symbol,
        symbol = "scip-go go test-service v1 pkg/Doer#", kind = "class"),
      N(ref1, Labels.Reference, filePath = "pkg/b.go",
        startLine = Some(5), endLine = Some(5)),
      N(ref2, Labels.Reference, filePath = "pkg/a.go",
        startLine = Some(15), endLine = Some(15)),
      N(route, Labels.APIRoute, name = "get-users", path = "/api/users"),
      N(pIn, Labels.Parameter, name = "in", filePath = "pkg/a.go",
        startLine = Some(1)),
      N(vMid, Labels.Variable, name = "mid", filePath = "pkg/a.go",
        startLine = Some(3)),
      N(pOut, Labels.Parameter, name = "out", filePath = "pkg/b.go",
        startLine = Some(10)),
      N(meth, Labels.Method, name = "Process",
        signature = "func (i Impl) Process()", filePath = "pkg/b.go",
        startLine = Some(33), endLine = Some(40))
    ).toDF()
  }

  def edges(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val c = RelTypes.Contains
    Seq(
      (svc, fileA, c), (svc, fileB, c),
      (fileA, modA, c),
      (modA, fMain, c), (modA, fHelper, c),
      (fileB, fDeep, c), (fileB, fHandler, c), (fileB, cls, c),
      (fileA, iface, c),
      (fileB, ref1, c), (fileA, ref2, c),
      (cls, meth, c), (meth, pOut, c),
      (fMain, symMain, RelTypes.Defines),
      (fHelper, symHelper, RelTypes.Defines),
      (iface, symIface, RelTypes.Defines),
      (ref1, symMain, RelTypes.References),
      (ref2, symHelper, RelTypes.References),
      (fMain, fHelper, RelTypes.Calls),
      (fHelper, fDeep, RelTypes.Calls),
      (fDeep, fHandler, RelTypes.Calls),
      (fHandler, route, RelTypes.ExposesApi),
      (cls, iface, RelTypes.Implements),
      (pIn, vMid, RelTypes.FlowsTo),
      (vMid, pOut, RelTypes.FlowsTo)
    ).toDF("src", "dst", "relType")
  }

  /** Write through GraphStore MERGE into a temp dir; returns the store. */
  def store(spark: SparkSession): GraphStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fixture")
      .toString
    val st = new GraphStore(spark, dir)
    st.mergeNodes(nodes(spark))
    st.mergeEdges(edges(spark))
    st
  }
}
