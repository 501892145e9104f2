package graft

import org.apache.spark.sql.functions._

import graft.queries.CodeGraph
import graft.model.Model.Labels

class CodeGraphSpec extends SparkSpec {
  lazy val store = FixtureGraph.store(spark)
  lazy val cg = CodeGraph(store)

  test("goToDefinition finds the defining function for a symbol") {
    val rows = cg.goToDefinition("scip-go go test-service v1 pkg/Main().")
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("name") === "Main")
    assert(rows(0).getAs[String]("filePath") === "pkg/a.go")
  }

  test("findReferences resolves usages + ancestor file, ordered") {
    val rows = cg.findReferences("scip-go go test-service v1 pkg/Main().")
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("path") === "pkg/b.go")
    assert(rows(0).getAs[Int]("startLine") === 5)
  }

  test("findImplementations walks Symbol<-DEFINES-Interface<-IMPLEMENTS-Class") {
    val rows = cg.findImplementations("scip-go go test-service v1 pkg/Doer#")
      .collect()
    assert(rows.map(_.getAs[String]("name")).toSeq === Seq("Impl"))
  }

  test("impactAnalysis reaches the whole CALLS chain and the exposed route") {
    val rows = cg.impactAnalysis(FixtureGraph.fMain, 10).collect()
    val names = rows.map(_.getAs[String]("name")).toSet
    assert(names === Set("Helper", "Deep", "Handler"))
    val routes = rows.flatMap(r => Option(r.getAs[String]("routePath"))).toSet
    assert(routes === Set("/api/users"))
    // depth semantics
    val byName = rows.map(r => r.getAs[String]("name") ->
      r.getAs[Int]("depth")).toMap
    assert(byName("Helper") === 1 && byName("Deep") === 2 &&
      byName("Handler") === 3)
  }

  test("impactAnalysis respects the depth cap") {
    val rows = cg.impactAnalysis(FixtureGraph.fMain, 2).collect()
    assert(rows.map(_.getAs[String]("name")).toSet === Set("Helper", "Deep"))
  }

  test("dataLineage captures the FLOWS_TO path ending in a Method parameter") {
    val rows = cg.dataLineage(FixtureGraph.pIn, 15).collect()
    assert(rows.length === 1)
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("path")).toList ===
      List(FixtureGraph.pIn, FixtureGraph.vMid, FixtureGraph.pOut))
    assert(rows(0).getAs[String]("methodName") === "Process")
  }

  test("searchNodes ranks Function over Class over File") {
    val rows = cg.searchNodes("e").collect() // matches many names
    val ranks = rows.map(_.getAs[Int]("rank"))
    assert(ranks.sorted.toSeq === ranks.toSeq) // ordered by rank
    assert(rows.head.getAs[Int]("rank") === 1)
  }

  test("callersOf / calleesOf") {
    assert(cg.callersOf("Helper").collect()
      .map(_.getAs[String]("name")).toSeq === Seq("Main"))
    assert(cg.calleesOf("Helper").collect()
      .map(_.getAs[String]("name")).toSeq === Seq("Deep"))
  }

  test("countByLabel / countByRelType") {
    val labels = cg.countByLabel().collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Long]("count")).toMap
    assert(labels(Labels.Function) === 4L)
    assert(labels(Labels.Symbol) === 3L)
    val rels = cg.countByRelType().collect()
      .map(r => r.getAs[String]("relType") -> r.getAs[Long]("count")).toMap
    assert(rels("CONTAINS") === 13L)
    assert(rels("CALLS") === 3L)
  }

  test("integrityChecks: clean fixture has zero violations") {
    val checks = cg.integrityChecks().collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("violationCount"))
      .toMap
    assert(checks("orphaned_references") === 0L)
    assert(checks("services_without_files") === 0L)
  }

  test("hover returns definition metadata for a symbol") {
    val rows = cg.hover("scip-go go test-service v1 pkg/Main().").collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("name") === "Main")
    assert(rows(0).getAs[String]("signature") === "func Main()")
    assert(rows(0).getAs[String]("filePath") === "pkg/a.go")
  }

  test("complexitySummary aggregates per file") {
    val rows = cg.complexitySummary().collect()
      .map(r => r.getAs[String]("filePath") ->
        r.getAs[Long]("totalFunctions")).toMap
    assert(rows("pkg/a.go") === 2L) // Main, Helper
    assert(rows.values.sum >= 4L)
  }

  test("callGraph walks the CALLS chain with depths, both directions") {
    val out = cg.callGraph("Main", "out", 10).collect()
      .map(r => (r.getAs[String]("srcName"), r.getAs[String]("dstName"),
        r.getAs[Int]("srcDepth")))
    assert(out.contains(("Main", "Helper", 0)))
    assert(out.contains(("Helper", "Deep", 1)))
    assert(out.contains(("Deep", "Handler", 2)))
    val in = cg.callGraph("Handler", "in", 10).collect()
      .map(r => (r.getAs[String]("srcName"), r.getAs[String]("dstName")))
    assert(in.contains(("Handler", "Deep")))
    assert(in.contains(("Deep", "Helper")))
  }

  test("callGraph on a recursive cycle reports one edge row at min depth") {
    import spark.implicits._
    val ns = Seq((1L, Labels.Function, "Main"), (2L, Labels.Function, "Helper"))
      .toDF("id", "label", "name")
    val es = Seq((1L, 2L, "CALLS"), (2L, 1L, "CALLS"))
      .toDF("src", "dst", "relType")
    val out = new CodeGraph(ns, es).callGraph("Main", "out", 5).collect()
      .map(r => (r.getAs[String]("srcName"), r.getAs[String]("dstName"),
        r.getAs[Int]("srcDepth")))
    // Main's out-edge appears once at depth 0, not again at its
    // cycle-rediscovery depth
    assert(out.count(e => e._1 == "Main" && e._2 == "Helper") === 1)
    assert(out.toSet === Set(("Main", "Helper", 0), ("Helper", "Main", 1)))
  }

  test("sourceLocation + extractSpan byte-slice oracle") {
    val loc = cg.sourceLocation("Main").collect()
    assert(loc.length === 1)
    val content = "0123456789" * 30
    val got = CodeGraph.extractSpan(content, Some(5), Some(15), 1, 10)
    assert(got === content.substring(5, 15))
    // line fallback
    val text = (1 to 20).map(i => s"line$i").mkString("\n")
    val lines = CodeGraph.extractSpan(text, None, None, 2, 4)
    assert(lines === "line2\nline3\nline4")
  }
}
