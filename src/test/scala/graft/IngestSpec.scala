package graft

import org.apache.spark.sql.functions._

import graft.ingest.{DocumentPipeline, ScipIngest}
import graft.model.Model.Labels
import graft.queries.CodeGraph
import graft.store.GraphStore

class IngestSpec extends SparkSpec {
  import spark.implicits._

  // Mirrors the reference's inline markdown fixtures
  // (test/integration/indexing_test.go:177-231) in spirit.
  private val archDoc =
    """# Architecture Overview
      |
      |## Introduction
      |
      |This document describes the system. Status: Completed.
      |
      |## Graph Storage Layer
      |
      |Feature: Graph Storage
      |The storage layer persists nodes via `GraphStore` and `MergeNodes`.
      |This work is completed.
      |
      |## Query Engine
      |
      |Feature: Query Engine
      |Queries run through `SearchNodes` against the graph. In progress.
      |""".stripMargin

  private val rfcDoc =
    """# RFC 001: Indexing Pipeline
      |
      |Requirement: Incremental Updates
      |Planned for a future release.
      |
      |Feature: Graph Storage
      |A longer description of the graph storage feature than the one in
      |the architecture document, so the merge keeps this version.
      |""".stripMargin

  private def docsDf = Seq(
    ("docs/architecture.md", archDoc),
    ("docs/rfc-001.md", rfcDoc)).toDF("path", "content")

  test("document pipeline: titles, types, chunking") {
    val chunks = DocumentPipeline.chunkedDocuments(docsDf)
    val byUrl = chunks.collect().map(r =>
      r.getAs[String]("sourceUrl") ->
        (r.getAs[String]("title"), r.getAs[String]("type"))).toMap
    assert(byUrl("docs/architecture.md")._1 === "Architecture Overview")
    assert(byUrl("docs/architecture.md")._2 === "architecture")
    assert(byUrl("docs/rfc-001.md")._2 === "rfc")
  }

  test("chunking splits long documents at ~maxChunkWords") {
    val para = ("word " * 300).trim
    val long = (1 to 5).map(i => s"para$i $para").mkString("\n\n")
    val out = DocumentPipeline.chunk(long, 1000)
    assert(out.length >= 2)
    assert(out.forall(_.split("\\s+").length <= 1000 + 301))
  }

  test("feature extraction + merge: dedup, longest description, status") {
    val chunks = DocumentPipeline.chunkedDocuments(docsDf)
    val merged = DocumentPipeline.mergeFeatures(
      DocumentPipeline.extractFeatures(chunks)).collect()
    val names = merged.map(_.getAs[String]("name")).toSet
    assert(names.contains("Graph Storage"))
    assert(names.contains("Query Engine"))
    assert(names.contains("Incremental Updates"))
    // generic header skipped
    assert(!names.exists(_.equalsIgnoreCase("Introduction")))
    // same-name features merged into one row
    val gs = merged.filter(_.getAs[String]("name") === "Graph Storage")
    assert(gs.length === 1)
    assert(gs(0).getAs[Long]("nMentions") >= 2L)
    // longest description won (the RFC one)
    assert(gs(0).getAs[String]("description").contains("RFC") ||
      gs(0).getAs[String]("description").length >= 100)
  }

  test("full document ingest through the store: nodes + DESCRIBES + MENTIONS") {
    val store = FixtureGraph.store(spark) // has Symbols for MENTIONS
    DocumentPipeline.ingest(store, docsDf)
    val cg = CodeGraph(store)
    val labels = cg.countByLabel().collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Long]("count")).toMap
    assert(labels(Labels.Document) >= 2L)
    assert(labels(Labels.Feature) >= 3L)
    val rels = cg.countByRelType().collect()
      .map(r => r.getAs[String]("relType") -> r.getAs[Long]("count")).toMap
    assert(rels.getOrElse("DESCRIBES", 0L) >= 3L)
    // statuses distinct >= 2 (reference indexing_test.go:260-262)
    val statuses = store.nodesByLabel(Labels.Feature)
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses.size >= 2)
  }

  test("scip ingest: two-pass graph build with byte-offset backfill") {
    val content = "package pkg\n\nfunc Main() {\n\tHelper()\n}\n"
    val index = ScipIngest.ScipIndex(
      documents = Seq(ScipIngest.ScipDocument("pkg/a.go", Seq(
        ScipIngest.ScipOccurrence(
          "scip-go go svc v1 pkg/Main().", Seq(2, 5, 2, 9), 1),
        ScipIngest.ScipOccurrence(
          "scip-go go svc v1 pkg/Helper().", Seq(3, 1, 3, 7), 0)))),
      externalSymbols = Seq(ScipIngest.ScipExternalSymbol(
        "scip-go go svc v1 pkg/Helper().", "", "helper doc")))
    val dir = java.nio.file.Files.createTempDirectory("graft-scip").toString
    val store = new GraphStore(spark, dir)
    ScipIngest.ingest(store, spark, index, "svc",
      Map("pkg/a.go" -> content))

    val labels = store.nodes.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labels(Labels.Service) === 1L)
    assert(labels(Labels.File) === 1L)
    assert(labels(Labels.Symbol) === 2L)
    assert(labels(Labels.Reference) === 1L)
    val rels = store.edges.groupBy("relType").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rels("DEFINES") === 1L)
    assert(rels("REFERENCES") === 1L)
    assert(rels("CONTAINS") === 3L) // svc→file, file→sym, file→ref

    // byte-offset oracle: extraction equals direct slice
    val ref = store.nodesByLabel(Labels.Reference).collect()(0)
    val sb = ref.getAs[Int]("startByte"); val eb = ref.getAs[Int]("endByte")
    assert(content.substring(sb, eb) === "Helper")
    // integrity: no orphaned references
    val checks = CodeGraph(store).integrityChecks().collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("violationCount"))
      .toMap
    assert(checks("orphaned_references") === 0L)
    // re-ingest idempotent
    ScipIngest.ingest(store, spark, index, "svc",
      Map("pkg/a.go" -> content))
    assert(store.nodes.count() === labels.values.sum)
  }

  test("chunking property: no word lost or duplicated (200 random docs)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val nParas = 1 + rnd.nextInt(6)
      val doc = (1 to nParas).map { p =>
        val n = 1 + rnd.nextInt(400)
        (1 to n).map(w => s"w${p}_$w").mkString(" ")
      }.mkString("\n\n")
      val chunks = DocumentPipeline.chunk(doc, 300)
      val wordsIn = doc.split("\\s+").filter(_.nonEmpty).toSeq
      val wordsOut = chunks.flatMap(_.split("\\s+").filter(_.nonEmpty))
      assert(wordsOut === wordsIn)
    }
  }

  test("byteOffset property: offset of (line,col) recovers the char") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val lines = (1 to 1 + rnd.nextInt(10)).map(i =>
        "x" * rnd.nextInt(20) + s"L$i")
      val content = lines.mkString("\n")
      val li = rnd.nextInt(lines.length)
      val col0 = rnd.nextInt(lines(li).length)
      val off = ScipIngest.byteOffset(content, li, col0)
      assert(content.charAt(off) === lines(li).charAt(col0))
    }
  }

  test("scip helpers: range decode, language, display name") {
    assert(ScipIngest.decodeRange(Seq(1, 2, 3)) === ((1, 2, 1, 3)))
    assert(ScipIngest.decodeRange(Seq(1, 2, 3, 4)) === ((1, 2, 3, 4)))
    assert(ScipIngest.languageOf("x/y.go") === "go")
    assert(ScipIngest.languageOf("a.scala") === "scala")
    assert(ScipIngest.displayNameOf(
      "scip-go go svc v1 pkg/Main().") === "Main")
    assert(ScipIngest.displayNameOf(
      "scip-go go svc v1 pkg/Doer#") === "Doer")
  }
}
