package graft

import java.nio.file.Files

class CliSpec extends SparkSpec {

  test("cli: search / stats / integrity over a fixture store") {
    val store = FixtureGraph.store(spark)
    val dir = storeDirOf(store)
    val search = Cli.run(spark, dir, "search", List("Helper")).get.collect()
    assert(search.nonEmpty)
    assert(search(0).getAs[String]("name") === "Helper")
    val stats = Cli.run(spark, dir, "stats", Nil).get.collect()
    assert(stats.length > 5)
    val integ = Cli.run(spark, dir, "integrity", Nil).get.collect()
    assert(integ.length === 2)
  }

  test("cli: ingest-docs then doc-stats") {
    val store = FixtureGraph.store(spark)
    val dir = storeDirOf(store)
    val docs = Files.createTempDirectory("clidocs")
    Files.writeString(docs.resolve("readme.md"),
      "# My Project\n\nFeature: CLI Support\nStatus: Completed.\n")
    assert(Cli.run(spark, dir, "ingest-docs", List(s"$docs/*")).isEmpty)
    val ds = Cli.run(spark, dir, "doc-stats", Nil).get.collect()(0)
    assert(ds.getAs[Long]("nDocuments") >= 1L)
    assert(ds.getAs[Long]("nFeatures") >= 1L)
  }

  test("cli: ingest-go then search finds parsed entities") {
    val src = Files.createTempDirectory("cligo")
    Files.writeString(src.resolve("m.go"),
      "package m\n\nfunc Greet() string {\n\treturn \"hi\"\n}\n")
    val store = FixtureGraph.store(spark)
    val dir = storeDirOf(store)
    assert(Cli.run(spark, dir, "ingest-go",
      List(s"$src/*.go", "gosvc")).isEmpty)
    val got = Cli.run(spark, dir, "search", List("Greet")).get.collect()
    assert(got.exists(_.getAs[String]("name") == "Greet"))
  }

  test("cli: schema lists merge-key constraints per label") {
    val store = FixtureGraph.store(spark)
    val rows = Cli.run(spark, storeDirOf(store), "schema", Nil)
      .get.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("Symbol") === "symbol")
    assert(rows("Function") === "signature,filePath")
    assert(rows.size === graft.model.Model.MergeKeys.size)
  }

  test("cli: impact by function name") {
    val store = FixtureGraph.store(spark)
    val out = Cli.run(spark, storeDirOf(store), "impact", List("Main"))
      .get.collect()
    assert(out.map(_.getAs[String]("name")).toSet ===
      Set("Helper", "Deep", "Handler"))
  }

  private def storeDirOf(store: graft.store.GraphStore): String =
    store.basePath
}
