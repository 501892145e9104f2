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
