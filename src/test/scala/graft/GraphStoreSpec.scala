package graft

import org.apache.spark.sql.functions._

import graft.model.Model
import graft.store.GraphStore

class GraphStoreSpec extends SparkSpec {
  import spark.implicits._

  test("mergeNodes is idempotent (re-ingest does not duplicate)") {
    val st = FixtureGraph.store(spark)
    val before = st.nodes.count()
    st.mergeNodes(FixtureGraph.nodes(spark))
    assert(st.nodes.count() === before)
    st.mergeEdges(FixtureGraph.edges(spark))
    assert(st.edges.count() === FixtureGraph.edges(spark).count())
  }

  test("mergeNodes keep-latest: incoming wins over existing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ml").toString
    val st = new GraphStore(spark, dir)
    st.mergeNodes(Seq((100L, "Service", "old-name"))
      .toDF("id", "label", "name"))
    st.mergeNodes(Seq((100L, "Service", "new-name"))
      .toDF("id", "label", "name"))
    val names = st.nodes.select("name").collect().map(_.getString(0))
    assert(names.toSeq === Seq("new-name"))
  }

  test("ensureNodeIds derives deterministic ids from merge keys") {
    val a = GraphStore.ensureNodeIds(
      Seq(("Symbol", "scip x y z sym.")).toDF("label", "symbol"))
      .select("id").collect().map(_.getLong(0))
    val b = GraphStore.ensureNodeIds(
      Seq(("Symbol", "scip x y z sym.")).toDF("label", "symbol"))
      .select("id").collect().map(_.getLong(0))
    assert(a.toSeq === b.toSeq)
    // different key → different id
    val c = GraphStore.ensureNodeIds(
      Seq(("Symbol", "scip x y z other.")).toDF("label", "symbol"))
      .select("id").collect().map(_.getLong(0))
    assert(a.toSeq !== c.toSeq)
  }

  test("danglingEdges flags edges with missing endpoints") {
    val dir = java.nio.file.Files.createTempDirectory("graft-de").toString
    val st = new GraphStore(spark, dir)
    st.mergeNodes(Seq((1L, "Service", "s")).toDF("id", "label", "name"))
    st.mergeEdges(Seq((1L, 999L, "CONTAINS")).toDF("src", "dst", "relType"))
    assert(st.danglingEdges().count() === 1L)
  }
}
