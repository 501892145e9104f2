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

  test("LSM deltas: add/override/tombstone fold correctly; compaction " +
      "and fresh instances agree; auto-compact bounds pending deltas") {
    import org.apache.spark.sql.Row
    val dir = java.nio.file.Files.createTempDirectory("graft-lsm").toString
    val st = new GraphStore(spark, dir)
    def nRow(id: Long, name: String): Row =
      Row.fromSeq(Model.nodeSchema.fields.toSeq.map(_.name).map {
        case "id" => Long.box(id)
        case "label" => "Service"
        case "name" => name
        case _ => null
      })
    st.mergeNodes(Seq((1L, "Service", "a"), (2L, "Service", "b"))
      .toDF("id", "label", "name"))
    // delta 1: add c, tombstone a
    st.appendDelta("nodes", Seq(nRow(3L, "c")), Seq(Seq(1L)))
    def names(g: GraphStore): Set[String] =
      g.nodes.select("name").collect().map(_.getString(0)).toSet
    assert(names(st) === Set("b", "c"))
    // delta 2: override b, re-add a (newer add beats older tomb)
    st.appendDelta("nodes", Seq(nRow(2L, "b2"), nRow(1L, "a2")), Nil)
    assert(names(st) === Set("a2", "b2", "c"))
    // same-delta tomb + re-add of one key: the add wins
    st.appendDelta("nodes", Seq(nRow(3L, "c2")), Seq(Seq(3L)))
    assert(names(st) === Set("a2", "b2", "c2"))
    assert(st.pendingDeltas("nodes") === 3)
    // a FRESH instance reconstructs the same view from the JSONL files
    val fresh = new GraphStore(spark, dir)
    assert(names(fresh) === Set("a2", "b2", "c2"))
    // compaction folds to a clean base without changing the view
    st.compact("nodes")
    assert(st.pendingDeltas("nodes") === 0)
    assert(names(st) === Set("a2", "b2", "c2"))
    assert(names(new GraphStore(spark, dir)) === Set("a2", "b2", "c2"))
    // auto-compact keeps the pending count bounded
    (1 to 4).foreach(i =>
      st.appendDelta("nodes", Seq(nRow(100L + i, s"x$i")), Nil,
        autoCompactAfter = 3))
    assert(st.pendingDeltas("nodes") < 3)
    assert(names(st) === Set("a2", "b2", "c2", "x1", "x2", "x3", "x4"))
  }
}
