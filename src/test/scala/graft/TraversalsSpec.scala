package graft

import graft.graph.Traversals

class TraversalsSpec extends SparkSpec {
  import spark.implicits._

  // diamond + cycle: 1→2, 1→3, 2→4, 3→4, 4→5, 5→2 (cycle back)
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 2L)).toDF("src", "dst")

  test("reachable: min-depth BFS with cycle safety") {
    val seeds = Seq(1L).toDF("id")
    val got = Traversals.reachable(edges, seeds, 10).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("reachable respects maxHops") {
    val seeds = Seq(1L).toDF("id")
    val got = Traversals.reachable(edges, seeds, 1).collect()
      .map(_.getLong(0)).toSet
    assert(got === Set(2L, 3L))
  }

  test("a seed reachable from itself via a cycle IS returned (Cypher parity)") {
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val df = Traversals.reachable(cyc, Seq(1L).toDF("id"), 10).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(df === Map(2L -> 1, 1L -> 2))
    val gx = Traversals.reachableGraphX(spark, cyc, Seq(1L), 10).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gx === df)
  }

  test("closure on a tree gives (ancestor, descendant, depth)") {
    val tree = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Traversals.closure(tree, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 1), (1L, 3L, 1), (2L, 4L, 1), (1L, 4L, 2)))
  }

  test("paths enumerates simple paths only (no cycles)") {
    val seeds = Seq(1L).toDF("id")
    val got = Traversals.paths(edges, seeds, 10).collect()
      .map(r => r.getSeq[Long](r.fieldIndex("path")).toList).toSet
    // all paths start at 1; no node repeats within a path
    assert(got.forall(p => p.head == 1L && p.distinct.length == p.length))
    // longest simple path: 1→2→4→5 or 1→3→4→5 then →2 (only via 5→2 for the 3-branch)
    assert(got.contains(List(1L, 2L, 4L, 5L)))
    assert(got.contains(List(1L, 3L, 4L, 5L, 2L)))
  }

  test("closureTreeDoubling equals closureTree on a deep chain + forest") {
    // chain 1→2→…→20 plus a branching forest
    val chain = (1L until 20L).map(i => (i, i + 1))
    val forest = Seq((100L, 101L), (100L, 102L), (101L, 103L),
      (101L, 104L), (103L, 105L))
    val es = (chain ++ forest).toDF("src", "dst")
    for (cap <- Seq(1, 2, 5, 12, 30)) {
      val linear = Traversals.closureTree(es, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val doubling = Traversals.closureTreeDoubling(es, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(doubling === linear, s"cap=$cap")
    }
  }

  test("self-loop edges never appear in simple paths (both engines)") {
    val es = Seq((1L, 1L), (1L, 2L)).toDF("src", "dst")
    val df = Traversals.paths(es, Seq(1L).toDF("id"), 3).collect()
      .map(r => r.getSeq[Long](r.fieldIndex("path")).toList).toSet
    val gx = Traversals.pathsGraphX(spark, es, Seq(1L), 3).collect()
      .map(r => r.getSeq[Long](r.fieldIndex("path")).toList).toSet
    assert(df === Set(List(1L, 2L)))
    assert(gx === df)
  }

  test("GraphX Pregel path enumeration agrees with DataFrame paths") {
    def canon(rows: Array[org.apache.spark.sql.Row]): Set[List[Long]] =
      rows.map(r => r.getSeq[Long](r.fieldIndex("path")).toList).toSet
    val df = canon(Traversals.paths(edges, Seq(1L).toDF("id"), 10)
      .collect())
    val gx = canon(Traversals.pathsGraphX(spark, edges, Seq(1L), 10)
      .collect())
    assert(gx === df)
    // depth caps agree too
    val df2 = canon(Traversals.paths(edges, Seq(1L).toDF("id"), 2)
      .collect())
    val gx2 = canon(Traversals.pathsGraphX(spark, edges, Seq(1L), 2)
      .collect())
    assert(gx2 === df2)
  }

  test("GraphX Pregel reachability agrees with DataFrame BFS") {
    val df = Traversals.reachable(edges, Seq(1L).toDF("id"), 10).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gx = Traversals.reachableGraphX(spark, edges, Seq(1L), 10).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(df === gx)
  }

  test("DataFrame-seed overloads equal the collected-seed variants") {
    // multi-seed set, including a seed that is absent from the graph
    // (vanishes in both variants) and one mid-cycle
    val seedSeq = Seq(1L, 5L, 99L)
    val seedDf = seedSeq.toDF("id")
    val rSeq = Traversals.reachableGraphX(spark, edges, seedSeq, 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rDf = Traversals.reachableGraphX(spark, edges, seedDf, 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rDf === rSeq)
    def canon(rows: Array[org.apache.spark.sql.Row]): Set[List[Long]] =
      rows.map(r => r.getSeq[Long](r.fieldIndex("path")).toList).toSet
    val pSeq = canon(Traversals.pathsGraphX(spark, edges, seedSeq, 10)
      .collect())
    val pDf = canon(Traversals.pathsGraphX(spark, edges, seedDf, 10)
      .collect())
    assert(pDf === pSeq)
    assert(rDf.nonEmpty && pDf.nonEmpty)
  }
}
