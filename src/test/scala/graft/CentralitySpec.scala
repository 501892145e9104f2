package graft

import graft.graph.Centrality

class CentralitySpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-threaded mirror of the integer PageRank recurrence. */
  private def naive(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inEdges = edges.groupBy(_._2)
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      rank = nodes.map { v =>
        val s = inEdges.getOrElse(v, Seq.empty)
          .map { case (u, _) => rank(u) / outdeg(u) }.sum
        v -> (150000L + (850000L * s) / 1000000L)
      }.toMap
    }
    rank
  }

  test("pageRankInteger matches the naive recurrence exactly") {
    // a cycle, a chain feeding it, a dangling sink, parallel edges
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 4L),
      (1L, 6L), (4L, 1L)) // (4,1) duplicated: multigraph contribution
    val got = Centrality.pageRankInteger(edges.toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive(edges, 5))
    // sink node 6 exists with base rank flowing in from 1
    assert(got(6L) > 150000L)
    // cycle members outrank the chain tail
    assert(got(1L) > got(5L))
  }

  test("GraphX engine equals the DataFrame engine exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 4L),
      (1L, 6L), (4L, 1L)) ++ (1L to 200L).map(i => (i, i * i % 97))
        .filter { case (a, b) => a != b }
    val df = Centrality.pageRankInteger(edges.toDF("src", "dst"), 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = Centrality.pageRankIntegerGraphX(spark,
        edges.toDF("src", "dst"), 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gx === df)
  }

  test("pageRankInteger is deterministic across partitionings") {
    val edges = (1L to 200L).map(i => (i, i * i % 97))
      .filter { case (a, b) => a != b }
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df7 = edges.toDF("src", "dst").repartition(7)
    val r1 = Centrality.pageRankInteger(df1, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r7 = Centrality.pageRankInteger(df7, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === r7) // integer arithmetic: no partition-order drift
  }
}
