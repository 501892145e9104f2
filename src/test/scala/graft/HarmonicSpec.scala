package graft

import graft.queries.GraphQueries

/** q217/q218: multi-source BFS centralities vs a naive queue BFS. */
class HarmonicSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The part-derived graph the Spark side uses (tree ∪ shortcut). */
  private def edges(): Seq[(Long, Long)] = {
    val keys = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0))
    val tree = keys.filter(_ >= 2).map(k => (k, k / 2))
    val shortcut = keys.filter(k => k != (k * k) % 1000)
      .map(k => (k, (k * k) % 1000))
    (tree ++ shortcut).toSeq
  }

  private def bfs(adj: Map[Long, Seq[Long]], seed: Long, maxHops: Int)
      : Map[Long, Long] = {
    val dist = scala.collection.mutable.Map(seed -> 0L)
    var frontier = Seq(seed)
    var d = 0L
    while (frontier.nonEmpty && d < maxHops) {
      d += 1
      frontier = frontier.flatMap(v => adj.getOrElse(v, Nil))
        .distinct.filterNot(dist.contains)
      frontier.foreach(v => dist(v) = d)
    }
    dist.toMap
  }

  test("q217 harmonic centrality matches a naive queue BFS") {
    val es = edges().distinct
    val adj = es.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = Tables.part(spark, sf)
      .filter(org.apache.spark.sql.functions.col("p_partkey") <= 8)
      .select("p_partkey").collect().map(_.getLong(0))
    val want = seeds.map { s =>
      val d = bfs(adj, s, 6) - s
      (s, d.size.toLong, d.values.map(1000000L / _).sum)
    }.filter(_._2 > 0).sortBy(x => (-x._3, x._1))
    val got = GraphQueries.q217_harmonic_centrality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("q257 landmark estimates are admissible and match a naive mirror") {
    // undirected tree∪chain graph, symmetrized (the q257 edge set)
    val keys = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0))
    val und = keys.filter(_ >= 2)
      .flatMap(k => Seq((k, k / 2), (k, k - 1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap
    val h = 12
    val landmarks = keys.filter(k => k % 293 == 7 && k <= 60000)
    val sources = keys.filter(k => k % 97 == 5 && k <= 20000)
    val targets = keys.filter(_ % 89 == 7)
    val lDist = landmarks.map(l => l -> bfs(adj, l, h)).toMap
    val sDist = sources.map(s => s -> bfs(adj, s, h)).toMap
    val rows = for {
      u <- sources; w <- targets if u != w
    } yield {
      val est = landmarks.flatMap(l =>
        for (du <- lDist(l).get(u); dw <- lDist(l).get(w))
          yield du + dw).sorted.headOption
      val exact = sDist(u).get(w)
      val stretch = for (e <- exact; d <- est) yield d * 1000000L / e
      (u, w, exact, est, stretch)
    }
    val want = rows
      .sortBy { case (u, w, _, _, st) =>
        (st.isEmpty, -st.getOrElse(0L), u, w) }
      .take(50).toSeq
    val got = GraphQueries.q257_landmark_distance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq === want)
    // admissibility: on the symmetrized graph the landmark sum is an
    // upper bound on the true distance wherever both are settled
    assert(rows.forall { case (_, _, ex, est, _) =>
      ex.isEmpty || est.isEmpty || est.get >= ex.get })
    assert(rows.exists(_._5.isDefined), "no settled pair audited")
  }

  /** Layered BFS with shortest-path counting (Brandes forward pass). */
  private def sigmaBfs(adj: Map[Long, Seq[Long]], seed: Long,
      maxHops: Int): Map[Long, (Long, Long)] = {
    val out = scala.collection.mutable.Map(seed -> (0L, 1L))
    var frontier = Map(seed -> 1L)
    var d = 0L
    while (frontier.nonEmpty && d < maxHops) {
      d += 1
      val next = scala.collection.mutable.Map.empty[Long, Long]
      for ((u, sig) <- frontier; v <- adj.getOrElse(u, Nil)
           if !out.contains(v))
        next(v) = next.getOrElse(v, 0L) + sig
      frontier = next.toMap
      frontier.foreach { case (v, sig) => out(v) = (d, sig) }
    }
    out.toMap
  }

  test("q259 stress centrality matches a naive sigma-BFS mirror") {
    // the q257/q259 substrate: symmetrized tree∪chain over part keys
    val keys = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0))
    val und = keys.filter(_ >= 2)
      .flatMap(k => Seq((k, k / 2), (k, k - 1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap
    val h = 8
    val srcs = keys.filter(k => k % 331 == 3 && k <= 13000)
    val tgts = keys.filter(k => k % 317 == 5 && k <= 13000)
    val sB = srcs.map(s => s -> sigmaBfs(adj, s, h)).toMap
    val tB = tgts.map(t => t -> sigmaBfs(adj, t, h)).toMap
    val stress = scala.collection.mutable.Map.empty[Long, Long]
    for {
      s <- srcs; t <- tgts
      (dst, _) <- sB(s).get(t).toSeq
      v <- sB(s).keySet intersect tB(t).keySet
      if v != s && v != t
      if sB(s)(v)._1 + tB(t)(v)._1 == dst
    } stress(v) = stress.getOrElse(v, 0L) +
      sB(s)(v)._2 * tB(t)(v)._2
    val want = stress.toSeq.sortBy { case (v, p) => (-p, v) }.take(50)
    val got = GraphQueries.q259_stress_centrality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want)
    assert(want.nonEmpty, "no interior node audited")
  }

  test("q218 eccentricity and diameter bound match the same BFS") {
    val es = edges().distinct
    val adj = es.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = Tables.part(spark, sf)
      .filter(org.apache.spark.sql.functions.col("p_partkey") <= 8)
      .select("p_partkey").collect().map(_.getLong(0))
    val eccs = seeds.map { s =>
      val d = bfs(adj, s, 6)
      (s, d.values.max, d.size.toLong)
    }
    val diamLb = eccs.map(_._2).max
    val want = eccs.map { case (s, e, n) => (s, e, n, diamLb) }
      .sortBy(_._1)
    val got = GraphQueries.q218_eccentricity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
  }
}
