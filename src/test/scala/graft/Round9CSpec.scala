package graft

import graft.queries.{GraphQueries, StatQueries}
import graft.pipeline.Sampling

/** Round-9 centerpiece: Borůvka MST with star contraction (q351) —
  * the merge schedule against an exact JVM replay, and the resulting
  * edge set against a sequential Kruskal (union-find), the gold
  * standard the distributed algorithm must reproduce bit-for-bit
  * because the (w, a, b) total order makes the MST unique.
  */
class Round9CSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def hash60Str(salt: String, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$s".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def buildEdges(keys: Seq[Long]): Seq[(Long, Long, Long)] = {
    val tree = keys.filter(_ >= 2L).map(k => (k / 2, k))
    // mirror the query exactly: a = p_partkey − s for every key > s
    val strides = Seq(7L, 17L).flatMap(s =>
      keys.filter(_ > s).map(k => (k - s, k)))
    (tree ++ strides).distinct
      .map { case (a, b) => (a, b, hash60Str("mst", s"$a|$b")) }
  }

  test("q351 merge schedule equals the JVM replay and the edge set " +
      "is Kruskal's unique MST") {
    val keys = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0)).toSeq
    val edges = buildEdges(keys)
    // vertices = part keys ∪ stride endpoints that fall off the key
    // range? boruvka() seeds comp from part keys only, but edges may
    // reference a = k − s outside... those a ARE part keys at every
    // SF (keys are contiguous from 1), assert it:
    val keySet = keys.toSet
    assert(edges.forall(e => keySet(e._1) && keySet(e._2)),
      "edge endpoint outside the vertex set — graph drifted")

    // ---- JVM replay of the star-contraction schedule
    val comp = scala.collection.mutable.Map(keys.map(v => v -> v): _*)
    val log = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)] // (round, a, b, w)
    var r = 0
    var done = false
    while (!done) {
      r += 1
      assert(r <= 96, "mirror did not converge")
      val cross = edges.filter(e => comp(e._1) != comp(e._2))
      if (cross.isEmpty) done = true
      else {
        val cand = cross.flatMap { case (a, b, w) =>
          Seq((comp(a), (w, a, b, comp(b))),
            (comp(b), (w, a, b, comp(a))))
        }
        val sel = cand.groupBy(_._1).map { case (cu, g) =>
          (cu, g.map(_._2).minBy(t => (t._1, t._2, t._3))) }
        def coin(c: Long): Long =
          Sampling.hash60Jvm("coin", c * 131 + r) % 2
        val merges = sel.filter { case (cu, (_, _, _, cv)) =>
          coin(cu) == 0 && coin(cv) == 1 }
        merges.foreach { case (cu, (w, a, b, cv)) =>
          log += ((r.toLong, a, b, w))
          comp.keys.filter(v => comp(v) == cu)
            .foreach(v => comp(v) = cv)
        }
      }
    }
    val want = log.groupBy(_._1).map { case (round, g) =>
      (round, g.size.toLong, g.map(_._4 / 1048576L).sum)
    }.toSeq.sortBy(_._1)
    val got = GraphQueries.q351_boruvka_mst(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(got === want)

    // ---- Kruskal gold standard (union-find over the same order)
    val parent = scala.collection.mutable.Map(keys.map(v => v -> v): _*)
    def find(v: Long): Long = {
      var x = v
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    val kruskal = scala.collection.mutable.Set.empty[(Long, Long)]
    edges.sortBy(e => (e._3, e._1, e._2)).foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; kruskal += ((a, b)) }
    }
    val mstEdges = log.map(e => (e._2, e._3)).toSet
    assert(mstEdges === kruskal.toSet,
      "distributed MST differs from Kruskal")
    // spanning forest: n − (#components) edges (part key 0 has no
    // tree/stride edge at some SFs, so the graph need not be connected)
    val nComponents = keys.map(find).distinct.size
    assert(log.size === keys.size - nComponents)
  }

  // ---- q352 count sketch ----------------------------------------------

  test("q352 equals a JVM count-sketch mirror on the top part keys") {
    val freqs = Tables.lineitem(spark, sf).select("l_partkey")
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val d = 5
    val w = 256L
    def b(k: Long, j: Long): Long =
      Sampling.hash60Jvm("csb", k * d + j) % w
    def s(k: Long, j: Long): Long =
      1L - 2L * (Sampling.hash60Jvm("css", k * d + j) % 2)
    val cells = scala.collection.mutable.Map
      .empty[(Long, Long), Long].withDefaultValue(0L)
    freqs.foreach { case (k, fi) =>
      (0L until d).foreach { j =>
        cells((j, b(k, j))) += s(k, j) * fi
      }
    }
    val want = freqs.toSeq.sortBy { case (k, fi) => (-fi, k) }
      .take(10).map { case (k, fi) =>
        val ests = (0L until d)
          .map(j => (s(k, j) * cells((j, b(k, j))), j)).sorted
        val med = ests(d / 2)._1
        (k, fi, med, math.abs(med - fi) * 1000000L / fi)
      }
    val got = StatQueries.q352_count_sketch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
    assert(got.size === 10)
  }
}
