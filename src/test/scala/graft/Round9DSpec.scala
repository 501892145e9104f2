package graft

import graft.queries.{GraphQueries, PipelineQueries, StatQueries}
import graft.pipeline.Sampling

/** Round-9 batch 3: JL ±1-projection distortion (q353), split-conformal
  * coverage (q354), distributed maximal matching (q355) — exact JVM
  * mirrors over collected sf0.001 inputs plus the operators' own
  * guarantees (JL expectation, conformal validity direction, matching
  * validity + maximality).
  */
class Round9DSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ---- q353 JL distortion ---------------------------------------------

  test("q353 equals a JVM ±1-projection mirror and distortions center " +
      "on 1e6") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val gm = vecs.values.flatMap(_.map(x => math.abs(x))).max
    def quant(v: Array[Float]): Array[Long] =
      if (gm > 0.0f)
        v.map(x => math.floor(x.toDouble / gm.toDouble * 127.0 + 0.5)
          .toLong)
      else v.map(_ => 0L)
    def sgn(i: Long, d: Long): Long =
      1L - 2L * (Sampling.hash60Jvm("jl", i * 64 + d) % 2)
    def proj(q: Array[Long]): Array[Long] =
      (0L until 16L).map(i =>
        q.zipWithIndex.map { case (x, d) => sgn(i, d) * x }.sum)
        .toArray
    val sampled = vecs.keys.filter(_ % 37 == 0).toSeq.sorted
    val want = (for {
      a <- sampled
      k <- 1 to 3
      b = a + 37L * k
      if vecs.contains(b)
    } yield {
      val (qa, qb) = (quant(vecs(a)), quant(vecs(b)))
      val d2e = qa.zip(qb).map { case (x, y) => (x - y) * (x - y) }.sum
      val (pa, pb) = (proj(qa), proj(qb))
      val d2p = pa.zip(pb).map { case (x, y) => (x - y) * (x - y) }.sum
      val dist = if (d2e == 0) -1L else d2p * 1000000L / (16L * d2e)
      (a, b, d2e, d2p, dist)
    }).sortBy(p => (p._1, p._2))
    val got = PipelineQueries.q353_jl_distortion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // JL: E[d2_proj] = k·d2_exact — the mean distortion must sit near
    // 1e6 (±30% for 16 output dims over this sample)
    val ds = got.map(_._5).filter(_ >= 0)
    val mean = ds.sum / ds.size
    assert(mean > 700000L && mean < 1300000L,
      s"mean distortion $mean ppm drifted from the JL expectation")
  }

  // ---- q354 split-conformal coverage ----------------------------------

  test("q354 equals a JVM order-statistic mirror and coverage sits " +
      "near the 90% target") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100).toLong))
    // mirror the engines' semantics: a type whose rows all hash to one
    // side of the split is DROPPED by the inner join on calibration
    // stats (and can have no coverage row) — guard the divisions here
    // the same way instead of crashing on nCal/nTest = 0
    val want = ev.groupBy(_._2).toSeq.flatMap { case (t, g) =>
      val (cal, test) = g.partition(e =>
        Sampling.hash60Jvm("conf", e._1) % 2 == 0)
      if (cal.isEmpty || test.isEmpty) None else Some {
      val nCal = cal.length.toLong
      val meanMc = cal.map(_._3).sum * 1000 / nCal
      val calScores = cal.map(e => math.abs(e._3 * 1000 - meanMc))
        .sorted
      val rk = ((nCal + 1) * 9 + 9) / 10
      val q90 = if (rk > nCal) Long.MaxValue
      else calScores(rk.toInt - 1)
      val nTest = test.length.toLong
      val nCov = test.count(e =>
        math.abs(e._3 * 1000 - meanMc) <= q90).toLong
      (t, nCal, q90, nTest, nCov, nCov * 1000000L / nTest)
    } }.sortBy(_._1)
    val got = StatQueries.q354_conformal_coverage(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
    // conformal validity direction: coverage ≥ 90% holds in
    // expectation; allow sampling slack downward but catch nonsense
    got.foreach { case (t, _, _, _, _, cov) =>
      assert(cov > 800000L && cov <= 1000000L,
        s"$t coverage $cov ppm is not conformal-shaped")
    }
  }

  // ---- q356 Huffman audit ---------------------------------------------

  test("q356 is a complete prefix code (Kraft equality), beats the " +
      "fixed-width baseline, and matches a heap-based recompute") {
    val got = graft.queries.PlannerQueries
      .q356_huffman_audit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got.size === 64)
    val lens = got.map(_._3)
    val lmax = lens.max
    // Kraft EQUALITY for a complete binary prefix code
    assert(lens.map(l => BigInt(2).pow((lmax - l).toInt)).sum ===
      BigInt(2).pow(lmax.toInt))
    // optimality: no prefix code beats Huffman, including 6-bit fixed
    val (huffBits, fixedBits) = (got.head._5, got.head._6)
    assert(huffBits <= fixedBits)
    assert(huffBits === got.map(_._4).sum)
    // independent recompute via a priority queue (different code path
    // from the query's sort-based greedy); total bits must agree —
    // code LENGTH multisets of optimal Huffman trees are unique given
    // the weight multiset tie-broken identically
    case class Node(w: Long, mc: Long, leaves: Set[Int])
    val pq = scala.collection.mutable.PriorityQueue.empty[Node](
      Ordering.by((n: Node) => (-n.w, -n.mc)))
    val ns = got.map(_._2)
    ns.indices.foreach(i => pq.enqueue(Node(ns(i), i, Set(i))))
    val depth = scala.collection.mutable.ArrayBuffer.fill(64)(0L)
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      (a.leaves ++ b.leaves).foreach(l => depth(l) += 1)
      pq.enqueue(Node(a.w + b.w, math.min(a.mc, b.mc),
        a.leaves ++ b.leaves))
    }
    assert(got.map(_._3) === depth.toSeq)
  }

  // ---- q355 maximal matching ------------------------------------------

  test("q355 equals a JVM round replay; the matching is valid and " +
      "maximal") {
    val keys = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0)).toSeq
    val edges0 = Seq(7L, 17L, 23L).flatMap(s =>
      keys.filter(_ > s).map(k => (k - s, k))).distinct
    def h(u: Long, w: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mm:$u|$w".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    var live = edges0.map { case (u, w) => (u, w, h(u, w)) }
    val log = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)] // (round, u, w)
    var r = 0
    while (live.nonEmpty) {
      r += 1
      assert(r <= 64, "mirror matching did not converge")
      val mx = (live.map(e => (e._1, e)) ++ live.map(e => (e._2, e)))
        .groupBy(_._1).map { case (v, g) =>
          (v, g.map(_._2).maxBy(e => (e._3, e._1, e._2))) }
      val matched = live.filter(e =>
        mx(e._1) == e && mx(e._2) == e)
      val mvs = matched.flatMap(e => Seq(e._1, e._2)).toSet
      matched.foreach(e => log += ((r.toLong, e._1, e._2)))
      live = live.filterNot(e => mvs(e._1) || mvs(e._2))
    }
    // validity: no shared endpoints
    val ends = log.flatMap(e => Seq(e._2, e._3))
    assert(ends.size === ends.distinct.size, "matched edges overlap")
    // maximality: every original edge touches a matched vertex
    val endSet = ends.toSet
    edges0.foreach { case (u, w) =>
      assert(endSet(u) || endSet(w), s"unmatched free edge ($u,$w)")
    }
    val tot = log.size.toLong
    val nv = keys.size.toLong
    val want = log.groupBy(_._1).map { case (round, g) =>
      (round, g.size.toLong, tot, nv) }.toSeq.sortBy(_._1)
    val got = GraphQueries.q355_maximal_matching(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    assert(got === want)
  }
}
