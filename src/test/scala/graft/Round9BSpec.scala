package graft

import graft.queries.{CurationQueries, GraphQueries, PlannerQueries}
import graft.pipeline.Sampling

/** Round-9 additions: SALSA (q346), round-limited greedy coloring
  * (q347), Haar wavelet synopsis (q348), Lorenz/Gini (q349), Fano
  * burstiness (q350) — each against a naive single-threaded JVM
  * mirror over collected sf0.001 inputs, plus the operator's own
  * structural invariants (proper coloring, exact invertibility,
  * decile monotonicity).
  */
class Round9BSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ---- q346 SALSA -----------------------------------------------------

  test("q346 equals a JVM 4-round SALSA mirror and drifts toward the " +
      "degree-proportional stationary") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .flatMap(r => orders.get(r.getLong(0)).map(c =>
        (c, r.getLong(1)))).distinct.toSeq
    val dc = edges.groupBy(_._1).map { case (c, g) => (c, g.size.toLong) }
    val dp = edges.groupBy(_._2).map { case (p, g) => (p, g.size.toLong) }
    var h = dc.map { case (c, _) => (c, 1000000L) }
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      a = edges.groupBy(_._2).map { case (p, g) =>
        (p, g.map { case (c, _) => h(c) / dc(c) }.sum) }
      h = edges.groupBy(_._1).map { case (c, g) =>
        (c, g.map { case (_, p) => a(p) / dp(p) }.sum) }
    }
    val ta = a.values.map(BigInt(_)).sum
    val ne = BigInt(edges.size)
    val want = a.toSeq.sortBy { case (p, av) => (-av, p) }.take(15)
      .map { case (p, av) =>
        val share = (BigInt(av) * 1000000 / ta).toLong
        val stat = (BigInt(dp(p)) * 1000000 / ne).toLong
        (p, av, share, stat, math.abs(share - stat))
      }
    val got = GraphQueries.q346_salsa(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  // ---- q347 round-limited greedy coloring ----------------------------

  test("q347 equals a JVM local-max coloring mirror, is a PROPER " +
      "coloring, and reports zero conflicts") {
    val keys = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0)).toSeq
    val fwd = keys.filter(_ >= 2L).map(k => (k, k / 2)) ++
      keys.filter(k => k != (k * k) % 1000)
        .map(k => (k, (k * k) % 1000))
    val sym = (fwd ++ fwd.map(_.swap)).distinct
    val nbr = sym.groupBy(_._1).map { case (v, g) =>
      (v, g.map(_._2)) }
    def h(v: Long): Long = Sampling.hash60Jvm("color", v)
    var active = keys.toSet
    val colorOf = scala.collection.mutable.Map.empty[Long, Long]
    for (r <- 1 to 24) {
      val winners = active.filter(v => nbr.getOrElse(v, Nil)
        .forall(w => !active(w) || h(w) < h(v)))
      winners.foreach(v => colorOf(v) = r.toLong)
      active --= winners
    }
    active.foreach(v => colorOf(v) = 0L)
    // properness: no edge joins two same-colored (>0) vertices —
    // shortcut targets k²%1000 outside the key range are not nodes
    // (both engines drop them at the coloring join), skip them here too
    val keySet = keys.toSet
    sym.filter(e => keySet(e._1) && keySet(e._2)).foreach {
      case (u, w) =>
        assert(!(colorOf(u) == colorOf(w) && colorOf(u) > 0),
          s"conflict on edge ($u,$w) color ${colorOf(u)}")
    }
    val maxDeg = nbr.values.map(_.size.toLong).max
    val want = colorOf.values.groupBy(identity).map { case (c, g) =>
      (c, g.size.toLong, 0L, maxDeg) }.toSeq.sortBy(_._1)
    val got = GraphQueries.q347_greedy_coloring(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
  }

  // ---- q348 Haar synopsis ---------------------------------------------

  private def haarForward(cells: Array[Long])
      : (Long, Seq[(Int, Int, Long)]) = {
    var level = cells.clone()
    val details =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    for (k <- 1 to 6) {
      val next = new Array[Long](level.length / 2)
      for (j <- next.indices) {
        next(j) = level(2 * j) + level(2 * j + 1)
        details += ((k, j, level(2 * j) - level(2 * j + 1)))
      }
      level = next
    }
    (level(0), details.toSeq)
  }

  private def haarInverse(root: Long,
      kept: Map[(Int, Int), Long]): Array[Long] = {
    var rec = Array(root)
    for (k <- 6 to 1 by -1) {
      val next = new Array[Long](rec.length * 2)
      for (j <- rec.indices) {
        val d = kept.getOrElse((k, j), 0L)
        next(2 * j) = math.max(rec(j) + d, 0L) / 2
        next(2 * j + 1) = math.max(rec(j) - d, 0L) / 2
      }
      rec = next
    }
    rec
  }

  test("q348 equals the JVM Haar mirror, and keeping ALL details " +
      "reconstructs the histogram exactly") {
    val got0 = Tables.events(spark, sf)
      .selectExpr("least(63, cast(floor(value * 100) as bigint)" +
        " div 800) as cell")
      .groupBy("cell").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cells = (0 until 64)
      .map(i => got0.getOrElse(i.toLong, 0L)).toArray
    val (root, details) = haarForward(cells)
    // invertibility: all 63 details kept → exact histogram
    val full = haarInverse(root,
      details.map { case (k, j, d) => ((k, j), d) }.toMap)
    assert(full.toSeq === cells.toSeq)
    // top-8 selection, same tie-break as both engines
    val kept = details.sortBy { case (k, j, d) =>
      (-math.abs(d), k, j) }.take(8)
      .map { case (k, j, d) => ((k, j), d) }.toMap
    val rec = haarInverse(root, kept)
    val want = (0 until 64).map(i => (i.toLong, cells(i), rec(i),
      math.abs(cells(i) - rec(i))))
    val got = PlannerQueries.q348_haar_synopsis(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
    // the synopsis preserves total mass within 64 floor losses
    assert(math.abs(rec.sum - cells.sum) <= 64L)
  }

  // ---- q349 Lorenz / Gini ---------------------------------------------

  test("q349 equals a naive full-rank Lorenz/Gini mirror and the " +
      "curve is monotone convex-ish (non-decreasing shares)") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0)).filter(_.trim.nonEmpty)
      .flatMap(_.trim.split("\\s+"))
    val freqs = toks.groupBy(identity).values.map(_.size.toLong)
      .toSeq.sorted // ascending frequency = Lorenz order
    val n = freqs.size.toLong
    val t = freqs.map(BigInt(_)).sum
    val s = freqs.zipWithIndex
      .map { case (f, i) => BigInt(f) * (i + 1) }.sum
    val gini = ((2 * s - (BigInt(n) + 1) * t) * 1000000 /
      (BigInt(n) * t)).toLong
    val cum = freqs.scanLeft(BigInt(0))(_ + _)
    val want = (1L to 10L).map { d =>
      val k = d * n / 10
      (d, k, (cum(k.toInt) * 1000000 / t).toLong, gini)
    }
    val got = CurationQueries.q349_lorenz_gini(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
    // Lorenz curve of an ascending sort is non-decreasing and ends at 1
    assert(got.map(_._3) === got.map(_._3).sorted)
    assert(got.last._3 === 1000000L)
  }

  // ---- q350 Fano burstiness ---------------------------------------------

  test("q350 equals a naive per-doc-count Fano mirror") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.trim.nonEmpty)
    val nDocs = docs.length.toLong
    val perDoc = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").groupBy(identity).map { case (tok, g) =>
        (tok, g.length.toLong) }
    }
    val want = perDoc.groupBy(_._1).map { case (tok, g) =>
      val df = g.length.toLong
      val tf = g.map(_._2).sum
      val s2 = g.map(c => BigInt(c._2) * c._2).sum
      val fano = ((BigInt(nDocs) * s2 - BigInt(tf) * tf) * 1000 /
        (BigInt(nDocs) * tf)).toLong
      (tok, df, tf, nDocs, fano)
    }.toSeq.filter(_._2 >= 5L)
      .sortBy { case (tok, _, _, _, f) => (-f, tok) }.take(20)
    val got = CurationQueries.q350_fano_burstiness(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }
}
