package graft

import graft.queries.{GraphQueries, QualityQueries}

/** Round-9 closure of the round-8 tail (VERDICT r8 tasks 2–3):
  * semantic mirrors for q343 (degree assortativity) and q344
  * (weighted multiset Jaccard) — a naive single-threaded JVM
  * recompute over collected inputs, exact to the integer-ppm bit,
  * plus a crafted multiset corpus that set-based Jaccard cannot
  * distinguish.
  */
class Round9Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ---- q343 assortativity -------------------------------------------

  /** Mirror of layerStats: exact integer r² in ppm-of-1000² with the
    * same floor-division order as both engines. */
  private def assortMirror(edges: Seq[(Long, Long)])
      : (Long, Long, Long) = {
    val sym = edges ++ edges.map { case (s, d) => (d, s) }
    val deg = sym.groupBy(_._1).map { case (v, g) =>
      (v, g.size.toLong) }
    val xy = sym.map { case (s, d) => (deg(s), deg(d)) }
    val n = BigInt(xy.size)
    val sx = xy.map(p => BigInt(p._1)).sum
    val sy = xy.map(p => BigInt(p._2)).sum
    val sxy = xy.map(p => BigInt(p._1) * p._2).sum
    val sxx = xy.map(p => BigInt(p._1) * p._1).sum
    val syy = xy.map(p => BigInt(p._2) * p._2).sum
    val cov = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val r2 =
      if (vx == 0 || vy == 0) BigInt(0)
      else (cov.abs * 1000 / vx) * (cov.abs * 1000 / vy)
    (xy.size.toLong, cov.signum.toLong, r2.toLong)
  }

  test("q343 equals a JVM Pearson mirror on all three layers") {
    val keys = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0))
    val tree = keys.filter(_ >= 2L).map(k => (k, k / 2)).toSeq
    val shortcut = keys.filter(k => k != (k * k) % 1000)
      .map(k => (k, (k * k) % 1000)).toSeq
    val want = Seq(
      ("all", assortMirror(tree ++ shortcut)),
      ("shortcut", assortMirror(shortcut)),
      ("tree", assortMirror(tree)))
      .map { case (l, (n, sg, r2)) => (l, n, sg, r2) }
    val got = GraphQueries.q343_assortativity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
    // the tree layer is disassortative by construction (hubs near the
    // root attach to lower-degree children) — sign must be negative
    assert(got.find(_._1 == "tree").get._3 === -1L)
  }

  // ---- q344 weighted Jaccard ----------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Naive weighted-Jaccard mirror: fingerprint blocks over the first
    * 8 tokens, per-block member cap by min doc id, Σmin/Σmax over
    * token multiplicities, floor-ppm threshold. Empty-token docs pair
    * only inside the md5("") block and die at the sizes join in both
    * engines, so the mirror drops them upfront. */
  private def wjMirror(docs: Seq[(Long, String)], cap: Int,
      thresholdPpm: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      val s = t.toLowerCase.trim
      (id, if (s.isEmpty) Seq.empty[String]
      else s.split("\\s+").toSeq)
    }.filter(_._2.nonEmpty)
    val blocks = toks
      .map { case (id, tk) =>
        (md5hex(tk.take(8).mkString(" ")), id, tk) }
      .groupBy(_._1).values
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    blocks.foreach { g =>
      val members = g.sortBy(_._2).take(cap)
      for {
        i <- members.indices
        j <- (i + 1) until members.size
      } {
        val (_, ida, tka) = members(i)
        val (_, idb, tkb) = members(j)
        val ca = tka.groupBy(identity).map { case (t, x) =>
          (t, x.size.toLong) }
        val cb = tkb.groupBy(identity).map { case (t, x) =>
          (t, x.size.toLong) }
        val interMin = ca.keySet.intersect(cb.keySet).toSeq
          .map(t => math.min(ca(t), cb(t))).sum
        val unionMax = tka.size.toLong + tkb.size.toLong - interMin
        val jw = interMin * 1000000L / unionMax
        if (jw >= thresholdPpm)
          out += ((ida, idb, interMin, unionMax, jw))
      }
    }
    out.sortBy(p => (p._1, p._2)).toSeq
  }

  private def runQ344(docs: Seq[(Long, String)]): Seq[(Long, Long,
      Long, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("wj_corpus").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang",
        "'crafted' AS source", "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    QualityQueries.q344_weighted_jaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("q344 catches multiplicity differences set-Jaccard cannot, " +
      "on a crafted multiset corpus") {
    val prefix = "a b c d e f g h"
    val capBlock = (0 until 12).map(i =>
      (100L + i, s"p q r s t u v w filler$i"))
    val docs = Seq(
      (1L, s"$prefix the the the spam spam"),
      (2L, s"$prefix the spam"),
      (3L, s"$prefix the the the spam spam"),
      (4L, "different prefix entirely x y z w q"),
      (5L, ""), (6L, "   ")) ++ capBlock
    val got = runQ344(docs)
    val want = wjMirror(docs, 10, 200000L)
    assert(got === want)
    // identical multisets: exact duplicate pair (1,3) at jw = 1e6
    assert(got.exists(p => p._1 == 1L && p._2 == 3L &&
      p._5 == 1000000L))
    // (1,2): set-Jaccard is 1.0 (same token SET) but the weighted
    // form sees the multiplicity gap: min Σ = 8 prefix + 1 the +
    // 1 spam = 10, max Σ = 13 + 10 − 10 = 13 → 769230 ppm
    assert(got.exists(p => p._1 == 1L && p._2 == 2L &&
      p._5 == 769230L))
    // cap: the 12-member block pairs only its 10 lowest doc ids
    val inCap = got.filter(p => p._1 >= 100L)
    assert(inCap.forall(p => p._2 <= 109L))
    // empty docs never emit
    assert(got.forall(p => p._1 != 5L && p._2 != 6L))
  }

  // ---- q345 weighted-MinHash estimator ------------------------------

  private def hash60Str(salt: String, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$s".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private val WmhP = 1073741789L

  /** K×MinHash signature of a token multiset via multiset expansion —
    * the exact JVM twin of q345's Carter–Wegman chain. */
  private def wmhSig(tk: Seq[String]): Seq[Long] = {
    val counts = tk.groupBy(identity).map { case (t, g) =>
      (t, g.size) }
    val bases = counts.toSeq.flatMap { case (t, c) =>
      (1 to c).map(k => hash60Str("wmh", s"$t|$k") % WmhP) }
    QualityQueries.wmhCoefs.map { case (_, a, b) =>
      bases.map(base => (a * base + b) % WmhP).min }
  }

  private def wmhMirror(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      val s = t.toLowerCase.trim
      (id, if (s.isEmpty) Seq.empty[String]
      else s.split("\\s+").toSeq)
    }.filter(_._2.nonEmpty).toMap
    wjMirror(docs, 10, 200000L).map {
      case (ida, idb, _, _, jw) =>
        val (sa, sb) = (wmhSig(toks(ida)), wmhSig(toks(idb)))
        val m = sa.zip(sb).count { case (x, y) => x == y }.toLong
        val est = m * 1000000L / 32
        (ida, idb, jw, m, est, math.abs(est - jw))
    }
  }

  test("q345 equals the JVM K-MinHash mirror on the crafted corpus, " +
      "and identical multisets estimate exactly 1e6") {
    import spark.implicits._
    val prefix = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$prefix the the the spam spam"),
      (2L, s"$prefix the spam"),
      (3L, s"$prefix the the the spam spam"),
      (4L, s"$prefix x y z w unrelated tail tokens here"))
    val dir = java.nio.file.Files
      .createTempDirectory("wmh_corpus").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang",
        "'crafted' AS source", "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = QualityQueries.q345_weighted_minhash(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === wmhMirror(docs))
    // identical multisets (1,3): every minhash matches
    val p13 = got.find(p => p._1 == 1L && p._2 == 3L).get
    assert(p13._4 === 32L && p13._5 === 1000000L && p13._6 === 0L)
  }

  test("q345 equals the JVM mirror on the sf0.001 corpus and the " +
      "estimator lands within 4 sigma of the exact weighted Jaccard") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = wmhMirror(docs)
    val got = QualityQueries.q345_weighted_minhash(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // binomial sanity: sd of est ≈ sqrt(j(1−j)/32) ≤ ~88 000 ppm;
    // 4 sigma ≈ 354 000 ppm — a loose but real estimator-quality gate
    got.foreach { case (_, _, jw, _, est, _) =>
      assert(math.abs(est - jw) <= 354000L,
        s"estimator off by ${math.abs(est - jw)} ppm (jw=$jw est=$est)")
    }
  }

  test("q344 equals the JVM mirror on the sf0.001 corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = wjMirror(docs, 10, 200000L)
    val got = QualityQueries.q344_weighted_jaccard(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(got.nonEmpty) // the corpus has template near-dups
  }
}
