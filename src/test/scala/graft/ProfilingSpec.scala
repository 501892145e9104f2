package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ProfilingQueries

/** q201–q204 statistical-profiling operators, each checked against an
  * independent single-threaded Scala mirror over the collected sf0.001
  * tables — never against itself. */
class ProfilingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q201 covariance sums match a naive mirror exactly") {
    val emb = Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    def q(x: Float): Long = math.floor(x.toDouble * 10000 + 0.5).toLong
    val got = ProfilingQueries.q201_embed_covariance(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size === 36)
    for { i <- 0 until 8; j <- i until 8 } {
      val xi = emb.map(v => q(v(i)))
      val xj = emb.map(v => q(v(j)))
      val want = (emb.length.toLong, xi.sum, xj.sum,
        xi.zip(xj).map { case (a, b) => a * b }.sum)
      assert(got((i, j)) === want, s"pair ($i,$j)")
    }
  }

  test("q202 t-closeness matches a naive EMD mirror exactly") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0),
        math.min(math.floor(r.getDouble(1) / 50000).toLong, 9L)))
    val n = rows.length.toLong
    val globalCum = (0 until 10).map { b =>
      rows.count(_._2 <= b).toLong
    }
    val want = rows.map(_._1).distinct.sorted.map { g =>
      val grp = rows.filter(_._1 == g)
      val ng = grp.length.toLong
      val d = (0 until 9).map { b =>
        val cum = grp.count(_._2 <= b).toLong
        math.abs(cum * 1000000L / ng - globalCum(b) * 1000000L / n)
      }.sum
      g -> d / 9L
    }.toMap
    val got = ProfilingQueries.q202_tcloseness(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // a perfectly representative group would have t = 0; synthetic
    // groups are near-uniform so t stays well under total (10^6)
    assert(got.values.forall(t => t >= 0L && t < 1000000L))
  }

  test("q203 KMV intersection matches a naive sketch mirror exactly") {
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sets = docs.flatMap { case (src, text) =>
      val even = src.drop(3).toInt % 2 == 0
      val t = text.trim
      val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+")
      toks.sliding(2).filter(_.length == 2)
        .map(p => (even, p.mkString(" "))).toSeq
    }.distinct
    val k = 64
    def sketch(even: Boolean): Seq[Long] = sets.filter(_._1 == even)
      .map { case (_, tok) => (md5hash60(tok), tok) }
      .sortBy(identity).take(k).map(_._1)
    val a = sketch(true).toSet
    val b = sketch(false).toSet
    val union = (a ++ b).toSeq.sorted.take(k)
    val cnt = union.length.toLong
    val kth = union.max
    val estUnion = if (cnt < k) cnt
      else math.floor((k - 1).toDouble * 1152921504606846976.0 / kth)
        .toLong
    val matches = union.count(h => a.contains(h) && b.contains(h)).toLong
    val exactUnion = sets.map(_._2).distinct.length.toLong
    val exactInter = sets.filter(_._1).map(_._2)
      .intersect(sets.filterNot(_._1).map(_._2)).distinct.length.toLong
    val r = ProfilingQueries.q203_kmv_intersection(spark, sf).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getInt(0) === k)
    assert(row.getLong(1) === estUnion)
    assert(row.getLong(2) === matches)
    assert(row.getLong(3) === matches * 1000000L / cnt)
    assert(row.getLong(4) === matches * estUnion / cnt)
    assert(row.getLong(5) === exactUnion)
    assert(row.getLong(6) === exactInter)
  }

  test("q204 median/MAD outliers match a naive mirror exactly") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "cast(floor(value * 100 + 0.5) as long)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((s.length + 1) / 2) - 1)
    }
    val want = ev.map(_._1).distinct.sorted.map { g =>
      val vs = ev.filter(_._1 == g).map(_._2).toSeq
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      val out = vs.count(v => math.abs(v - med) > 3 * mad).toLong
      g -> (vs.length.toLong, med, mad, out)
    }.toMap
    val got = ProfilingQueries.q204_robust_outliers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
  }

  test("q229 standardization audit matches a naive z-score mirror") {
    val rows = Tables.embeddings(spark, sf)
      .selectExpr("slice(embedding, 1, 8)").collect()
      .map(_.getSeq[Float](0).toArray)
    val want = (0 until 8).map { d =>
      val es = rows.map(v => math.floor(v(d).toDouble * 100 + 0.5).toLong)
      val n = es.length.toLong
      val s1 = es.sum
      val s2 = es.map(e => e * e).sum
      val out = es.count(e =>
        (e * n - s1) * (e * n - s1) > 9 * (n * s2 - s1 * s1)).toLong
      (d.toLong, n, s1, s2, out)
    }
    val got = ProfilingQueries.q229_embed_standardize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === want)
    // 3-sigma outliers are by construction a small tail (< 5% of rows
    // even for heavy-tailed data, by Chebyshev: P(|z|>3) <= 1/9)
    got.foreach { case (_, n, _, _, out) => assert(out * 9 <= n) }
  }
}
