package graft

import graft.queries.StatQueries

/** q208–q210: HLL registers, skip-gram pairs, KS test — each against a
  * naive single-threaded mirror over collected sf0.001 tables. */
class StatSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q208 HLL estimate matches a naive register mirror exactly") {
    val users = Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val m = 64
    def sketch(ids: Seq[Long]): Array[Int] = {
      val regs = new Array[Int](m)
      ids.foreach { u =>
        val h = md5hash60(s"hll:$u")
        val bucket = (h % m).toInt
        val rest = h / m
        val rho =
          if (rest == 0) 55
          else 55 - java.lang.Long.toBinaryString(rest).length
        regs(bucket) = regs(bucket).max(rho)
      }
      regs
    }
    def estimate(regs: Array[Int]): Long = {
      val s = regs.map(r => 1L << (55 - r)).sum
      val num = BigInt(709440L) * (m * m) * BigInt("36028797018963968")
      (num / (BigInt(s) * 1000000)).toLong
    }
    val types = users.map(_._1).distinct
    val perType = types.map { t =>
      t -> sketch(users.filter(_._1 == t).map(_._2).toSeq)
    }.toMap
    val merged = perType.values
      .reduce((a, b) => a.zip(b).map { case (x, y) => x.max(y) })
    val want = (perType.map { case (t, regs) =>
      t -> (estimate(regs),
        users.filter(_._1 == t).map(_._2).distinct.length.toLong)
    } + ("ALL" -> (estimate(merged),
      users.map(_._2).distinct.length.toLong)))
      .map { case (t, (est, exact)) =>
        t -> (est, exact, math.abs(est - exact) * 1000000L / exact)
      }
    val got = StatQueries.q208_hll_registers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    // the raw estimator (no linear-counting correction) is only
    // meaningful once n ≳ m; below that it's deliberately biased high
    // (documented) — just require positivity there
    got.foreach { case (t, (est, exact, _)) =>
      if (exact >= 64)
        assert(est > exact / 2 && est < exact * 2, s"$t: $est vs $exact")
      else assert(est > 0, s"$t: $est")
    }
  }

  test("q223 streamed HLL state equals the batch ALL sketch exactly") {
    // micro-batch max-merge must reproduce the one-shot batch sketch:
    // same estimate, same exact count, same error — bit for bit
    val streamed = StatQueries.q223_stream_hll(spark, sf).collect()(0)
    val batchAll = StatQueries.q208_hll_registers(spark, sf).collect()
      .find(_.getString(0) == "ALL").get
    assert(streamed.getLong(0) === batchAll.getLong(1)) // est
    assert(streamed.getLong(1) === batchAll.getLong(2)) // exact
    assert(streamed.getLong(2) === batchAll.getLong(3)) // err_ppm
  }

  test("q209 skip-gram pairs match a naive mirror") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (_, text) =>
      val t = text.trim
      val toks: Array[String] =
        if (t.isEmpty) Array.empty else t.split("\\s+")
      for {
        i <- toks.indices
        d <- Seq(-2, -1, 1, 2)
        j = i + d
        if j >= 0 && j < toks.length
      } counts((toks(i), toks(j))) =
        counts.getOrElse((toks(i), toks(j)), 0L) + 1L
    }
    val want = counts.toSeq
      .sortBy { case ((c, x), n) => (-n, c, x) }.take(25)
      .map { case ((c, x), n) => (c, x, n) }
    val got = StatQueries.q209_skipgram_pairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === want)
    // symmetry: the ±window means (a,b) and (b,a) have equal counts
    val all = counts
    all.foreach { case ((a, b), n) =>
      assert(all.getOrElse((b, a), 0L) === n, s"asymmetric pair $a/$b")
    }
  }

  test("q210 KS statistic matches a naive mirror exactly") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "cast(floor(value * 100 + 0.5) as long)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(e => e._1 == "click" || e._1 == "view")
    val a = ev.filter(_._1 == "click").map(_._2)
    val b = ev.filter(_._1 == "view").map(_._2)
    val domain = (a ++ b).distinct.sorted
    val best = domain.map { v =>
      val d = math.abs(
        a.count(_ <= v).toLong * 1000000L / a.length -
          b.count(_ <= v).toLong * 1000000L / b.length)
      (d, v)
    }.sortBy { case (d, v) => (-d, v) }.head
    val row = StatQueries.q210_ks_test(spark, sf).collect()(0)
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(row.getLong(2) === best._1)
    assert(row.getLong(3) === best._2)
  }

  test("q237 chi-square of proportions matches a BigInt mirror") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val per = docs.groupBy(_._1).view.mapValues { ds =>
      (ds.count(_._2 >= 200).toLong, ds.count(_._2 < 200).toLong)
    }.toMap
    val (ka, kb) = (per.values.map(_._1).sum, per.values.map(_._2).sum)
    val want = per.toSeq.sortBy(_._1).map { case (src, (a, b)) =>
      val (c, d) = (ka - a, kb - b)
      val num = BigInt(a + b + c + d) *
        (BigInt(a) * d - BigInt(b) * c).pow(2) * 1000
      val den = BigInt(a + b) * (c + d) * (a + c) * (b + d)
      (src, a, b, c, d, (num / den).toLong)
    }
    val got = graft.queries.StatQueries.q237_chi2_proportions(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want)
  }

  test("q251 rolling HLL WAU matches a register-formula mirror") {
    val rows = graft.queries.StatQueries
      .q251_rolling_hll_wau(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val actives = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 86400000000000").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val d1 = actives.map(_._2).max
    def rawEstimate(users: Set[Long]): Long = {
      val m = 64
      val regs = Array.fill(m)(0)
      users.foreach { u =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"hll:$u".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16)
        val b = (h % m).toInt
        val rest = h / m
        val rho = 55 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
        if (rho > regs(b)) regs(b) = rho.toInt
      }
      val den = regs.map(r => 1L << (55 - r)).sum
      (BigInt(709440L) * (m * m) * 36028797018963968L /
        (BigInt(den) * 1000000L)).toLong
    }
    val want = actives.flatMap(a => (a._2 to a._2 + 6).map(d => (d, a)))
      .filter(_._1 <= d1)
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (day, as) =>
        val users = as.map(_._2._1).toSet
        (day, rawEstimate(users), users.size.toLong)
      }
    val got = rows.map(r => (r._1, r._2, r._3))
    assert(got.toSeq === want)
    rows.foreach { case (_, est, ex, err) =>
      assert(err === math.abs(est - ex) * 1000000L / ex)
    }
  }

  test("q252 histogram quantiles match a naive mirror; error shrinks " +
      "with B") {
    val vs = Tables.lineitem(spark, sf)
      .selectExpr("cast(floor(l_extendedprice * 100 + 0.5) as long)")
      .collect().map(_.getLong(0)).sorted
    val (lo, hi, n) = (vs.min, vs.max, vs.length.toLong)
    def exactPct(num: Long, den: Long): Long =
      vs(vs.indices.find(i => (i + 1) * den >= n * num).get)
    val (e50, e99) = (exactPct(1, 2), exactPct(99, 100))
    val want = Seq(16L, 64L, 256L).map { b =>
      val counts = vs.groupBy(v => (v - lo) * b / (hi - lo + 1))
        .view.mapValues(_.length.toLong).toMap
      def est(num: Long, den: Long): Long = {
        val need = (n * num + den - 1) / den
        var cum = 0L
        val bucket = counts.keys.toSeq.sorted.find { k =>
          cum += counts(k); cum * den >= n * num
        }.get
        val below = cum - counts(bucket)
        lo + (bucket * (hi - lo + 1)) / b +
          ((hi - lo + 1) / b) * (need - below) / counts(bucket)
      }
      (b, est(1, 2), e50, est(99, 100), e99)
    }
    val got = graft.queries.StatQueries
      .q252_histogram_quantiles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5)))
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._5)).toSeq ===
      want.map(x => (x._1, x._2, x._3, x._4, x._5)))
    // more buckets can only tighten the p50 bracket on this data
    val errs = graft.queries.StatQueries
      .q252_histogram_quantiles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(errs(256L) <= errs(16L))
  }
}
