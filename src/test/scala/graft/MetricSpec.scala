package graft

import graft.queries.MetricQueries

/** q219–q222: rolling WAU, decay popularity, Cohen's κ, Gini — against
  * naive mirrors over collected sf0.001 tables. */
class MetricSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q264 CUSUM via running-min identity equals the sequential " +
      "recurrence") {
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 86400000000000 as day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), x) => (t, d, x) }
    val mid = (daily.map(_._2).min + daily.map(_._2).max) / 2
    val want = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val base = rows.filter(_._2 <= mid)
      val b = base.length.toLong
      val sb = base.map(_._3).sum
      if (sb <= 0 || b == 0) None else {
        // the SEQUENTIAL recurrence, scaled: S_t = max(0, S + D_t)
        var s = 0L
        val series = rows.sortBy(_._2).map { case (_, d, x) =>
          s = math.max(0L, s + (x * 10 * b - sb * 11))
          (d, s)
        }
        val alarms = series.filter(_._2 > sb * 50)
        Some((t, rows.length.toLong, b, alarms.length.toLong,
          alarms.headOption.map(_._1).getOrElse(-1L),
          series.map(_._2).max))
      }
    }.sortBy(_._1)
    val got = MetricQueries.q264_cusum_changepoint(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want)
    assert(want.nonEmpty)
  }

  test("q266 Bradley-Terry matches a naive quantized-MM mirror") {
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_suppkey",
        "cast(l_shipdate as string) as sd") // ISO order ≡ chrono order
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val wins = scala.collection.mutable.Map.empty[(Long, Long), Long]
    rows.groupBy(_._1).values.foreach { os =>
      for (a <- os; b <- os if a._2 != b._2 && a._3 < b._3)
        wins((a._2, b._2)) = wins.getOrElse((a._2, b._2), 0L) + 1L
    }
    val sups = wins.keySet.flatMap(k => Seq(k._1, k._2)).toSeq.sorted
    val n = sups.map(s => s -> sups.filter(_ != s).map(o =>
      wins.getOrElse((s, o), 0L) + wins.getOrElse((o, s), 0L))
      .sum).toMap
    val w = sups.map(s => s -> sups.filter(_ != s)
      .map(o => wins.getOrElse((s, o), 0L)).sum).toMap
    var r = sups.map(s => s -> 1000000L).toMap
    for (_ <- 1 to 8) {
      r = sups.map { s =>
        val d = sups.filter(o => o != s &&
            wins.getOrElse((s, o), 0L) + wins.getOrElse((o, s), 0L) > 0)
          .map { o =>
            val nij = wins.getOrElse((s, o), 0L) + wins.getOrElse((o, s), 0L)
            BigInt(nij) * BigInt("1000000000000") / (r(s) + r(o))
          }.sum
        val nr = (BigInt(w(s)) * BigInt("1000000000000000000") / d)
          .min(BigInt(1000000000L)).max(BigInt(1000L))
        s -> nr.toLong
      }.toMap
    }
    val want = sups.map(s => (s, w(s), n(s), r(s)))
      .sortBy { case (s, _, _, rt) => (-rt, s) }.take(20)
    val got = MetricQueries.q266_bradley_terry(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(got.toSeq === want)
    assert(want.nonEmpty)
  }

  test("q219 rolling WAU matches a naive window-count mirror") {
    val actives = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 86400000000000").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val d1 = actives.map(_._2).max
    val days = actives.map(_._2).flatMap(d => d to d + 6).distinct
      .filter(_ <= d1).sorted
    val want = days.map { d =>
      d -> actives.filter(a => a._2 >= d - 6 && a._2 <= d)
        .map(_._1).distinct.length.toLong
    }
    val got = MetricQueries.q219_rolling_wau(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toSeq === want.toSeq)
    // the rolling window can only see >= as many users as any single day
    val daily = actives.groupBy(_._2).view.mapValues(
      _.map(_._1).distinct.length.toLong).toMap
    got.foreach { case (d, w) =>
      assert(w >= daily.getOrElse(d, 0L))
    }
  }

  test("q220 decayed mass matches a naive shift mirror exactly") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "ts",
        "cast(floor(value * 100 + 0.5) as long)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val t1 = ev.map(_._2).max
    val want = ev.groupBy(_._1).view.mapValues { es =>
      val raw = es.map(_._3).sum
      val dec = es.map { case (_, ts, v) =>
        val w = (t1 - ts) / 604800000000000L
        if (w >= 60) 0L else v >> w
      }.sum
      (es.length.toLong, raw, dec)
    }.toMap
    val got = MetricQueries.q220_decayed_popularity(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want.toMap)
    // decay never increases mass
    got.values.foreach { case (_, raw, dec) => assert(dec <= raw) }
  }

  test("q221 Cohen's kappa matches a naive mirror exactly") {
    val docs = Tables.documents(spark, sf)
      .select("n_chars", "text").collect()
      .map { r =>
        val t = r.getString(1).trim
        val toks = if (t.isEmpty) 0 else t.split("\\s+").length
        (if (r.getLong(0) >= 200) 1 else 0, if (toks >= 40) 1 else 0)
      }
    val n = docs.length.toLong
    val n11 = docs.count(d => d._1 == 1 && d._2 == 1).toLong
    val n10 = docs.count(d => d._1 == 1 && d._2 == 0).toLong
    val n01 = docs.count(d => d._1 == 0 && d._2 == 1).toLong
    val n00 = docs.count(d => d._1 == 0 && d._2 == 0).toLong
    val po = (n11 + n00) * 1000000L / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) *
      1000000L / (n * n)
    val kappa = (po - pe) * 1000000L / (1000000L - pe)
    val row = MetricQueries.q221_cohens_kappa(spark, sf).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) === ((n, n11, n10, n01, n00)))
    assert(row.getLong(5) === po)
    assert(row.getLong(6) === pe)
    assert(row.getLong(7) === kappa)
  }

  test("q222 Gini matches the naive ranked identity exactly") {
    val rev = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "cast(floor(o_totalprice + 0.5) as long)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).sum) }.toSeq
    val ranked = rev.sortBy(identity).sortBy(r => (r._2, r._1))
      .zipWithIndex.map { case ((_, x), i) => (i + 1L, x) }
    val n = ranked.length.toLong
    val total = ranked.map(_._2).sum
    val rx = ranked.map { case (r, x) => r * x }.sum
    val gini = 2L * rx * 1000000L / (n * total) - (n + 1) * 1000000L / n
    val row = MetricQueries.q222_gini(spark, sf).collect()(0)
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === total)
    assert(row.getLong(2) === gini)
    // Gini of a non-degenerate distribution sits strictly in (0, 1)
    assert(gini > 0L && gini < 1000000L)
  }

  test("q230 Simpson diversity matches a naive per-user mirror") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perUser = ev.groupBy(_._1).map { case (_, es) =>
      val cs = es.groupBy(_._2).values.map(_.length.toLong)
      val n = cs.sum
      val sc2 = cs.map(c => c * c).sum
      1000000L - sc2 * 1000000L / (n * n)
    }.toSeq
    val want = perUser.groupBy(_ / 10000L).toSeq.sortBy(_._1)
      .map { case (centile, ds) =>
        (centile, ds.length.toLong, ds.sum / ds.length,
          ds.min, ds.max)
      }
    val got = MetricQueries.q230_simpson_diversity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq === want)
    // diversity is bounded: 0 (single type) .. 1 - 1/k for k types
    got.foreach { case (_, _, _, mn, mx) =>
      assert(mn >= 0L && mx < 1000000L)
    }
  }

  test("q236 inter-arrival percentiles match a naive sorted mirror") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._2)).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._4)).map(_._3)
      sorted.zip(sorted.tail).map { case (a, b) => (es.head._2, (b - a) / 1000000000L) }
    }.toSeq
    val want = gaps.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, gs) =>
      val sorted = gs.map(_._2).sorted
      val n = sorted.length.toLong
      def pct(p: Long): Long =
        sorted(sorted.indices.find(i => (i + 1) * 100 >= n * p).get)
      (t, n, pct(50), pct(90), pct(99), sorted.max)
    }
    val got = MetricQueries.q236_interarrival(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want)
    // percentiles are monotone: p50 <= p90 <= p99 <= max
    got.foreach { case (_, _, p50, p90, p99, mx) =>
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx)
    }
  }

  test("q242 TV drift matches a naive histogram mirror") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "ts",
        "least(cast(floor(value * 100 + 0.5) as long) div 1000, 9)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (t0, t1) = (ev.map(_._2).min, ev.map(_._2).max)
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, es) =>
      val (a, b) = es.partition(e => e._2 * 2 <= t0 + t1)
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val buckets = es.map(_._3).distinct
      val tv = buckets.map { k =>
        val ca = a.count(_._3 == k).toLong
        val cb = b.count(_._3 == k).toLong
        math.abs(ca * 1000000L / na - cb * 1000000L / nb)
      }.sum / 2
      (t, na, nb, tv)
    }
    val got = MetricQueries.q242_tv_drift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    // TV distance is a metric on distributions: within [0, 1]
    got.foreach { case (_, _, _, tv) => assert(tv >= 0L && tv <= 1000000L) }
  }

  test("q243 Fano factor matches a naive bucket mirror") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "ts div 600000000000").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, es) =>
      val cs = es.groupBy(_._2).values.map(_.length.toLong).toSeq
      val (n, s, s2) = (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
      (t, n, s, s * 1000L / n, (n * s2 - s * s) * 1000L / (n * s))
    }
    val got = MetricQueries.q243_burstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === want)
  }

  test("q244 streamed TV drift equals batch q242 bit-for-bit") {
    val batch = MetricQueries.q242_tv_drift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val streamed = MetricQueries.q244_stream_tv_drift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("q245 funnel latency matches a naive first-occurrence mirror") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def firstTs(u: Long, t: String): Option[Long] = {
      val xs = ev.filter(e => e._1 == u && e._2 == t).map(_._3)
      if (xs.isEmpty) None else Some(xs.min)
    }
    val users = ev.map(_._1).distinct
    def gaps(a: String, b: String): Seq[Long] = users.toSeq.flatMap { u =>
      for {
        ta <- firstTs(u, a); tb <- firstTs(u, b) if tb >= ta
      } yield (tb - ta) / 1000000000L
    }
    def pct(sorted: Seq[Long], p: Long): Long =
      sorted(sorted.indices.find(i =>
        (i + 1) * 100 >= sorted.length.toLong * p).get)
    val want = Seq("1_view_signup" -> gaps("view", "signup"),
      "2_signup_purchase" -> gaps("signup", "purchase")).map {
      case (step, gs) =>
        val s = gs.sorted
        (step, s.length.toLong, pct(s, 50), pct(s, 90), s.max)
    }
    val got = MetricQueries.q245_funnel_latency(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === want)
  }

  test("q247 leaderboard churn matches a naive top-10 mirror") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (t0, t1) = (ev.map(_._3).min, ev.map(_._3).max)
    val want = ev.map(_._1).distinct.sorted.map { t =>
      val es = ev.filter(_._1 == t)
      def top(half: Boolean): Set[Long] = es
        .filter(e => (e._3 * 2 > t0 + t1) == half)
        .groupBy(_._2).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (u, c) => (-c, u) }.take(10).map(_._1).toSet
      val ov = (top(false) & top(true)).size.toLong
      // denominator = the smaller half's actual leaderboard size capped
      // at 10 (round-7 advice) — a sparse type with identical 4-user
      // leaderboards scores 1000000, not a forever-capped 400000
      val k = math.min(10L, math.min(top(false).size, top(true).size))
      (t, ov, k, if (k > 0) ov * 1000000L / k else 0L)
    }
    val got = MetricQueries.q247_leaderboard_churn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
  }

  test("q249 session lift matches a naive sessionized-basket mirror") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val baskets = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      var sid = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._4 - prev > 1800000000000L) sid += 1
        prev = e._4
        ((e._1, sid), e._3)
      }
    }.toSeq.distinct
    val sessions = baskets.map(_._1).distinct
    val sTotal = sessions.length.toLong
    val singles = baskets.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val types = singles.keys.toSeq.sorted
    val bySession = baskets.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val (a, b) = (types(i), types(j))
      val nAb = bySession.values.count(s => s(a) && s(b)).toLong
      (a, b, nAb, singles(a), singles(b), sTotal,
        (BigInt(nAb) * sTotal * 1000 /
          (BigInt(singles(a)) * singles(b))).toLong)
    }).filter(_._3 > 0)
    // read by NAME — the joins reorder the key columns in the output
    val got = MetricQueries.q249_session_lift(spark, sf)
      .selectExpr("type_a", "type_b", "n_ab", "n_a", "n_b", "s_total",
        "lift_x1000").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === want.toSeq)
  }
}
