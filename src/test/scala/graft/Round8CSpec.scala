package graft

import graft.queries.{SelectQueries, StatQueries, TrainPrepQueries}

/** Round-8 batch C: isotonic calibration (q322), Rice postings
  * planner (q323), epoch-shuffle decorrelation (q324) — each checked
  * against a naive single-threaded mirror over collected sf0.001
  * tables, plus the operator's own structural invariants.
  */
class Round8CSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q322 fitted curve is monotone and equals a reference PAVA") {
    val rows = StatQueries.q322_isotonic_calibration(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // monotone non-decreasing fit
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _           => ()
    }
    // counts reproduce the raw rate exactly
    rows.foreach { case (_, n, pos, raw, _) =>
      assert(raw === pos * 1000000L / n)
    }
    // classic stack-based PAVA in exact rationals (pos_a·n_b vs
    // pos_b·n_a cross-multiply — the unique isotonic fit); the
    // operator's minimax-over-floored-ppm must equal floor(fit · 1e6)
    // per block because floor commutes with min/max selection
    val perBucket = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stack = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int)] // pooled n, pooled pos, nBuckets
      rows.foreach { case (_, n, pos, _, _) =>
        stack += ((n, pos, 1))
        while (stack.length >= 2 && {
            val a = stack(stack.length - 2); val b = stack.last
            a._2 * b._1 > b._2 * a._1
          }) {
          val b = stack.remove(stack.length - 1)
          val a = stack.remove(stack.length - 1)
          stack += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      }
      stack.foreach { case (n, pos, nb) =>
        (1 to nb).foreach(_ => out += pos * 1000000L / n)
      }
      out.toList
    }
    assert(rows.map(_._5).toList === perBucket)
  }

  test("q323 chooses the arg-min Rice parameter per term") {
    // rebuild postings naively and check the chosen-k roll-up
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val postings = docs.flatMap { case (id, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      if (t.length < 2) Nil
      else t.sliding(2).map(_.mkString(" ")).toSeq.distinct
        .map(bg => (bg, id))
    }.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted).toMap
      .filter(_._2.length >= 2)
    def riceBits(gaps: Seq[Long], k: Int): Long =
      gaps.map(g => ((g - 1) >> k) + k + 1).sum
    def varintBytes(g: Long): Long =
      if (g < 128) 1 else if (g < 16384) 2 else if (g < 2097152) 3
      else if (g < 268435456L) 4 else if (g < 34359738368L) 5
      else if (g < 4398046511104L) 6 else 7
    val perTerm = postings.map { case (_, ids) =>
      val gaps = (ids.head + 1) +: ids.sliding(2).collect {
        case Array(a, b) => b - a
      }.toSeq
      val costs = (0 to 15).map(k => (riceBits(gaps, k), k))
      val (bits, k) = costs.min
      (k, ids.length.toLong, bits, gaps.map(varintBytes).sum)
    }.toSeq
    val want = perTerm.groupBy(_._1).map { case (k, g) =>
      (k.toLong, g.length.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.map(_._4).sum * 8, g.map(_._2).sum * 64)
    }.toSeq.sortBy(_._1)
    val got = SelectQueries.q323_rice_postings_planner(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got === want)
  }

  test("q324 epochs are bijective permutations that decorrelate") {
    val got = TrainPrepQueries.q324_epoch_shuffle_audit(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length === 3)
    val nDocs = Tables.documents(spark, sf).count()
    got.foreach { case (_, n, adj, disp) =>
      assert(n === nDocs)
      // adjacency retention under an independent re-shuffle is
      // hypergeometric with mean ≈ 1; allow a loose ceiling
      assert(adj <= 5, s"adjacency stuck: $adj of $n")
      // mean displacement within ±25% of the n²/3 expectation
      assert(disp > 750000L && disp < 1250000L,
        s"displacement ratio $disp ppm out of band")
    }
    // naive mirror of one pair's displacement sum
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    def rank(e: Int): Map[Long, Long] =
      ids.map(d => d -> graft.pipeline.Sampling
          .hash60Jvm(s"epoch$e", d))
        .sortBy { case (d, h) => (h, d) }
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1L) }.toMap
    val (r1, r2) = (rank(1), rank(2))
    val sd = ids.map(d => math.abs(r1(d) - r2(d))).sum
    val n = ids.length.toLong
    val wantDisp = BigInt(sd) * 3000000 / (BigInt(n) * n)
    val gotPair = got.find(_._1 == "epoch1->epoch2").get
    assert(gotPair._4 === wantDisp.toLong)
  }

  test("q325 group split never leaks; naive split mirror matches") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    def hash60s(salt: String, s: String): Long =
      java.lang.Long.parseLong(
        md5hex(s"$salt:$s").substring(0, 15), 16)
    val rows = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).take(8)
      val fp = md5hex(toks.mkString(" "))
      (id, fp, hash60s("fold", fp) % 5,
        hash60s("fold", id.toString) % 5)
    }
    val byFp = rows.groupBy(_._2)
    def leaksBy(sel: ((Long, String, Long, Long)) => Long)
        : Map[Long, Long] =
      byFp.values.filter(g => g.map(sel).distinct.length >= 2)
        .flatMap(g => g.map(sel).distinct).groupBy(identity)
        .map { case (f, g) => f -> g.size.toLong }
    val want = rows.groupBy(_._3).map { case (f, g) =>
      (f, g.length.toLong, g.map(_._2).distinct.length.toLong,
        leaksBy(_._3).getOrElse(f, 0L), leaksBy(_._4).getOrElse(f, 0L))
    }.toSeq.sortBy(_._1)
    val got = TrainPrepQueries.q325_group_kfold_leakage(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    got.foreach { case (_, _, _, leakG, _) => assert(leakG === 0L) }
    // the counterfactual must actually demonstrate leakage somewhere
    assert(got.map(_._5).sum > 0L)
  }

  test("q326 stupid backoff matches a naive held-out mirror") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, t) =>
        (id, t.trim.split("\\s+").filter(_.nonEmpty).toSeq) }
      .filter(_._2.nonEmpty)
    def hash60(salt: String, id: Long): Long =
      graft.pipeline.Sampling.hash60Jvm(salt, id)
    val (train, eval0) = docs.partition {
      case (id, _) => hash60("lm", id) % 100 < 80 }
    val uni = train.flatMap(_._2).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val bi = train.flatMap(_._2.sliding(2).filter(_.length == 2))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val tri = train.flatMap(_._2.sliding(3).filter(_.length == 3))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val nTrain = train.map(_._2.length.toLong).sum
    val want = eval0.filter(_._2.length >= 3).map { case (id, tk) =>
      val scores = tk.sliding(3).filter(_.length == 3).map { t =>
        val (w1, w2, w3) = (t(0), t(1), t(2))
        tri.get(Seq(w1, w2, w3)) match {
          case Some(c3) => (c3 * 1000000L / bi(Seq(w1, w2)), 3)
          case None => bi.get(Seq(w2, w3)) match {
            case Some(c23) => (c23 * 400000L / uni(w2), 2)
            case None => uni.get(w3) match {
              case Some(c1) => (c1 * 160000L / nTrain, 1)
              case None => (0L, 0)
            }
          }
        }
      }.toSeq
      (id, scores.length.toLong,
        scores.count(_._2 == 3).toLong, scores.count(_._2 == 2).toLong,
        scores.count(_._2 == 1).toLong,
        scores.map(_._1).sum / scores.length)
    }.sortBy(_._1)
    val got = graft.queries.QualityQueries
      .q326_stupid_backoff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
    // held-out scoring must actually exercise backoff levels
    assert(got.map(_._4).sum + got.map(_._5).sum > 0L,
      "no backoff ever fired — scoring is not held-out")
  }

  test("q327 Spearman matches a naive ranked mirror") {
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3).trim.split("\\s+").filter(_.nonEmpty)
          .distinct.length.toLong))
    val want = docs.groupBy(_._1).map { case (src, g) =>
      val rx = g.sortBy(d => (d._3, d._2)).zipWithIndex
        .map { case (d, i) => d._2 -> (i + 1L) }.toMap
      val ry = g.sortBy(d => (d._4, d._2)).zipWithIndex
        .map { case (d, i) => d._2 -> (i + 1L) }.toMap
      val n = g.length.toLong
      val sd2 = g.map(d => {
        val dd = rx(d._2) - ry(d._2); dd * dd }).sum
      (src, n, sd2,
        (BigInt(1000000) - BigInt(sd2) * 6000000 /
          (BigInt(n) * n * n - n)).toLong)
    }.toSeq.filter(_._2 >= 2).sortBy(_._1)
    val got = StatQueries.q327_spearman_by_source(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
  }

  test("q328 Welch t2 matches a BigInt mirror") {
    val ev = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100).toLong))
    val stats = ev.groupBy(_._1).map { case (t, g) =>
      val n = BigInt(g.length)
      val sx = BigInt(g.map(_._2).sum)
      val sxx = g.map(x => BigInt(x._2) * x._2).sum
      val mean = sx * 1000 / n
      val v = (n * sxx - sx * sx) / (n * (n - 1))
      (t, n, mean, v * 1000000 / n)
    }.toSeq.sortBy(_._1)
    val want = (for {
      a <- stats; b <- stats if a._1 < b._1
    } yield {
      val d = a._3 - b._3
      val t2 = if (a._4 + b._4 == 0) BigInt(0)
        else d * d * 1000 / (a._4 + b._4)
      (a._1, b._1, a._2.toLong, b._2.toLong, a._3.toLong,
        b._3.toLong, t2.toLong)
    }).sortBy(p => (p._1, p._2))
    val got = StatQueries.q328_welch_t2(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
    assert(got === want)
  }

  test("q329 RS double-erasure recovery succeeds on every doc") {
    def gfMul(a: Int, b: Int): Int = {
      var (x, y, r) = (a, b, 0)
      while (y > 0) {
        if ((y & 1) != 0) r ^= x
        x <<= 1
        if ((x & 0x100) != 0) x ^= 0x11d
        y >>= 1
      }
      r
    }
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val mirror = docs.map { case (src, text) =>
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map(_ & 0xff)
      val q = (0 until 4).map { bp =>
        (0 until 4).map(i => gfMul(1 << i, dig(4 * i + bp)))
          .reduce(_ ^ _)
      }
      (src, q.sum.toLong)
    }
    val want = mirror.groupBy(_._1).map { case (s, g) =>
      (s, g.length.toLong, g.length.toLong, g.length.toLong,
        g.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.IntegrityQueries
      .q329_rs_erasure_audit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // recovery MUST succeed everywhere, and the Q checksum pins the
    // GF pipeline against the independent JVM field arithmetic
    assert(got === want)
  }

  test("q330 Kendall tau-b matches a brute-force daily mirror") {
    val ev = Tables.events(spark, sf)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
    val days = ev.map(_._2).distinct.sorted
    val types = ev.map(_._1).distinct.sorted
    val cnt = ev.groupBy(identity).map { case (k, g) =>
      k -> g.length.toLong }
    def isqrt(v: Long): Long = {
      var s = math.floor(math.sqrt(v.toDouble)).toLong
      if ((s + 1) * (s + 1) <= v) s += 1
      if (s * s > v) s -= 1
      s
    }
    val want = (for {
      ta <- types; tb <- types if ta < tb
    } yield {
      val xa = days.map(d => cnt.getOrElse((ta, d), 0L))
      val xb = days.map(d => cnt.getOrElse((tb, d), 0L))
      var (conc, disc, tx, ty) = (0L, 0L, 0L, 0L)
      for (i <- days.indices; j <- days.indices if i < j) {
        val (dx, dy) = (xa(j) - xa(i), xb(j) - xb(i))
        if (dx * dy > 0) conc += 1
        if (dx * dy < 0) disc += 1
        if (dx == 0) tx += 1
        if (dy == 0) ty += 1
      }
      val n0 = days.length.toLong * (days.length - 1) / 2
      val den = isqrt((n0 - tx) * (n0 - ty))
      val tau = if (den == 0) 0L
        else math.signum(conc - disc) *
          (math.abs(conc - disc) * 1000000L / den)
      (ta, tb, days.length.toLong, conc, disc, tau)
    }).sortBy(p => (p._1, p._2))
    val got = graft.queries.MetricQueries
      .q330_kendall_daily(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
  }

  test("q331 V-optimal DP matches an independent memoized mirror") {
    val got = graft.queries.PlannerQueries
      .q331_voptimal_histogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length === 8)
    // partition covers all events exactly once
    val nEvents = Tables.events(spark, sf).count()
    assert(got.map(_._4).sum === nEvents)
    // V-optimal(8) can never lose to the ≤8-bucket equi-width split
    assert(got.map(_._5).sum <= got.map(_._6).sum)
    // independent top-down memoized DP over the same cells
    val cells = Tables.events(spark, sf)
      .select("value").collect()
      .map(r => math.floor(r.getDouble(0) * 100).toLong)
      .groupBy(c => math.min(63L, c / 800L)).toSeq.sortBy(_._1)
      .map { case (cell, xs) =>
        (cell, xs.length.toLong, xs.sum,
          xs.map(x => BigInt(x) * x).sum) }
    val m = cells.length
    val pn = cells.scanLeft(0L)(_ + _._2)
    val ps = cells.scanLeft(0L)(_ + _._3)
    val pss = cells.scanLeft(BigInt(0))(_ + _._4)
    def sse(j: Int, k: Int): BigInt = {
      val s = BigInt(ps(k) - ps(j - 1))
      pss(k) - pss(j - 1) - s * s / (pn(k) - pn(j - 1))
    }
    val memo = scala.collection.mutable.Map
      .empty[(Int, Int), (BigInt, Int)]
    def best(b: Int, i: Int): (BigInt, Int) =
      memo.getOrElseUpdate((b, i),
        if (b == 1) (sse(1, i), 0)
        else (for (j <- (b - 1) to (i - 1)) yield
          (best(b - 1, j)._1 + sse(j + 1, i), j))
          .minBy(c => (c._1, c._2)))
    var hi = m
    val mirror = (8 to 1 by -1).map { b =>
      val lo = best(b, hi)._2
      val row = (b.toLong, cells(lo)._1, cells(hi - 1)._1,
        pn(hi) - pn(lo), sse(lo + 1, hi).toLong)
      hi = lo
      row
    }.reverse
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) === mirror)
  }

  test("q332 join planner matches measured byte totals") {
    val got = graft.queries.PlannerQueries
      .q332_join_cost_planner(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toSeq
    assert(got.length === 7)
    // spot-check one small and one large join against raw collects
    val nation = Tables.nation(spark, sf).collect()
    val nationBytes = nation
      .map(r => r.getString(1).length + 16L).sum
    val region = Tables.region(spark, sf).collect()
    val regionBytes = region
      .map(r => r.getString(1).length + 8L).sum
    val nr = got.find(_._1 == "nation_region").get
    assert(nr._2 === nation.length.toLong)
    assert(nr._3 === region.length.toLong)
    assert(nr._4 === nationBytes)
    assert(nr._5 === regionBytes)
    assert(nr._6 === math.min(nationBytes, regionBytes) * 32)
    assert(nr._7 === nationBytes + regionBytes)
    assert(nr._8 === (if (math.min(nationBytes, regionBytes) * 32 <
      nationBytes + regionBytes) "broadcast" else "shuffle"))
    // every strategy decision is consistent with its own cost columns
    got.foreach { r =>
      val mn = math.min(r._4, r._5)
      val expect = if (mn <= 10L * 1024 * 1024 && mn * 32 < r._4 + r._5)
        "broadcast" else "shuffle"
      assert(r._8 === expect, r._1)
    }
  }

  test("q333 front coding matches a JVM LCP mirror") {
    val vocab = Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(r => r.getString(0).trim.split("\\s+"))
      .filter(_.nonEmpty).distinct.sorted
    def lcp(a: String, b: String): Int = {
      var k = 0
      while (k < a.length && k < b.length && a(k) == b(k)) k += 1
      k
    }
    val withPrev = vocab.zipWithIndex.map { case (t, i) =>
      (t, if (i == 0) 0 else lcp(vocab(i - 1), t)) }
    val want = withPrev.groupBy(_._1.substring(0, 1))
      .map { case (blk, g) =>
        val raw = g.map(_._1.length.toLong).sum
        val fc = g.map(p => p._1.length.toLong - p._2 + 1).sum
        (blk, g.length.toLong, raw, fc, raw * 1000 / fc)
      }.toSeq.sortBy(_._1)
    val got = graft.queries.SelectQueries
      .q333_front_coding_audit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("q334 BSI slice sums reproduce the direct sum exactly") {
    val ev = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100).toLong))
    val want = ev.groupBy(_._1).map { case (t, g) =>
      val xs = g.map(_._2)
      val cs = (0 to 16).map(k => xs.count(x => ((x >> k) & 1) == 1)
        .toLong)
      val topN = cs.max
      (t, xs.length.toLong, xs.sum,
        cs.zipWithIndex.map { case (c, k) => c * (1L << k) }.sum,
        cs.count(_ > 0).toLong, cs.indexWhere(_ == topN).toLong, topN)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.PlannerQueries
      .q334_bsi_aggregation_audit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
    assert(got === want)
    got.foreach(r => assert(r._3 === r._4,
      s"BSI identity broken for ${r._1}"))
  }

  test("q335 TextTiling matches a JVM cohesion mirror") {
    val w = 10
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.length >= 2 * w)
    val want = docs.map { case (id, tk) =>
      val sims = (1 to tk.length / w - 1).map { k =>
        val p = k * w
        val lhs = tk.slice(p - w, p).distinct.toSet
        val rhs = tk.slice(p, p + w).toSet
        (p.toLong, lhs.count(rhs.contains).toLong * 1000000L / w)
      }
      val mean = sims.map(_._2).sum / sims.length
      val bounds = sims.filter(_._2 * 2 < mean)
      (id, sims.length.toLong, mean, bounds.length.toLong,
        bounds.headOption.map(_._1).getOrElse(-1L))
    }.sortBy(_._1).toSeq
    val got = graft.queries.QualityQueries
      .q335_texttiling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("q336 independence audit matches naive predicate counts") {
    val ev = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def row(name: String, n: Long, na: Long, nb: Long, nab: Long) = {
      val est = (BigInt(na) * nb * 1000000 / (BigInt(n) * n)).toLong
      val act = nab * 1000000L / n
      (name, n, na, nb, nab, na * 1000000L / n, nb * 1000000L / n,
        est, act, if (est == 0) -1L else act * 1000 / est)
    }
    val want1 = row("events_purchase_high", ev.length,
      ev.count(_._1 == "purchase"), ev.count(_._2 > 100),
      ev.count(e => e._1 == "purchase" && e._2 > 100))
    val got = graft.queries.PlannerQueries
      .q336_independence_audit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9))).toSeq
    assert(got.length === 5)
    assert(got.find(_._1 == "events_purchase_high").get === want1)
    // every row's derived columns are consistent with its counts
    got.foreach { r =>
      assert(r === row(r._1, r._2, r._3, r._4, r._5))
    }
  }

  test("q337 coreset sampling matches a JVM HT mirror") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        (r.getLong(0), (0 until 8).map(d =>
          math.floor(e(d).toDouble * 1000).toLong).toArray)
      }
    def h60(salt: String, id: Long): Long =
      graft.pipeline.Sampling.hash60Jvm(salt, id)
    val seeds = vecs.sortBy { case (id, _) => (h60("coreset", id), id) }
      .take(8)
    val assigned = vecs.map { case (id, v) =>
      val (d2, cid) = seeds.map { case (sid, sv) =>
        ((0 until 8).map(d => {
          val dd = v(d) - sv(d); dd * dd }).sum, sid)
      }.minBy(c => (c._1, c._2))
      (id, cid, d2, d2 + 1)
    }
    val sw = assigned.map(x => BigInt(x._4)).sum
    val want = assigned.groupBy(_._2).map { case (cid, g) =>
      val rows = g.map { case (id, _, d2, w) =>
        val p = (BigInt(w) * 1000000 * 256 / sw)
          .min(BigInt(1000000)).toLong
        val keep = p > 0 && h60("cs", id) % 1000000 < p
        (d2, keep, if (p > 0) 1000000000000L / p else 0L)
      }
      (cid, rows.length.toLong, rows.map(_._1).sum,
        rows.count(_._2).toLong,
        rows.filter(_._2).map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val got = TrainPrepQueries.q337_coreset_sample(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(got.map(_._2).sum === vecs.length.toLong)
  }

  test("q338 staircase moves equal the sequential greedy rebalancer") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def h60(id: Long): Long =
      graft.pipeline.Sampling.hash60Jvm("shard", id)
    val sizes = docs.groupBy(d => h60(d._1) % 32)
      .map { case (s, g) => s -> g.map(_._2).sum }
    val total = sizes.values.sum
    val deltas = sizes.toSeq.sortBy(_._1).map { case (s, b) =>
      (s, b - (total / 32 + (if (s < total % 32) 1L else 0L)))
    }
    // sequential greedy in shard order — must equal the overlap form
    var donors = scala.collection.mutable.Queue(
      deltas.filter(_._2 > 0).map { case (s, d) => (s, d) }: _*)
    var recv = scala.collection.mutable.Queue(
      deltas.filter(_._2 < 0).map { case (s, d) => (s, -d) }: _*)
    val moves = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    while (donors.nonEmpty && recv.nonEmpty) {
      val (ds, dv) = donors.head
      val (rs, rv) = recv.head
      val m = math.min(dv, rv)
      moves += ((ds, rs, m))
      if (dv == m) donors.dequeue() else donors(0) = (ds, dv - m)
      if (rv == m) recv.dequeue() else recv(0) = (rs, rv - m)
    }
    val got = graft.queries.PlannerQueries
      .q338_rebalance_plan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === moves.toSeq.sortBy(m => (m._1, m._2)))
    // the plan fully levels every donor
    val out = got.groupBy(_._1).map { case (s, g) =>
      s -> g.map(_._3).sum }
    deltas.filter(_._2 > 0).foreach { case (s, d) =>
      assert(out(s) === d) }
  }

  test("q339 planner costs match a JVM postings mirror") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val postings = docs.flatMap { case (id, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      if (t.length < 2) Nil
      else t.sliding(2).map(_.mkString(" ")).toSeq.distinct
        .map(bg => (bg, id))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val top = postings.toSeq
      .sortBy { case (t, ids) => (-ids.size, t) }.take(20)
    val want = (for {
      (ta, ia) <- top; (tb, ib) <- top if ta < tb
    } yield {
      val (na, nb) = (ia.size.toLong, ib.size.toLong)
      val gallop = math.min(na, nb) *
        (64 - java.lang.Long.numberOfLeadingZeros(math.max(na, nb)))
      (ta, tb, na, nb, (ia & ib).size.toLong, na + nb, gallop,
        if (gallop < na + nb) "gallop" else "merge")
    }).sortBy(p => (p._1, p._2))
    val got = graft.queries.SelectQueries
      .q339_intersection_planner(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toSeq
    assert(got === want)
  }

  test("q340 dyadic decomposition reproduces every exact range count") {
    val xs = Tables.events(spark, sf).select("value").collect()
      .map(r => math.min(65535L,
        math.floor(r.getDouble(0) * 100).toLong))
    val got = graft.queries.PlannerQueries
      .q340_dyadic_range_audit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length === 5)
    got.foreach { case (name, lo, hi, nCells, exact, dyadic) =>
      assert(exact === dyadic, s"identity broken for $name")
      assert(exact === xs.count(x => x >= lo && x <= hi).toLong)
      // decomposition is logarithmic, never linear in the width
      assert(nCells <= 2 * 17, name)
      // decomposition cells tile the range exactly
      val cells = graft.queries.PlannerQueries.dyadicCells(lo, hi)
      val covered = cells.map { case (l, nd) =>
        (nd << l, (nd << l) + (1L << l) - 1) }.sortBy(_._1)
      assert(covered.head._1 === lo && covered.last._2 === hi)
      covered.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 + 1 === b._1)
        case _         => ()
      }
    }
  }

  test("q341 DiD matches a JVM 2x2 mirror") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3) / 86400000000000L,
        math.floor(r.getDouble(4) * 100).toLong))
    val treat = ev.groupBy(_._1).map { case (u, g) =>
      u -> (g.minBy(e => (e._4, e._2))._3 == "signup") }
    val mid = (ev.map(_._4).min + ev.map(_._4).max) / 2
    val cells = ev.groupBy(e => (treat(e._1), e._4 > mid))
      .map { case ((t, p), g) =>
        (t, p, g.length.toLong, g.map(_._5).sum * 1000 / g.length) }
      .toSeq.sortBy(c => (c._1, c._2))
    def m(t: Boolean, p: Boolean): Long =
      cells.find(c => c._1 == t && c._2 == p).map(_._4).getOrElse(0L)
    val did = (m(true, true) - m(true, false)) -
      (m(false, true) - m(false, false))
    val got = graft.queries.MetricQueries
      .q341_diff_in_diff(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === cells.map(c => (c._1, c._2, c._3, c._4, did)))
  }

  test("q342 Zipf octaves match a JVM rank mirror") {
    val counts = Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(r => r.getString(0).trim.split("\\s+")
        .filter(_.nonEmpty))
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((_, c), i) => (i + 1L, c) }
    val oct = ranked.groupBy { case (r, _) =>
      63 - java.lang.Long.numberOfLeadingZeros(r) }
      .map { case (o, g) =>
        (o.toLong, g.size.toLong, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val want = oct.map { case (o, n, s) =>
      val prev = oct.find(_._1 == o - 1)
      val decay = prev.map { case (_, pn, ps) =>
        (BigInt(ps) * n * 1000 / (BigInt(pn) * s)).toLong
      }.getOrElse(0L)
      (o, n, s, s * 1000 / n, decay)
    }
    val got = graft.queries.QualityQueries
      .q342_zipf_octaves(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }
}
