package graft

import graft.queries.LinkageQueries

/** q224–q227: sorted-neighborhood blocking, Chao1 richness, seasonal
  * anomaly, Spearman — against naive mirrors over collected sf0.001
  * tables. */
class LinkageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docRows: Array[(Long, String, Long, String)] =
    Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))

  private def tokSet(text: String): Set[String] =
    text.trim.split("\\s+").toSet

  test("q224 sorted-neighborhood matches a naive w=3 pair mirror") {
    val docs = docRows
    val want = docs.groupBy(_._2).view.mapValues { ds =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      val pairs = for {
        i <- sorted.indices
        j <- (i + 1) to math.min(i + 3, sorted.length - 1)
      } yield {
        val (a, b) = (tokSet(sorted(i)._4), tokSet(sorted(j)._4))
        val inter = (a & b).size.toLong
        inter * 1000000L / (a.size + b.size - inter)
      }
      (pairs.length.toLong, pairs.count(_ >= 500000L).toLong,
        if (pairs.isEmpty) null else pairs.max)
    }.toMap
    val got = LinkageQueries.q224_sorted_neighborhood(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (lang, g) => assert(g === want(lang), lang) }
    // candidate volume is the SNM guarantee: strictly less than the
    // naive same-language quadratic
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val n = ds.length.toLong
      if (n > 7) assert(got(lang)._1 < n * (n - 1) / 2)
    }
  }

  test("q225 Chao1 matches a naive frequency-spectrum mirror") {
    val tf = docRows.filter(d => d._4.trim.nonEmpty)
      .flatMap(d => d._4.trim.split("\\s+").map(t => (d._2, t)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = tf.keys.map(_._1).toSeq.distinct.sorted.map { lang =>
      val cs = tf.collect { case ((l, _), c) if l == lang => c }.toSeq
      val (v, n) = (cs.length.toLong, cs.sum)
      val f1 = cs.count(_ == 1L).toLong
      val f2 = cs.count(_ == 2L).toLong
      lang -> (v, n, f1, f2,
        v + (f1 * (f1 - 1)) / (2 * (f2 + 1)), f1 * 1000000L / n)
    }
    val got = LinkageQueries.q225_chao1_richness(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === want)
    // chao1 is a LOWER-bounded extrapolation: never below observed vocab
    got.foreach { case (_, (v, _, _, _, chao1, _)) => assert(chao1 >= v) }
  }

  test("q226 seasonal anomaly matches a naive hour-of-day mirror") {
    val ts = Tables.events(spark, sf).selectExpr("ts").collect()
      .map(_.getLong(0))
    val cells = ts.map(t => (t / 86400000000000L, (t / 3600000000000L) % 24))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val base = cells.groupBy(_._1._2).view.mapValues { m =>
      m.values.sum * 100 / m.size
    }.toMap
    val want = cells.toSeq.map { case ((day, hod), cnt) =>
      (day, hod, cnt, base(hod), cnt * 100 - base(hod))
    }.sortBy { case (day, hod, _, _, resid) => (-math.abs(resid), day, hod) }
      .take(20)
    val got = LinkageQueries.q226_seasonal_anomaly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === want)
  }

  // Spark's trim() strips SPACES only (unlike String.trim's <= U+0020)
  private def spaceTrim(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  test("q228 boilerplate lines match a naive line-frequency mirror") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perSource = docs.groupBy(_._1).view.mapValues(_.length.toLong)
    // (source, line) -> doc frequency, lines deduped per doc
    val df = docs.flatMap { d =>
      d._2.split("\n").map(spaceTrim).filter(_.nonEmpty).distinct
        .map(line => (d._1, line))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = df.keys.map(_._1).toSeq.distinct.sorted.map { src =>
      val spectrum = df.collect { case ((s, _), c) if s == src => c }.toSeq
      val boiler = spectrum.filter(c =>
        c >= 3 && c * 100 >= perSource(src) * 5)
      src -> (spectrum.length.toLong, boiler.length.toLong, boiler.sum)
    }
    val got = LinkageQueries.q228_boilerplate_lines(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
  }

  test("q231 market share matches a naive star-join mirror") {
    // key columns arrive as int32 or int64 depending on the writer —
    // normalize at the scan like the query layer does
    def tbl(n: String, cols: String*) =
      spark.read.parquet(s"$sf/$n.parquet")
        .selectExpr(cols.map(c => s"cast($c as long) as $c"): _*)
    val asia = {
      val rk = spark.read.parquet(s"$sf/region.parquet")
        .selectExpr("cast(r_regionkey as long)", "r_name").collect()
        .collectFirst { case r if r.getString(1) == "ASIA" => r.getLong(0) }
        .get
      tbl("nation", "n_nationkey", "n_regionkey").collect()
        .filter(_.getLong(1) == rk).map(_.getLong(0)).toSet
    }
    val custAsia = tbl("customer", "c_custkey", "c_nationkey").collect()
      .filter(r => asia(r.getLong(1))).map(_.getLong(0)).toSet
    val suppAsia = tbl("supplier", "s_suppkey", "s_nationkey").collect()
      .filter(r => asia(r.getLong(1))).map(_.getLong(0)).toSet
    val ordYr = Tables.orders(spark, sf)
      .selectExpr("cast(o_orderkey as long)", "cast(o_custkey as long)",
        "cast(year(o_orderdate) as long)")
      .collect().filter(r => custAsia(r.getLong(1)))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("cast(l_orderkey as long)", "cast(l_suppkey as long)",
        "cast(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) as long)")
      .collect()
      .flatMap { r =>
        ordYr.get(r.getLong(0)).map(yr =>
          (yr, r.getLong(2), suppAsia(r.getLong(1))))
      }
    val want = li.groupBy(_._1).view.mapValues { rows =>
      val total = rows.map(_._2).sum
      val local = rows.filter(_._3).map(_._2).sum
      (total, local, local * 1000L / math.max(total / 1000L, 1L))
    }.toMap
    val got = LinkageQueries.q231_market_share(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === want)
    // a share is a fraction of the whole: local <= total, ppm <= 1e6
    got.values.foreach { case (t, l, ppm) =>
      assert(l <= t); assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("q232 PR curve matches a naive hashed-classifier mirror") {
    def score(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      text.trim.split("\\s+").map { tok =>
        val hex = md.digest(s"feat:$tok".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val slot = java.lang.Long.parseLong(hex, 16) % 1024L
        (slot * 2654435761L) % 2001L - 1000L
      }.sum
    }
    val docs = docRows.filter(_._4.trim.nonEmpty)
      .map(d => (score(d._4), d._3 >= 200L))
    val want = Seq(-500L, -250L, 0L, 250L, 500L).map { t =>
      val tp = docs.count { case (s, y) => s > t && y }.toLong
      val fp = docs.count { case (s, y) => s > t && !y }.toLong
      val fn = docs.count { case (s, y) => s <= t && y }.toLong
      val prec = if (tp + fp == 0) None else Some(tp * 1000000L / (tp + fp))
      val rec = if (tp + fn == 0) None else Some(tp * 1000000L / (tp + fn))
      (t, tp, fp, fn, prec, rec)
    }
    val got = LinkageQueries.q232_pr_curve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.toSeq === want)
    // raising the threshold can only shrink the predicted-positive set:
    // recall is monotone non-increasing in t
    val recalls = got.flatMap(_._6)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
  }

  test("q233 gap interpolation matches a naive spine mirror") {
    val ts = Tables.events(spark, sf).selectExpr("ts").collect()
      .map(_.getLong(0))
    val buckets = ts.map(_ / 600000000000L)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (b0, b1) = (buckets.keys.min, buckets.keys.max)
    val obs = buckets.keys.toSeq.sorted
    val want = (b0 to b1).map { b =>
      buckets.get(b) match {
        case Some(c) => (b, c, 0)
        case None =>
          val pt = obs.filter(_ < b).max
          val nt = obs.filter(_ > b).min
          val (pv, nv) = (buckets(pt), buckets(nt))
          (b, (pv * (nt - b) + nv * (b - pt)) / (nt - pt), 1)
      }
    }
    val got = LinkageQueries.q233_gap_interpolation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === want)
    // the sf0.001 slice is sparse enough that gaps must actually occur —
    // otherwise this test exercises nothing
    assert(got.count(_._3 == 1) > 0, "no gaps interpolated")
  }

  test("q234 fan-out profile matches a naive group-count mirror") {
    def fan(table: String, key: String): (Long, Long, Long, Long) = {
      val ks = spark.read.parquet(s"$sf/$table.parquet")
        .selectExpr(s"cast($key as long)").collect().map(_.getLong(0))
      val cs = ks.groupBy(identity).values.map(_.length.toLong)
      (cs.size.toLong, ks.length.toLong, cs.min, cs.max)
    }
    val want = Seq(
      "customer->orders" -> fan("orders", "o_custkey"),
      "orders->lineitem" -> fan("lineitem", "l_orderkey"),
      "part->lineitem" -> fan("lineitem", "l_partkey"),
      "supplier->lineitem" -> fan("lineitem", "l_suppkey"))
    val got = LinkageQueries.q234_fanout_profile(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want)
    // derived columns are pure functions of the four counts
    LinkageQueries.q234_fanout_profile(spark, sf).collect().foreach { r =>
      val (np, nc, mx) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(r.getLong(5) === nc * 100 / np)
      assert(r.getLong(6) === mx * 10000 / (nc * 100 / np))
    }
  }

  test("q235 vocab shift matches a naive half-split mirror") {
    val docs = docRows.filter(_._4.trim.nonEmpty)
    val (d0, d1) = (docs.map(_._1).min, docs.map(_._1).max)
    val toks = docs.flatMap(d =>
      d._4.trim.split("\\s+").map(t => (t, d._1 * 2 > d0 + d1)))
    val counts = toks.groupBy(_._1).view.mapValues { ts =>
      (ts.count(!_._2).toLong, ts.count(_._2).toLong)
    }.toMap
    val ta = counts.values.map(_._1).sum
    val tb = counts.values.map(_._2).sum
    val want = counts.toSeq
      .filter { case (_, (a, b)) => a + b >= 50 }
      .map { case (t, (a, b)) =>
        val (sa, sb) = (a * 1000000L / ta, b * 1000000L / tb)
        (t, a, b, sa, sb, sb - sa)
      }
      .sortBy { case (t, _, _, _, _, d) => (-math.abs(d), t) }
      .take(20)
    val got = LinkageQueries.q235_vocab_shift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want)
  }

  test("q227 Spearman matches a naive rank mirror and sanity bounds") {
    val docs = docRows
    val want = docs.groupBy(_._2).view.mapValues { ds =>
      val r1 = ds.sortBy(d => (d._3, d._1)).zipWithIndex
        .map { case (d, i) => d._1 -> (i + 1L) }.toMap
      val r2 = ds.sortBy(d => (tokSet(d._4).size, d._1)).zipWithIndex
        .map { case (d, i) => d._1 -> (i + 1L) }.toMap
      val n = ds.length.toLong
      val sumD2 = ds.map { d =>
        val diff = r1(d._1) - r2(d._1); diff * diff
      }.sum
      val rho = if (n < 2) None
      else Some(1.0 - 6.0 * sumD2 / (n * (n * n - 1)))
      (n, sumD2, rho)
    }.toMap
    val got = LinkageQueries.q227_spearman_corr(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (lang, (n, d2, rho)) =>
      assert((n, d2) === (want(lang)._1, want(lang)._2), lang)
      (rho, want(lang)._3) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 1e-6, s"$lang: $a vs $b")
          assert(a >= -1.0 && a <= 1.0, lang)
        case (a, b) => assert(a === b, lang)
      }
    }
    // length and token count are strongly monotone-linked features on
    // this corpus: the association must be decisively positive
    assert(got.values.flatMap(_._3).forall(_ > 0.5))
  }

  test("q241 source vocabulary overlap matches a naive set mirror") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.trim.nonEmpty)
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2.trim.split("\\s+")).toSet).toMap
    val srcs = vocab.keys.toSeq.sorted
    val want = for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
    } yield {
      val (a, b) = (vocab(srcs(i)), vocab(srcs(j)))
      val inter = (a & b).size.toLong
      (srcs(i), srcs(j), inter, a.size.toLong, b.size.toLong,
        inter * 1000000L / (a.size + b.size - inter))
    }
    val got = LinkageQueries.q241_source_token_overlap(spark, sf)
      .selectExpr("src_a", "src_b", "inter", "sz_a", "sz_b",
        "jaccard_ppm").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want.toSeq)
  }

  test("q246 n-gram novelty matches a naive bigram-set mirror") {
    val docs = docRows.filter(_._4.trim.nonEmpty)
    val (d0, d1) = (docs.map(_._1).min, docs.map(_._1).max)
    def bigrams(text: String): Set[String] = {
      val t = text.trim.split("\\s+")
      if (t.length < 2) Set.empty
      else t.zip(t.tail).map { case (a, b) => s"$a $b" }.toSet
    }
    val want = docs.map(_._2).distinct.sorted.map { lang =>
      val ds = docs.filter(_._2 == lang)
      val old = ds.filter(_._1 * 2 <= d0 + d1).flatMap(d => bigrams(d._4))
        .toSet
      val nw = ds.filter(_._1 * 2 > d0 + d1).flatMap(d => bigrams(d._4))
        .toSet
      val novel = (nw -- old).size.toLong
      (lang, old.size.toLong, nw.size.toLong, novel,
        if (nw.isEmpty) None else Some(novel * 1000000L / nw.size))
    }
    val got = LinkageQueries.q246_ngram_novelty(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq === want)
    // novelty is a fraction of the new half's bigrams
    got.foreach { case (_, _, nw, novel, _) => assert(novel <= nw) }
  }

  test("q248 Bowley skewness matches a naive quartile mirror") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = docs.map(_._1).distinct.sorted.map { src =>
      val s = docs.filter(_._1 == src).map(_._2).sorted
      val n = s.length.toLong
      def q(num: Long, den: Long): Long =
        s(s.indices.find(i => (i + 1) * den >= n * num).get)
      val (q1, q2, q3) = (q(1, 4), q(1, 2), q(3, 4))
      (src, n, q1, q2, q3,
        if (q3 == q1) None
        else Some((q3 + q1 - 2 * q2) * 1000L / (q3 - q1)))
    }
    val got = LinkageQueries.q248_length_skew(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.toSeq === want)
    // Bowley skewness is bounded in [-1, 1] by construction
    got.flatMap(_._6).foreach(b => assert(b >= -1000L && b <= 1000L))
  }
}
