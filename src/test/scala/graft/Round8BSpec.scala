package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sampling
import graft.queries.{PlannerQueries, StatQueries}

/** Property tests for the round-8 statistics/planner additions:
  * q295 KMV set ops, q296 range-partitioner balance, q297 consistent-
  * hash ring, q298 OLS, q299 Mann–Whitney, q300 Benford.
  */
class Round8BSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("hash60Jvm matches the hash60 Column formula") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 42L, 999999L, 1507L)
    val got = ids.toDF("id")
      .select(Sampling.hash60("ring", col("id"))).as[Long].collect()
    val want = ids.map(Sampling.hash60Jvm("ring", _))
    assert(got.toSeq === want)
  }

  test("q295 KMV union estimate is within 3-sigma of exact and the " +
      "intersection estimate is bounded by the union") {
    val rows = StatQueries.q295_kmv_setops(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (estU, estI) = (r.getLong(2), r.getLong(3))
      val (truU, errPpm) = (r.getLong(4), r.getLong(6))
      assert(estU > 0 && truU > 0)
      assert(estI >= 0 && estI <= estU)
      // k=256 => sigma ~ 1/sqrt(254) ~ 6.3%; 3 sigma ~ 19%
      assert(errPpm < 250000L, s"union err $errPpm ppm vs exact $truU")
    }
  }

  test("q296 buckets exhaust the table, stay ordered, and no bucket " +
      "deviates grossly from the ideal slice") {
    val rows = PlannerQueries.q296_range_partition_audit(spark, sf)
      .collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    assert(rows.map(_.getLong(0)).toSeq ===
      rows.map(_.getLong(0)).sorted.toSeq)
    // hi of bucket b strictly below lo of the next non-empty bucket
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
      case _ =>
    }
    // 1024-point sample at 32 buckets: every slice within +/-50%
    rows.foreach(r => assert(math.abs(r.getLong(4)) < 500000L,
      s"bucket ${r.getLong(0)} dev ${r.getLong(4)} ppm"))
  }

  test("q297 removing shard 7 moves exactly its docs and nothing else") {
    val rows = PlannerQueries.q297_consistent_hash_ring(spark, sf)
      .collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    assert(rows.map(_.getLong(2)).sum === nDocs)
    val s7 = rows.find(_.getLong(0) == 7L).get
    assert(s7.getLong(2) === 0L, "shard 7 must own nothing after removal")
    assert(s7.getLong(4) === s7.getLong(1),
      "every doc of shard 7 must move out")
    rows.filter(_.getLong(0) != 7L)
      .foreach(r => assert(r.getLong(4) === 0L,
        s"shard ${r.getLong(0)} lost docs on an unrelated removal"))
    assert(rows.map(_.getLong(3)).sum === s7.getLong(1),
      "moved_in must sum to shard 7's displaced docs")
  }

  test("q298 integer OLS agrees with double-precision OLS to ppm scale") {
    import spark.implicits._
    val rows = StatQueries.q298_ols_regression(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        floor(col("l_extendedprice")).cast("double"))
      .as[(String, Double, Double)].collect().groupBy(_._1)
    rows.foreach { r =>
      val xs = data(r.getString(0))
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxx = xs.map(v => v._2 * v._2).sum
      val sxy = xs.map(v => v._2 * v._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getLong(2) / 1e6 - slope) < 1e-3,
        s"slope ${r.getLong(2)} ppm vs $slope")
      val r2 = r.getLong(4)
      assert(r2 >= 0L && r2 <= 1000001L)
    }
  }

  test("q299 2U matches the brute-force pair count and the U_A+U_B " +
      "identity") {
    import spark.implicits._
    val rows = StatQueries.q299_mann_whitney(spark, sf).collect()
    val vals = Tables.customer(spark, sf)
      .select(col("c_mktsegment"),
        expr("cast(floor(c_acctbal * 100) as bigint)"))
      .as[(String, Long)].collect()
    val a = vals.filter(_._1 == "AUTOMOBILE").map(_._2)
    rows.foreach { r =>
      val b = vals.filter(_._1 == r.getString(0)).map(_._2)
      var twoU = 0L
      for (x <- a; y <- b)
        twoU += (if (x > y) 2L else if (x == y) 1L else 0L)
      assert(r.getLong(1) === a.length.toLong)
      assert(r.getLong(2) === b.length.toLong)
      assert(r.getLong(3) === twoU,
        s"2U mismatch for ${r.getString(0)}")
      // U_A + U_B = nA*nB exactly (in 2U units: 2U_A + 2U_B = 2 nA nB)
      var twoUb = 0L
      for (y <- b; x <- a)
        twoUb += (if (y > x) 2L else if (y == x) 1L else 0L)
      assert(twoU + twoUb === 2L * a.length * b.length)
    }
  }

  test("q300 digit counts exhaust the orders and the law constants " +
      "sum to one") {
    val rows = StatQueries.q300_benford_audit(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 9L))
    assert(rows.map(_.getLong(1)).sum ===
      Tables.orders(spark, sf).count())
    assert(rows.map(_.getLong(2)).sum === 1000000L)
    rows.foreach(r => assert(r.getLong(4) >= 0L))
  }

  test("q301 run counts match a brute-force single-threaded scan") {
    import spark.implicits._
    val rows = PlannerQueries.q301_encoding_audit(spark, sf).collect()
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_returnflag"), col("l_linestatus"),
        expr("cast(cast(floor(l_tax * 100) as bigint) as string)"))
      .as[(Long, Long, String, String, String)].collect()
    def runsOf(pick: ((Long, Long, String, String, String)) => String)
        : Long = {
      val vs = base.map(r => ((r._1, r._2, pick(r)), pick(r)))
        .sortBy(_._1).map(_._2)
      1L + vs.sliding(2).count {
        case Array(a, b) => a != b
        case _ => false
      }
    }
    val want = Map("l_returnflag" -> runsOf(_._3),
      "l_linestatus" -> runsOf(_._4), "l_tax_pct" -> runsOf(_._5))
    rows.foreach { r =>
      assert(r.getLong(3) === want(r.getString(0)),
        s"run count for ${r.getString(0)}")
      // bitpack = n * ceil(log2(card)) bits
      val w = 64 - java.lang.Long.numberOfLeadingZeros(r.getLong(2) - 1)
      assert(r.getLong(5) === (r.getLong(1) * w + 7) / 8)
    }
  }

  test("q302 global modularity matches a BigInt recomputation from " +
      "labels and edges") {
    import spark.implicits._
    val rows = graft.queries.GraphQueries.q302_modularity(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val qTot = rows.head.getLong(5)
    assert(rows.forall(_.getLong(5) == qTot))
    // recompute from scratch: same graph, same LPA labels
    val p = Tables.part(spark, sf).select(col("p_partkey")).as[Long]
      .collect()
    val raw = p.filter(_ % 50 != 0).map(k => (k, k - k % 50)) ++
      p.filter(_ >= 2).map(k => (k, k - 1))
    val sym = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
    val lab = graft.graph.Communities
      .labelPropagation(raw.toSeq.toDF("src", "dst"), 4)
      .as[(Long, Long)].collect().toMap
    val s = BigInt(sym.length)
    val eIn = sym.count(e => lab(e._1) == lab(e._2))
    val dSum = sym.groupBy(_._1).view.mapValues(_.length)
      .toMap.groupBy(kv => lab(kv._1)).view
      .mapValues(m => BigInt(m.values.sum)).toMap
    val num = s * eIn - dSum.values.map(d => d * d).sum
    val want = (num.sign * ((num.abs * 1000000) / (s * s))).toLong
    assert(qTot === want)
  }

  test("q303 Bloom pass counts match a JVM filter replay") {
    import spark.implicits._
    val rows = PlannerQueries.q303_bloom_join_audit(spark, sf).collect()
    val dim = Tables.customer(spark, sf)
      .filter(col("c_acctbal") < 0).select(col("c_custkey")).as[Long]
      .collect().toSet
    val bits = dim.flatMap(k =>
      (0 until 4).map(j => Sampling.hash60Jvm("bloom", k * 4 + j) % 65536))
    val facts = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderpriority")).as[(Long, String)]
      .collect()
    val byGrp = facts.groupBy(_._2)
    rows.foreach { r =>
      val fs = byGrp(r.getString(0))
      val nPass = fs.count { case (k, _) =>
        (0 until 4).forall(j =>
          bits.contains(Sampling.hash60Jvm("bloom", k * 4 + j) % 65536))
      }
      val nTrue = fs.count(f => dim.contains(f._1))
      assert(r.getLong(1) === fs.length.toLong)
      assert(r.getLong(2) === nTrue.toLong)
      assert(r.getLong(3) === nPass.toLong)
      assert(r.getLong(4) === (nPass - nTrue).toLong)
      assert(r.getLong(6) === bits.size.toLong)
    }
  }

  test("q304 split gini matches a BigInt recomputation and the best " +
      "gain is at a genuine impurity minimum") {
    import spark.implicits._
    val rows = graft.queries.TrainPrepQueries.q304_gini_split(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val data = Tables.orders(spark, sf)
      .select(expr("cast(floor(o_totalprice * 100) as bigint)"),
        (col("o_orderstatus") === "F").cast("long"))
      .as[(Long, Long)].collect()
    val n = BigInt(data.length); val pos = BigInt(data.map(_._2).sum)
    def gini(nl: BigInt, pl: BigInt): BigInt = {
      val (nr, pr) = (n - nl, pos - pl)
      (nl * nl - pl * pl - (nl - pl) * (nl - pl)) * 1000000 / (n * nl) +
        (nr * nr - pr * pr - (nr - pr) * (nr - pr)) * 1000000 / (n * nr)
    }
    rows.foreach { r =>
      val t = r.getLong(0)
      val nl = BigInt(data.count(_._1 / 2000000 < t / 2000000))
      val pl = BigInt(data.filter(_._1 / 2000000 < t / 2000000)
        .map(_._2).sum)
      assert(r.getLong(1) === nl.toLong)
      assert(r.getLong(3) === gini(nl, pl).toLong,
        s"split gini at threshold $t")
    }
    val parent = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) == parent))
    assert(rows.forall(r =>
      r.getLong(5) == parent - r.getLong(3)))
  }

  test("q305 distortion pairs exhaust the consecutive-id sample and " +
      "cluster around the JL expectation") {
    val rows = graft.queries.TrainPrepQueries
      .q305_jl_distortion(spark, sf).collect()
    val nPairs = rows.map(_.getLong(1)).sum
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(nPairs === nVecs - 1,
      "every consecutive pair with d>0 must appear")
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(2) >= b * 250000L)
      if (b < 12) assert(r.getLong(3) < (b + 1) * 250000L)
    }
    // E[d_proj^2] = 4 d_orig^2: the central half of mass within 4x
    val central = rows.filter(r =>
      r.getLong(0) >= 1 && r.getLong(0) <= 7).map(_.getLong(1)).sum
    assert(central * 2 > nPairs,
      s"distortion mass not centered: $central of $nPairs in [0.25,2)x")
  }

  test("q306 lag-1 autocorrelation matches a double-precision " +
      "recomputation per type") {
    import spark.implicits._
    val rows = graft.queries.MetricQueries
      .q306_autocorrelation(spark, sf).collect()
    assert(rows.map(_.getLong(1)).distinct.sorted.toSeq === (1L to 7L))
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 86400000000000"))
      .groupBy("event_type", "(ts div 86400000000000)")
      .count().as[(String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3.toDouble).toMap).toMap
    rows.filter(_.getLong(1) == 1L).foreach { r =>
      val xs = daily(r.getString(0))
      val mu = xs.values.sum / xs.size
      val den = xs.values.map(v => (v - mu) * (v - mu)).sum
      val num = xs.collect {
        case (d, v) if xs.contains(d + 1) => (v - mu) * (xs(d + 1) - mu)
      }.sum
      val want = num / den * 1e6
      assert(math.abs(r.getLong(4) - want) < 2000.0,
        s"acf(1) for ${r.getString(0)}: got ${r.getLong(4)} want $want")
    }
  }

  test("q307 Haar coefficients satisfy Parseval exactly in BigInt") {
    import spark.implicits._
    val rows = graft.queries.MetricQueries.q307_haar_synopsis(spark, sf)
      .collect()
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 86400000000000"))
      .groupBy("event_type", "(ts div 86400000000000)").count()
      .as[(String, Long, Long)].collect()
    val d0 = daily.map(_._2).min
    daily.map(_._1).distinct.foreach { t =>
      val xs = Array.fill(32)(0L)
      daily.filter(_._1 == t).foreach(r => xs((r._2 - d0).toInt) = r._3)
      val sumX2 = xs.map(x => BigInt(x) * x).sum
      // 2^L * sum(x^2) = sum_l energy_l * 2^(L-l) + a^2
      val byLevel = rows.filter(_.getString(0) == t)
        .map(r => r.getLong(1) -> r.getLong(3)).toMap
      val lhs = BigInt(32) * sumX2
      val rhs = (1 to 5).map(l =>
        BigInt(byLevel(l.toLong)) * BigInt(1) << (5 - l)).sum +
        BigInt(byLevel(0L))
      assert(lhs === rhs, s"Parseval violated for $t")
    }
  }

  test("q308 median slope matches a brute-force pairwise computation") {
    import spark.implicits._
    val rows = graft.queries.MetricQueries.q308_theil_sen(spark, sf)
      .collect()
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 86400000000000"))
      .groupBy("event_type", "(ts div 86400000000000)").count()
      .as[(String, Long, Long)].collect().groupBy(_._1)
    rows.foreach { r =>
      val ds = daily(r.getString(0)).map(d => d._2 -> d._3).sortBy(_._1)
      val slopes = for {
        i <- ds.indices; j <- (i + 1) until ds.length
      } yield {
        val dx = ds(j)._2 - ds(i)._2
        val dd = ds(j)._1 - ds(i)._1
        (dx.sign * (dx.abs * 1000000L / dd),
          (ds(i)._1, ds(j)._1))
      }
      assert(r.getLong(1) === slopes.length.toLong)
      val sorted = slopes.sortBy(identity)
      val med = sorted((sorted.length + 1) / 2 - 1)._1
      assert(r.getLong(2) === med, s"median for ${r.getString(0)}")
    }
  }

  test("q309 CUPED moves each variant mean toward the covariate-" +
      "corrected value and preserves theta across variants") {
    val rows = graft.queries.MetricQueries.q309_cuped_readout(spark, sf)
      .collect()
    assert(rows.length === 2)
    val theta = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) == theta))
    // adjustment direction: variant with above-average x is pulled DOWN
    // when theta > 0 (and vice versa)
    rows.foreach { r =>
      val delta = r.getLong(3) - r.getLong(2)
      // |adjustment| bounded by |theta| x |dx| / 1e6 and consistent sign
      assert(math.abs(delta) <= math.abs(theta) * 1000L,
        "adjustment magnitude implausible")
    }
    // equal-sized variants: adjustments are opposite in sign (dx sums
    // to ~0 when n0 = n1)
    if (rows(0).getLong(1) == rows(1).getLong(1)) {
      val d0 = rows(0).getLong(3) - rows(0).getLong(2)
      val d1 = rows(1).getLong(3) - rows(1).getLong(2)
      assert(d0.sign * d1.sign <= 0, "same-direction adjustment")
    }
  }

  test("q310 phrases are stopword-free and scores are sums of member " +
      "word scores") {
    import spark.implicits._
    val rows = graft.queries.CurationQueries.q310_rake_keywords(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val stop = graft.pipeline.TextAnalysis.defaultStopwords.toSet
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.forall(w => !stop.contains(w)),
        s"stopword inside phrase '${r.getString(0)}'")
      assert(r.getLong(1) >= 1L && r.getLong(2) > 0L)
    }
    // brute-force word scores on the raw text, then re-score the top
    // phrase
    val docs = Tables.documents(spark, sf)
      .select(col("text")).as[String].collect()
      .filter(_.trim.nonEmpty)
    val phrases = docs.flatMap { t =>
      val out = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.empty[String]
      t.trim.split("\\s+").foreach { w =>
        if (stop.contains(w)) { if (cur.nonEmpty) out += cur.reverse
          cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) out += cur.reverse
      out
    }
    val freq = phrases.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val top = rows.head
    val want = top.getString(0).split(" ")
      .map(w => deg(w) * 1000000L / freq(w)).sum
    assert(top.getLong(2) === want, "top phrase score mismatch")
  }

  test("q311 ranks conserve PageRank mass and every rank respects the " +
      "damping floor") {
    val rows = graft.queries.CurationQueries.q311_textrank(spark, sf)
      .collect()
    assert(rows.length === 20)
    rows.foreach(r => assert(r.getLong(1) >= 150000L))
    assert(rows.map(_.getLong(1)).toSeq ===
      rows.map(_.getLong(1)).sorted.reverse.toSeq)
  }

  test("q312 chunks exhaust every token and match a JVM rolling-hash " +
      "replay") {
    import spark.implicits._
    val rows = graft.queries.CurationQueries.q312_cdc_chunking(spark, sf)
      .collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[(String, String)].collect()
      .filter(_._2.trim.nonEmpty)
    val wantTok = docs.groupBy(_._1).view
      .mapValues(_.map(_._2.trim.split("\\s+").length.toLong).sum).toMap
    def hashWord(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"cdc:$w".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1048576L
    }
    val wantChunks = docs.groupBy(_._1).view.mapValues(_.map {
      case (_, t) =>
        val hs = t.trim.split("\\s+").map(hashWord)
        var n = 0L
        hs.indices.dropRight(1).foreach { i =>
          val roll = (0 until 4).map { j =>
            val h = if (i - j >= 0) hs(i - j) else 0L
            h * Seq.fill(j)(33L).product
          }.sum % 1048583L
          if (roll % 16L == 0L) n += 1L
        }
        n + 1L
    }.sum).toMap
    rows.foreach { r =>
      assert(r.getLong(3) === wantTok(r.getString(0)),
        s"token coverage for ${r.getString(0)}")
      assert(r.getLong(1) === wantChunks(r.getString(0)),
        s"chunk count for ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(5) >= 0L && r.getLong(5) < 1000000L)
    }
  }

  test("q313 WHT satisfies Parseval (sum c^2 = n sum x^2) and dc is " +
      "the sample sum") {
    val rows = graft.queries.CurationQueries.q313_wht_spectrum(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val x = Array.tabulate[Long](64)(i =>
        (id * 31 + i * 7) % 65536 - 32768)
      assert(r.getLong(1) === x.sum, s"dc for doc $id")
      assert(r.getLong(6) === 64L * x.map(v => v * v).sum,
        s"Parseval for doc $id")
    }
  }

  test("q314 register sum matches a JVM sketch replay and the " +
      "log2-floor estimator stays within its coarse band") {
    import spark.implicits._
    val rows = StatQueries.q314_pcsa_sketch(spark, sf).collect()
    val keys = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .as[(String, Long)].collect()
    rows.foreach { r =>
      val hs = keys.filter(_._1 == r.getString(0))
        .map(k => Sampling.hash60Jvm("pcsa", k._2))
      val bm = Array.fill(64)(0L)
      hs.foreach { h =>
        val reg = (h % 64).toInt; val rest = h / 64
        val rho = if (rest == 0) 50
          else math.min(java.lang.Long.numberOfTrailingZeros(rest), 50)
        bm(reg) |= 1L << rho
      }
      val sSum = bm.map { b =>
        var i = 0; while ((b & (1L << i)) != 0) i += 1; i.toLong
      }.sum
      assert(r.getLong(1) === sSum, s"S for ${r.getString(0)}")
      // floor-of-exponent estimator: within [exact/2.6, 2.6x exact]
      val (est, exact) = (r.getLong(2), r.getLong(3))
      assert(est > 0 && est < exact * 3 && exact < est * 3,
        s"estimator out of coarse band: est=$est exact=$exact")
    }
  }

  test("q315 bootstrap band brackets the point mean with 64 replicas") {
    val rows = StatQueries.q315_poisson_bootstrap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) === 64L, "replica count")
      assert(r.getLong(4) <= r.getLong(5), "band inverted")
      assert(r.getLong(4) <= r.getLong(2) && r.getLong(2) <= r.getLong(5),
        s"point mean outside the 90% band for ${r.getString(0)}")
    }
  }

  test("q316 correlations: unit diagonal, bounded magnitude, and one " +
      "pair cross-checked in doubles") {
    import spark.implicits._
    val rows = graft.queries.TrainPrepQueries.q316_dim_covariance(spark, sf)
      .collect()
    assert(rows.length === 16 * 17 / 2)
    rows.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getLong(3) === 1000000L))
    rows.foreach(r => assert(math.abs(r.getLong(3)) <= 1000001L))
    val vecs = Tables.embeddings(spark, sf).select(col("embedding"))
      .as[Seq[Float]].collect()
      .map(_.take(16).map(x => math.floor(x * 1000.0)).toArray)
    val (i, j) = (0, 1)
    val n = vecs.length.toDouble
    val (xi, xj) = (vecs.map(_(i)), vecs.map(_(j)))
    val num = n * xi.zip(xj).map { case (a, b) => a * b }.sum -
      xi.sum * xj.sum
    val dx = n * xi.map(a => a * a).sum - xi.sum * xi.sum
    val dy = n * xj.map(a => a * a).sum - xj.sum * xj.sum
    val want = num / math.sqrt(dx * dy) * 1e6
    val got = rows.find(r => r.getLong(0) == i && r.getLong(1) == j)
      .get.getLong(3)
    assert(math.abs(got - want) < 2000.0, s"corr(0,1): got $got want $want")
  }

  test("q317 the 8-round vector is an eigendirection of the covariance " +
      "matrix (cosine to M*v above 0.999)") {
    import spark.implicits._
    val v = graft.queries.TrainPrepQueries.q317_power_iteration(spark, sf)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1).toDouble)
      .sortBy(_._1).map(_._2)
    assert(v.length === 16)
    assert(v.map(math.abs).max === 1000000.0)
    val vecs = Tables.embeddings(spark, sf).select(col("embedding"))
      .as[Seq[Float]].collect()
      .map(_.take(16).map(x => math.floor(x * 1000.0)).toArray)
    val n = vecs.length.toDouble
    val m = Array.tabulate(16, 16) { (i, j) =>
      n * vecs.map(r => r(i) * r(j)).sum -
        vecs.map(_(i)).sum * vecs.map(_(j)).sum
    }
    val mv = m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val cos = mv.zip(v).map { case (a, b) => a * b }.sum /
      (math.sqrt(mv.map(a => a * a).sum) *
        math.sqrt(v.map(a => a * a).sum))
    assert(cos > 0.999, s"not an eigendirection: cos=$cos")
  }

  test("q318 survival is non-increasing and matches the BigInt " +
      "product-limit replay") {
    import spark.implicits._
    val rows = graft.queries.MetricQueries.q318_kaplan_meier(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(3)).sliding(2).forall {
      case Array(a, b) => b <= a
      case _ => true
    })
    val spans = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 86400000000000"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(v => (v.map(_._2).min, v.map(_._2).max)).toMap
    val mxd = spans.values.map(_._2).max
    var s = 1000000L
    rows.foreach { r =>
      val day = r.getLong(0)
      val nRisk = spans.values.count { case (f, l) => f <= day && l >= day }
      val d = spans.values.count { case (_, l) => l == day && l < mxd }
      assert(r.getLong(1) === nRisk.toLong, s"n_risk at $day")
      assert(r.getLong(2) === d.toLong, s"deaths at $day")
      if (nRisk > 0) s = s * (nRisk - d) / nRisk
      assert(r.getLong(3) === s, s"S at $day")
    }
  }

  test("q319 S-curve: more bands always means more expected candidates " +
      "and tp is bounded by the above-threshold mass") {
    val rows = graft.queries.SelectQueries
      .q319_lsh_scurve_planner(spark, sf).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "exp_tp > n_above")
      assert(r.getLong(2) >= r.getLong(4), "exp_cand < exp_tp")
      assert(r.getLong(5) === r.getLong(3) - r.getLong(4))
    }
    val byBands = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byBands(16L) >= byBands(8L) && byBands(8L) >= byBands(4L) &&
      byBands(4L) >= byBands(2L),
      "candidate volume must grow with band count")
    // the curve constants themselves: monotone in s for every config
    Seq((2, 8), (4, 4), (8, 2), (16, 1)).foreach { case (b, r) =>
      val vals = (0 until 16).map(k =>
        graft.queries.SelectQueries.sCurvePpm(b, r, k * 62500L + 31250L))
      assert(vals.sliding(2).forall { case Seq(x, y) => y >= x },
        s"S-curve not monotone for ($b,$r)")
    }
  }

  test("q320 the XOR recovery identity holds for every document") {
    val rows = graft.queries.IntegrityQueries
      .q320_xor_parity_audit(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables.documents(spark, sf).count())
    rows.foreach(r => assert(r.getLong(3) === r.getLong(1),
      s"recovery failed for some docs in ${r.getString(0)}"))
  }

  test("q321 equi-depth buckets exhaust the table and stay near the " +
      "ideal depth") {
    val rows = graft.queries.PlannerQueries.q321_equidepth_audit(spark, sf)
      .collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    assert(rows.map(_.getLong(0)).toSeq ===
      rows.map(_.getLong(0)).sorted.toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2))
      case _ =>
    }
    // near-continuous values: every bucket within 20% of N/16
    rows.foreach(r => assert(math.abs(r.getLong(4)) < 200000L,
      s"bucket ${r.getLong(0)} dev ${r.getLong(4)} ppm"))
  }
}
