package graft

import org.apache.spark.sql.functions._

import graft.pipeline.MultiPattern

/** Property tests for the retrieval-and-selection tier (SelectQueries):
  * the oracle gate pins outputs; these pin the algorithmic claims.
  */
class SelectSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ----------------------------------------------------------------
  // Aho–Corasick — equivalence with the naive per-pattern scan
  // ----------------------------------------------------------------

  /** Naive reference: strpos + greedy left-to-right non-overlapping
    * count (replace() semantics), one pass per pattern. */
  private def naive(text: String, pats: Seq[String])
      : Map[String, (Int, Int)] =
    pats.flatMap { p =>
      val first = text.indexOf(p)
      if (first < 0) None
      else {
        var cnt = 0
        var from = 0
        var i = text.indexOf(p, from)
        while (i >= 0) {
          cnt += 1
          from = i + p.length
          i = text.indexOf(p, from)
        }
        Some(p -> (first + 1, cnt))
      }
    }.toMap

  private def acMap(text: String, pats: Seq[String])
      : Map[String, (Int, Int)] = {
    val ac = MultiPattern.build(pats)
    ac.scan(text).map { case (pi, pos, n) =>
      ac.patterns(pi) -> (pos, n)
    }.toMap
  }

  test("AC matches naive scan on overlap-heavy crafted cases") {
    val cases = Seq(
      // self-overlapping pattern: greedy non-overlap = replace() count
      ("ababababa", Seq("aba", "ab", "ba")),
      // pattern that is a suffix of another (dictionary links)
      ("xhershey hers he", Seq("hers", "he", "she", "hershey")),
      // match at position 1 and at the very end
      ("abcabc", Seq("abc", "bc", "c")),
      // pattern longer than text, and a full-text pattern
      ("short", Seq("shortlonger", "short", "hort")),
      // repeated single char
      ("aaaaaa", Seq("a", "aa", "aaa")))
    cases.foreach { case (text, pats) =>
      assert(acMap(text, pats) === naive(text, pats),
        s"mismatch on '$text'")
    }
  }

  test("AC matches naive scan on real corpus docs with the q276 dict") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val pats = docs.toSeq
      .flatMap { case (_, t) =>
        t.trim.split("\\s+").sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }
      .groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (t, n) => (-n, t) }
      .take(32).map(_._1)
    docs.take(50).foreach { case (id, text) =>
      assert(acMap(text, pats) === naive(text, pats), s"doc $id")
    }
  }

  test("AC rejects empty and duplicate dictionaries") {
    intercept[IllegalArgumentException](MultiPattern.build(Seq.empty))
    intercept[IllegalArgumentException](MultiPattern.build(Seq("a", "")))
    intercept[IllegalArgumentException](
      MultiPattern.build(Seq("ab", "ab")))
  }

  // ----------------------------------------------------------------
  // q277 — sorted-neighborhood recall on the uncorrupted-suffix slice
  // ----------------------------------------------------------------

  test("sorted-neighborhood blocks every pair with an intact suffix " +
      "and at most one other corruption") {
    import spark.implicits._
    val out = graft.queries.SelectQueries
      .q277_sorted_neighborhood(spark, sf)
    val matched = out.filter(col("is_match") === 1)
      .select((col("id_a") / 2).cast("long").as("k"))
      .as[Long].collect().toSet
    // eligible: sfx intact (k%13≠0) and ≤1 corruption among 11/7/5 —
    // the 2k/2k+1 entries are then ADJACENT in (sfx, rec_id) order and
    // agree on ≥3 of 4 fields, so the window MUST pair them
    val ks = Tables.customer(spark, sf)
      .select(col("c_custkey")).as[Long].collect()
    val eligible = ks.filter { k =>
      k % 13 != 0 &&
        Seq(11, 7, 5).count(m => k % m == 0) <= 1
    }.toSet
    val missed = eligible.diff(matched)
    assert(missed.isEmpty,
      s"${missed.size} eligible entities missed: ${missed.take(5)}")
  }

  // ----------------------------------------------------------------
  // q278 — the TA stop guarantee actually holds
  // ----------------------------------------------------------------

  test("TA stopped depths have found the true global k-th score, and " +
      "stopped is monotone in depth") {
    val rows = graft.queries.SelectQueries
      .q278_threshold_topk(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getAs[Long]("stopped") == 1L)
        assert(r.getAs[Long]("kth_best_seen") ===
          r.getAs[Long]("global_kth"),
          s"stopped at d=${r.getAs[Long]("d")} without the true top-k")
    }
    val flags = rows.sortBy(_.getAs[Long]("d")).map(_.getAs[Long]("stopped"))
    assert(flags.sliding(2).forall(p => p.head <= p.last),
      s"stopped not monotone: ${flags.mkString(",")}")
    assert(flags.last == 1L, "TA never stopped even at full depth")
  }

  // ----------------------------------------------------------------
  // q279 — RRF fusion sanity: fused ranks follow the integer formula
  // ----------------------------------------------------------------

  test("RRF scores are exactly the sum of the two rank contributions " +
      "and frank orders them") {
    val rows = graft.queries.SelectQueries.q279_rrf_fusion(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rf, rp) = (r.getAs[Long]("rank_full"), r.getAs[Long]("rank_pre"))
      val want = (if (rf > 0) 1000000000L / (60 + rf) else 0L) +
        (if (rp > 0) 1000000000L / (60 + rp) else 0L)
      assert(r.getAs[Long]("rrf_score") === want)
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("frank"))
      assert(sorted.map(_.getAs[Long]("rrf_score")).sliding(2)
        .forall(p => p.length < 2 || p.head >= p.last))
    }
  }

  // ----------------------------------------------------------------
  // q280 — greedy gains are non-increasing and coverage adds up
  // ----------------------------------------------------------------

  test("greedy set-cover gains never increase and cum_covered is the " +
      "running sum of gains") {
    val rows = graft.queries.SelectQueries
      .q280_greedy_set_cover(spark, sf)
      .collect().sortBy(_.getAs[Int]("round"))
    assert(rows.nonEmpty)
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.sliding(2).forall(p => p.length < 2 || p.head >= p.last),
      s"gains increased: ${gains.mkString(",")}")
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("gain")
      assert(r.getAs[Long]("cum_covered") === cum,
        s"round ${r.getAs[Int]("round")}: covered != sum of gains")
    }
  }

  // ----------------------------------------------------------------
  // q282 — grid prune is lossless vs the naive skyline, and prunes
  // ----------------------------------------------------------------

  test("grid-pruned skyline equals the naive dominance skyline") {
    val fast = graft.queries.SelectQueries.q282_skyline(spark, sf)
    val pts = Tables.part(spark, sf).select(
      col("p_partkey").as("pk"),
      expr("cast(floor(p_retailprice * 100) as bigint)").as("pc"),
      col("p_size").cast("long").as("sz"),
      expr("(p_partkey * 2654435761) % 4294967296 % 100000").as("hv"))
      .localCheckpoint(true)
    val naive = pts.as("p").join(pts.as("q"),
        col("q.pc") <= col("p.pc") && col("q.sz") >= col("p.sz") &&
          col("q.hv") >= col("p.hv") &&
          (col("q.pc") < col("p.pc") || col("q.sz") > col("p.sz") ||
            col("q.hv") > col("p.hv")),
        "left_anti")
      .select(col("pk"), col("pc"), col("sz"), col("hv"))
    assert(fast.exceptAll(naive).isEmpty &&
      naive.exceptAll(fast).isEmpty)
    val skySize = fast.count()
    val nPts = pts.count()
    assert(skySize < nPts / 2,
      s"skyline $skySize not a real frontier of $nPts points")
  }

  // ----------------------------------------------------------------
  // q288 — MaxScore never skips a true top-k document
  // ----------------------------------------------------------------

  test("MaxScore upper bounds dominate true scores, so no skipped " +
      "candidate can reach theta") {
    import spark.implicits._
    val out = graft.queries.SelectQueries.q288_maxscore_audit(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_candidates") ===
        r.getAs[Long]("n_evaluated") + r.getAs[Long]("n_skipped"))
      assert(r.getAs[Long]("theta") > 0)
      assert(r.getAs[Long]("n_evaluated") >= 10L,
        "fewer evaluated docs than k — the top-k itself would be lost")
    }
    // UB-dominance rebuilt independently: for every (query, doc),
    // sum of per-term max scores >= the doc's true score
    val tf = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.pipeline.TextAnalysis.tokens(col("text")))
          .as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val ms = tf.groupBy(col("tok")).agg(max(col("tf")).as("ms"))
    val viol = tf.join(ms, Seq("tok"))
      .filter(col("tf") > col("ms")).count()
    assert(viol === 0L, "a term frequency exceeded its own max score")
  }

  // ----------------------------------------------------------------
  // q281 — varint width CASE is the real LEB128 width
  // ----------------------------------------------------------------

  test("varint CASE widths equal ceil(bits/7) LEB128 widths") {
    def leb(v: Long): Int = {
      var x = v
      var b = 1
      while (x >= 128) { x >>= 7; b += 1 }
      b
    }
    val probes = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, 2097151L,
      2097152L, 268435455L, 268435456L, 34359738367L, 34359738368L,
      4398046511103L, 4398046511104L, Int.MaxValue.toLong * 1000)
    val df = spark.createDataFrame(probes.map(Tuple1(_)))
      .toDF("gap")
      .withColumn("w", expr(
        "CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2 " +
          "WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4 " +
          "WHEN gap < 34359738368 THEN 5 WHEN gap < 4398046511104 " +
          "THEN 6 ELSE 7 END"))
    val got = df.select(col("gap"), col("w")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    probes.foreach { v =>
      assert(got(v) === leb(v), s"width($v)")
    }
  }
}
