package graft

import org.apache.spark.sql.functions._

import graft.pipeline.WordPiece

/** Property tests for the round-8 additions that live in existing
  * query families: q291 WordPiece (TrainPrepQueries), q292 AMS F2
  * (StatQueries), q293 CDC apply (IntegrityQueries).
  */
class Round8AdditionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ----------------------------------------------------------------
  // q291 — greedy longest-match semantics and length conservation
  // ----------------------------------------------------------------

  test("WordPiece picks the longest matching piece at every position") {
    import spark.implicits._
    val vocab = "abcdex".map(_.toString) ++ Seq("ab", "abc", "cd", "de")
    val words = Seq("abcd", "abcde", "cdcd", "xabc", "e")
    val got = WordPiece
      .tokenizePieces(words.toDF("word"), "word", vocab)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getLong(2)).toMap)
      .toMap
    // greedy: "abcd" → abc + d (NOT ab + cd, which a shortest-first
    // or optimal tokenizer might pick)
    assert(got("abcd") === Map("abc" -> 1L, "d" -> 1L))
    assert(got("abcde") === Map("abc" -> 1L, "de" -> 1L))
    assert(got("cdcd") === Map("cd" -> 2L))
    assert(got("xabc") === Map("x" -> 1L, "abc" -> 1L))
    assert(got("e") === Map("e" -> 1L))
  }

  test("WordPiece conserves characters and fails loudly on a " +
      "missing single-char piece") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val words = docs
      .select(explode(graft.pipeline.TextAnalysis.tokens(col("text")))
        .as("word"))
      .filter(length(col("word")) <= 12).distinct()
    val chars = words.as[String].collect()
      .flatMap(_.toSeq).distinct.map(_.toString).toSeq
    val pieces = WordPiece.tokenizePieces(words, "word", chars ++
        Seq("ta", "tab", "able"))
      .groupBy(col("word"))
      .agg(sum(length(col("piece")) * col("n_uses")).as("chars"))
      .join(words.select(col("word"),
        length(col("word")).cast("long").as("len")), Seq("word"))
      .filter(col("chars") =!= col("len"))
      .count()
    assert(pieces === 0L, "piece lengths do not reassemble the words")
    val thrown = intercept[Exception] {
      WordPiece.tokenizePieces(Seq("zzq").toDF("word"), "word",
        Seq("z")).collect()
    }
    assert(thrown.getMessage != null)
  }

  // ----------------------------------------------------------------
  // q292 — estimator internals are consistent
  // ----------------------------------------------------------------

  test("AMS estimators are squares, the median is one of them, and " +
      "err_ppm is the stated formula") {
    val rows = graft.queries.StatQueries.q292_ams_f2(spark, sf).collect()
    assert(rows.length === 16)
    val ests = rows.map(_.getAs[Long]("est"))
    assert(ests.forall(_ >= 0L))
    val med = rows.head.getAs[Long]("median_est")
    assert(ests.contains(med))
    // lower median: exactly 7 estimators strictly below it at most
    assert(ests.count(_ < med) <= 7 && ests.count(_ > med) <= 8)
    rows.foreach { r =>
      val t = r.getAs[Long]("true_f2")
      assert(r.getAs[Long]("err_ppm") ===
        math.abs(med - t) * 1000000L / t)
    }
  }

  // ----------------------------------------------------------------
  // q294 — μ-law codec properties
  // ----------------------------------------------------------------

  test("mu-law is idempotent on codec values, bounded-error, and " +
      "monotone in magnitude") {
    import graft.pipeline.MediaCodecs
    def rt(v: Int): Int =
      MediaCodecs.muLawDecodeSample(MediaCodecs.muLawEncodeSample(v))
    val probes = (-32768 to 32767 by 37) ++
      Seq(-32768, -32636, -32635, -1, 0, 1, 131, 132, 255, 256,
        32635, 32767)
    probes.foreach { v =>
      val once = rt(v)
      assert(rt(once) === once, s"not idempotent at $v")
      assert(math.abs(once - v) < 1024, s"error too large at $v")
      assert(once.signum * v.signum >= 0, s"sign flipped at $v")
    }
    // encode is monotone non-increasing in code space as |v| grows
    // within one sign (codes are complemented) — check via decode:
    val mags = (0 to 32635 by 97).map(rt)
    assert(mags.sliding(2).forall(p => p.length < 2 || p.head <= p.last),
      "decoded magnitude not monotone in input magnitude")
  }

  // ----------------------------------------------------------------
  // q293 — merge arithmetic conserves rows and balances
  // ----------------------------------------------------------------

  test("CDC apply conserves rows and balances per segment") {
    import spark.implicits._
    val out = graft.queries.IntegrityQueries.q293_cdc_apply(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_final") ===
        r.getAs[Long]("n_base") - r.getAs[Long]("n_del") +
          r.getAs[Long]("n_ins"),
        s"${r.getString(0)}: row conservation")
    }
    // balance checksum rebuilt independently from the fixture rules
    val cust = Tables.customer(spark, sf).select(
        col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        expr("cast(floor(c_acctbal * 100) as bigint)").as("bal"))
      .as[(Long, String, Long)].collect()
    val bySeg = cust.groupBy(_._2)
    out.foreach { r =>
      val seg = r.getString(0)
      val want = bySeg(seg).map { case (k, _, bal) =>
        if (k % 2 == 1) bal // inserted
        else if (k % 10 == 0 || k % 5 == 0) 0L // deleted (even ∧ %5)
        else if (k % 6 == 0 || (k % 2 == 0 && k % 3 == 0)) bal + 1000L
        else bal
      }.sum
      assert(r.getAs[Long]("bal_sum") === want, s"$seg balance")
    }
  }
}
