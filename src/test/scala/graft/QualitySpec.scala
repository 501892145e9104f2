package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sampling, Similarity, TextAnalysis}

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("q268 every format round-trips the same aggregate and leaks " +
      "no temp files") {
    val sf = "/root/testdata/sf0.001"
    val before = Option(new java.io.File("/tmp").listFiles())
      .map(_.count(_.getName.startsWith("graft_fmt_"))).getOrElse(0)
    val rows = graft.queries.QualityQueries
      .q268_format_roundtrip(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === Seq("csv", "json", "orc"))
    // all three formats reproduce the identical aggregate
    assert(rows.map(t => (t._2, t._3, t._4, t._5, t._6)).distinct
      .length === 1)
    val n = Tables.orders(spark, sf).count()
    assert(rows.head._2 === n)
    val after = Option(new java.io.File("/tmp").listFiles())
      .map(_.count(_.getName.startsWith("graft_fmt_"))).getOrElse(0)
    assert(after === before, "q268 leaked temp directories")
  }

  test("q261 repetition signals match a naive per-doc mirror") {
    val sf = "/root/testdata/sf0.001"
    val want = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .flatMap { case (id, text) =>
        val toks =
          if (text.trim.isEmpty) Array.empty[String]
          else text.trim.split("\\s+")
        if (toks.isEmpty) None else {
          val nChars = toks.map(_.length.toLong).sum
          val bigs = toks.sliding(2).filter(_.length == 2).toSeq
            .map(p => (p.mkString(" "), p.map(_.length.toLong).sum))
          val top2 = bigs.groupBy(identity).view.mapValues(_.size.toLong)
            .toSeq.sortBy { case ((bg, _), c) => (-c, bg) }.headOption
          val top2Cnt = top2.map(_._2).getOrElse(0L)
          val top2Chars = top2.map { case ((_, bl), c) => c * bl }
            .getOrElse(0L)
          val fives = toks.sliding(5).filter(_.length == 5).zipWithIndex
            .map { case (g, i) => (g.mkString(" "), i) }.toSeq
          val dup = fives.groupBy(_._1).filter(_._2.size >= 2).keySet
          val covered = fives.filter(f => dup(f._1))
            .flatMap(f => f._2 to f._2 + 4).distinct
          val dup5Chars = covered.map(p => toks(p).length.toLong).sum
          val top2Ppm =
            if (nChars > 0) top2Chars * 1000000L / nChars else 0L
          val dup5Ppm =
            if (nChars > 0) dup5Chars * 1000000L / nChars else 0L
          val pass = if (top2Ppm <= 200000 && dup5Ppm <= 150000) 1L else 0L
          Some((id, toks.length.toLong, nChars, top2Cnt, top2Ppm,
            dup5Ppm, pass))
        }
      }.sortBy(_._1).toSeq
    val got = graft.queries.QualityQueries
      .q261_repetition_signals(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === want)
    assert(want.nonEmpty)
  }

  test("q167 delta joins broadcast the delta side, not the base") {
    val plan = graft.queries.QualityQueries
      .q167_incremental_join(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // three delta joins, each hinted to broadcast its churn-sized side
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(2000))
  }

  test("q172 expectations count each violation class exactly") {
    // the real testdata is clean on 5 of 7 rules — prove the violation
    // arms on a deliberately dirty mini-warehouse
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q172_spec").toString
    Seq(
      (1L, 1, 10.0, 0.05, ts),  // clean
      (1L, 2, 99.0, 0.05, ts),  // quantity out of range
      (1L, 3, 10.0, 0.50, ts),  // discount out of range
      (9L, 1, 10.0, 0.05, ts),  // orphan orderkey (no order 9)
      (2L, 1, 10.0, 0.05, ts),  // dup (orderkey, linenumber) ...
      (2L, 1, 11.0, 0.05, ts)   // ... both rows count as violations
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(
      (1L, 10L, "O", 100.0, ts),
      (2L, 10L, "X", 100.0, ts),  // status outside domain
      (3L, 10L, "F", -5.0, ts),   // non-positive totalprice
      (4L, 99L, "P", 100.0, ts)   // orphan custkey (no customer 99)
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    Seq(Tuple1(10L)).toDF("c_custkey")
      .write.parquet(s"$dir/customer.parquet")
    val got = graft.queries.QualityQueries.q172_expectations(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("lineitem.quantity_in_1_50") === ((6L, 1L)))
    assert(got("lineitem.discount_in_0_0.11") === ((6L, 1L)))
    assert(got("lineitem.pk_unique") === ((6L, 2L)))
    assert(got("lineitem.fk_orders") === ((6L, 1L)))
    assert(got("orders.totalprice_positive") === ((4L, 1L)))
    assert(got("orders.status_in_domain") === ((4L, 1L)))
    assert(got("orders.fk_customer") === ((4L, 1L)))
  }

  test("gopherRulesDf flags each rule independently") {
    val good = (Seq.fill(10)("the") ++ Seq.fill(10)("and") ++
      Seq.fill(40)("word")).mkString(" ") // 60 words, all alpha
    val df = Seq(
      (1L, good),                                // passes everything
      (2L, "short text the and"),                // fails word count
      (3L, ("the and " + Seq.fill(60)("#!").mkString(" "))), // symbols
      (4L, good.replace("the", "zzz").replace("and", "yyy")) // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRulesDf(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("pass") === 1)
    assert(out(1).getAs[Int]("r_wordcount") === 0)
    assert(out(2).getAs[Int]("r_symbol") === 0)
    assert(out(2).getAs[Int]("r_alpha") === 0)
    assert(out(3).getAs[Int]("r_stopword") === 0)
    assert(out(3).getAs[Int]("pass") === 0)
  }

  test("containmentPairs finds strict subset docs directionally") {
    val df = Seq(
      (1L, "a b c d"),          // bigrams {a b, b c, c d}
      (2L, "a b c d e f"),      // superset of 1's bigrams
      (3L, "x y z"),            // unrelated
      (4L, "a b c d")           // identical to 1 — equal size, excluded
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L), (4L, 2L)))
  }

  test("quantizeInt8 is exact on known vectors and handles zeros") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(out(0).getAs[Long]("scale_ppb") === 1000000000L)
    assert(out(0).getAs[Seq[Long]]("q") === Seq(127L, -63L, 32L))
    assert(out(1).getAs[Long]("scale_ppb") === 0L)
    assert(out(1).getAs[Seq[Long]]("q") === Seq(0L, 0L, 0L))
  }

  test("cdcChunks boundaries are content-anchored (edit-stable)") {
    val words = (1 to 200).map(i => s"w$i").mkString(" ")
    val orig = Seq((1L, words)).toDF("doc_id", "text")
    val chunksOf = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.cdcChunks(df, "doc_id", "text", modulus = 8)
        .orderBy("chunk_idx")
        .collect().map(_.getAs[Long]("n_words")).toSeq
    val base = chunksOf(orig)
    assert(base.sum === 200L)
    assert(base.length > 1) // hash boundaries actually fire
    // prepend an edit: only the FIRST chunk changes, the tail of the
    // chunking (content-defined) is identical
    val edited = Seq((1L, "zedit " + words)).toDF("doc_id", "text")
    val after = chunksOf(edited)
    assert(after.sum === 201L)
    assert(after.takeRight(base.length - 1) === base.tail)
  }

  test("centroidRecompute sums components decimal-exactly per (cid, dim)") {
    val vectors = Seq(
      (1L, Array(1.0, 2.0)), (2L, Array(3.0, 4.0)), (3L, Array(10.0, 0.5))
    ).toDF("vid", "vec")
    val assigned = Seq((1L, 100L), (2L, 100L), (3L, 200L))
      .toDF("vid", "cid")
    val out = graft.pipeline.Clusters.centroidRecompute(assigned, vectors)
      .orderBy("cid", "dim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      (100L, 0, 2L, 4000000L),  // 1+3
      (100L, 1, 2L, 6000000L),  // 2+4
      (200L, 0, 1L, 10000000L),
      (200L, 1, 1L, 500000L)))
  }

  test("native IntDotProduct matches the fold formula and handles nulls") {
    val rnd = new scala.util.Random(29)
    val vecs = (1 to 30).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextInt(255) - 127).toLong),
        Array.fill(64)((rnd.nextInt(255) - 127).toLong))
    }.toDF("id", "a", "b")
    val both = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("ref"),
      Similarity.intDot(col("a"), col("b")).as("fast")).collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val bad = Seq((Some(Array(1L, 2L)), Some(Array(1L))),
      (None, Some(Array(1L)))).toDF("a", "b")
    val out = bad.select(Similarity.intDot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
    // a null ELEMENT poisons the product (SQL semantics), not read-as-0
    val nullElem = spark.sql(
      "SELECT array(1L, CAST(NULL AS BIGINT)) AS a, array(2L, 3L) AS b")
      .select(Similarity.intDot(col("a"), col("b"))).collect()
    assert(nullElem(0).isNullAt(0))
  }

  test("IntDotProduct returns null at int64 overflow, never wraps") {
    // register the SQL name (idempotent; test order must not matter)
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "graft_int_dot",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.IntDotProduct(children(0), children(1)))
    val max = Long.MaxValue
    val min = Long.MinValue
    val cases = Seq(
      // (a, b, expected: Some(dot) | None for null)
      (Array(max), Array(1L), Some(max)),            // boundary, exact
      (Array(max), Array(2L), None),                 // multiply overflow
      (Array(min), Array(-1L), None),                // -MIN unrepresentable
      (Array(max, max), Array(1L, 1L), None),        // accumulate overflow
      (Array(max, max), Array(1L, -1L), Some(0L)),   // cancels, in range
      (Array(max - 1, 1L), Array(1L, 1L), Some(max)) // lands ON the edge
    )
    // drive BOTH eval paths: whole-stage codegen (the repartition stops
    // ConvertToLocalRelation from interpreting the project eagerly) and
    // interpreted nullSafeEval (literal SQL constant-folds pre-codegen)
    cases.zipWithIndex.foreach { case ((a, b, want), i) =>
      val df = Seq((a, b)).toDF("a", "b").repartition(1)
        .select(Similarity.intDot(col("a"), col("b")).as("d"))
      val row = df.collect()(0)
      want match {
        case Some(v) => assert(row.getLong(0) === v, s"case $i codegen")
        case None    => assert(row.isNullAt(0), s"case $i codegen")
      }
      val lit = spark.sql(
        s"SELECT graft_int_dot(array(${a.mkString("L,")}L), " +
          s"array(${b.mkString("L,")}L)) AS d").collect()(0)
      want match {
        case Some(v) => assert(lit.getLong(0) === v, s"case $i interp")
        case None    => assert(lit.isNullAt(0), s"case $i interp")
      }
    }
    // property sweep (interpreted local eval — fast): random
    // near-boundary magnitudes agree with exact BigInt arithmetic
    val rnd = new scala.util.Random(31)
    (1 to 200).foreach { i =>
      val n = 1 + rnd.nextInt(4)
      def vec() = Array.fill(n)(
        (rnd.nextLong() >> rnd.nextInt(32)): Long)
      val (a, b) = (vec(), vec())
      val big = a.zip(b).map { case (x, y) =>
        BigInt(x) * BigInt(y) }.sum
      val inRange = big >= BigInt(Long.MinValue) && big <= BigInt(Long.MaxValue) &&
        a.zip(b).forall { case (x, y) =>
          val p = BigInt(x) * BigInt(y)
          p >= BigInt(Long.MinValue) && p <= BigInt(Long.MaxValue) } &&
        a.zip(b).scanLeft(BigInt(0)) { case (acc, (x, y)) =>
          acc + BigInt(x) * BigInt(y) }.forall(s =>
            s >= BigInt(Long.MinValue) && s <= BigInt(Long.MaxValue))
      val row = Seq((a, b)).toDF("a", "b")
        .select(Similarity.intDot(col("a"), col("b"))).collect()(0)
      if (inRange) assert(row.getLong(0) === big.toLong, s"sweep $i")
      else assert(row.isNullAt(0), s"sweep $i overflow must null")
    }
  }

  test("graft_int_dot callable from spark.sql after live registration") {
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "graft_int_dot",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.IntDotProduct(children(0), children(1)))
    val v = spark.sql(
      "SELECT graft_int_dot(array(2L, 3L), array(4L, 5L)) AS d")
      .collect()(0).getLong(0)
    assert(v === 23L)
  }

  test("weightedPrioritySample favors heavy rows and is deterministic") {
    // weight 1000 vs 1: heavy rows should dominate a k=5 sample
    val df = (0L until 100L).map { i =>
      (i, "s", if (i < 10) 1000L else 1L)
    }.toDF("id", "stratum", "w")
    val pick = (d: org.apache.spark.sql.DataFrame) =>
      Sampling.weightedPrioritySample(d, "id", "stratum", "w", 5)
        .select("id").collect().map(_.getLong(0)).toSet
    val s1 = pick(df)
    assert(s1 === pick(df)) // hash-deterministic
    assert(s1.count(_ < 10L) >= 4) // heavy rows win ~always
    // zero-weight rows are never sampled
    val withZero = df.withColumn("w",
      when(col("id") === 50L, 0L).otherwise(col("w")))
    assert(!pick(withZero).contains(50L))
  }

  test("weightedPrioritySample survives hostile column names") {
    // weight column whose name needs backtick quoting inside expr(),
    // plus pre-existing _h0 (the first temp-name candidate) — both
    // would break a naive string-interpolated `_h div $weightCol`
    val df = (0L until 100L).map { i =>
      (i, "s", if (i < 10) 1000L else 1L, "decoy")
    }.toDF("id", "stratum", "the weight.col", "_h0")
    val got = Sampling.weightedPrioritySample(
      df, "id", "stratum", "the weight.col", 5)
    assert(got.count() === 5)
    // the decoy _h0 column must survive untouched
    assert(got.columns.contains("_h0"))
    assert(got.select("_h0").collect().forall(_.getString(0) == "decoy"))
    // same picks as the clean-named frame (name can't change semantics)
    val clean = Sampling.weightedPrioritySample(
      (0L until 100L).map(i => (i, "s", if (i < 10) 1000L else 1L))
        .toDF("id", "stratum", "w"), "id", "stratum", "w", 5)
    assert(got.select("id").collect().map(_.getLong(0)).toSet ===
      clean.select("id").collect().map(_.getLong(0)).toSet)
    // documented refusal: an input already carrying priority/rank
    val taken = df.withColumnRenamed("_h0", "priority")
    intercept[IllegalArgumentException] {
      Sampling.weightedPrioritySample(
        taken, "id", "stratum", "the weight.col", 5)
    }
  }

  test("round-4 ops degrade gracefully on empty and degenerate input") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.gopherRulesDf(empty, "doc_id", "text")
      .count() === 0L)
    assert(TextAnalysis.cdcChunks(empty, "doc_id", "text").count() === 0L)
    assert(Dedup.containmentPairs(empty, "doc_id", "text").count() === 0L)
    // a single doc can never be contained in another
    val one = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(one, "doc_id", "text").count() === 0L)
    // empty-text doc: zero words fail every count-based gopher rule
    val blank = TextAnalysis.gopherRulesDf(
      Seq((1L, "   ")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(blank.getAs[Int]("pass") === 0)
    // cdcChunks drops empty docs entirely (no zero-word chunk rows)
    assert(TextAnalysis.cdcChunks(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .count() === 0L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "fp")
    val newSnap = Seq((2L, "b"), (3L, "C"), (4L, "d"))
      .toDF("id", "fp")
    val out = graft.pipeline.Curation
      .snapshotDiff(oldSnap, newSnap, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // presence comes from markers, not fingerprint nullness: an
    // old-only id with a NULL fingerprint is still "removed"
    val oldNull = Seq((1L, Option.empty[String]), (2L, Some("b")))
      .toDF("id", "fp")
    val newNull = Seq((2L, Option.empty[String])).toDF("id", "fp")
    val out2 = graft.pipeline.Curation
      .snapshotDiff(oldNull, newNull, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 === Map(1L -> "removed", 2L -> "changed"))
  }

  test("tokenMixtureSample caps over-budget strata and keeps the rest") {
    val df = (0L until 300L).map { i =>
      (i, if (i < 200) "big" else "small", 10L)
    }.toDF("id", "src", "toks")
    // big has 2000 tokens vs target 500 → rate 250k ppm; small under
    // budget → rate capped at 1e6 (keep all)
    val out = Sampling.tokenMixtureSample(df, "id", "src", "toks",
      Map("big" -> 500L), defaultTarget = 1000000L)
    val rates = out.groupBy("src").agg(max("rate_ppm")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("big") === 250000L)
    assert(rates("small") === 1000000L)
    val kept = out.filter(col("src") === "small" && col("kept") === 0)
    assert(kept.count() === 0L) // rate 1e6 keeps every row
    // deterministic: same membership on re-run
    val k1 = out.filter(col("kept") === 1).select("id")
      .collect().map(_.getLong(0)).toSet
    val k2 = Sampling.tokenMixtureSample(df, "id", "src", "toks",
        Map("big" -> 500L), defaultTarget = 1000000L)
      .filter(col("kept") === 1).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(k1 === k2)
    // a NULL stratum is a stratum: rows survive (null-safe join), with
    // the default target applied to the null-key group
    val withNull = Seq((1L, Some("big"), 10L), (2L, None, 10L))
      .toDF("id", "src", "toks")
    val outN = Sampling.tokenMixtureSample(withNull, "id", "src", "toks",
      Map.empty, defaultTarget = 1000000L)
    assert(outN.count() === 2L)
    assert(outN.filter(col("src").isNull && col("kept") === 1)
      .count() === 1L)
  }

  test("q182 skyline keeps ties on the frontier, drops dominated docs") {
    // docs: (10,5) A, (10,5) B (tie — both on frontier), (10,3) C
    // (dominated by A on types), (12,4) D (frontier: longest with 4),
    // (8,6) E (frontier: richest), (8,4) F (dominated by A and E)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-skyline").toString
    def doc(nToks: Int, nTypes: Int): String =
      ((0 until nTypes).map(i => s"w$i") ++
        Seq.fill(nToks - nTypes)("w0")).mkString(" ")
    Seq(1L -> doc(10, 5), 2L -> doc(10, 5), 3L -> doc(10, 3),
        4L -> doc(12, 4), 5L -> doc(8, 6), 6L -> doc(8, 4))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.queries.QualityQueries
      .q182_pareto_skyline(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 4L, 5L))
  }

  test("q186 waterfilling saturates caps, dust lands on one lang, " +
      "allocations sum to the budget exactly") {
    // T: c=5, b=101, a=100, d=100 → budget = 306*3 div 2 = 459.
    // c saturates (cap 10 < level); level = (459-10) div 3 = 149,
    // dust = 449 - 3*149 = 2 → first unsaturated lang (a) takes it.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-epochs").toString
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    Seq((1L, doc(5), "c"), (2L, doc(101), "b"), (3L, doc(100), "a"),
        (4L, doc(100), "d"))
      .toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = graft.queries.QualityQueries
      .q186_epoch_allocation(spark, dir).collect()
    val alloc = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(alloc === Map("a" -> 151L, "b" -> 149L, "c" -> 10L,
      "d" -> 149L))
    assert(alloc.values.sum === 459L) // = budget, bit-exact
    val sat = rows.filter(_.getBoolean(5)).map(_.getString(0)).toSeq
    assert(sat === Seq("c"))
  }

  test("q183 oversized file claims its own bin; order is preserved") {
    // partition 0 files (by doc_id div 8): f0 tiny, f1 huge (> target
    // on its own), f2 tiny — greedy must emit f0 in bin 0, f1 pushed
    // into its own bin, f2 after it (never reordered around the whale)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact").toString
    val rows = Seq(
      (0L, "a" * 100), (8L, "b" * 20000), (16L, "c" * 100))
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.queries.QualityQueries
      .q183_compaction_plan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // (part, bin, n_files, tot_bytes, first, last)
    assert(got.toSeq === Seq(
      (0L, 0L, 2L, 20100L, 0L, 1L), // f0 + the whale start bin 0
      (0L, 2L, 1L, 100L, 2L, 2L)))  // f2 lands past the whale's mass
  }

  test("q239 filter bias audit matches a naive scored mirror") {
    val sf = "/root/testdata/sf0.001"
    def score(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      text.trim.split("\\s+").map { tok =>
        val hex = md.digest(s"feat:$tok".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val slot = java.lang.Long.parseLong(hex, 16) % 1024L
        (slot * 2654435761L) % 2001L - 1000L
      }.sum
    }
    val docs = Tables.documents(spark, sf)
      .selectExpr("n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.trim.nonEmpty)
      .map { case (nc, text) => (math.min(nc / 100, 9), score(text) > 0) }
    val td = docs.length.toLong
    val tk = docs.count(_._2).toLong
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, ds) =>
      val (n, k) = (ds.length.toLong, ds.count(_._2).toLong)
      val keepPpm = k * 1000000L / n
      val overall = tk * 1000000L / td
      (b, n, k, keepPpm, overall,
        if (overall == 0) None else Some(keepPpm * 1000L / overall))
    }
    val got = graft.queries.QualityQueries
      .q239_filter_bias_audit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.toSeq === want)
  }

  test("containment verify: set path and join-native path agree") {
    // the adaptive verify (jaccardPairsAdaptive discipline) must be a
    // pure execution-strategy choice — same pairs either way
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def pairs(thresh: Long) = graft.pipeline.Dedup
      .containmentPairs(docs, "doc_id", "text", 2,
        setVerifyMaxShingleRows = thresh)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val viaSets = pairs(Long.MaxValue)
    val viaJoin = pairs(0L)
    assert(viaSets === viaJoin)
    assert(viaSets.nonEmpty, "fixture produced no containment pairs")
  }
}
