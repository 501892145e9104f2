package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-items (heavy-hitter) detection over corpus tokens: the
  * sketch-prune-then-exact-verify shape that replaces a full-vocabulary
  * groupBy when the vocabulary does not fit anywhere.
  *
  * Pass 1 runs a Misra-Gries summary (Misra & Gries 1982) per partition
  * and merges the constant-size summaries on the driver via
  * `treeAggregate` — the same mergeable-sketch pattern as the KMV
  * estimator. MG with capacity m guarantees every token whose true
  * count exceeds N/(m+1) survives the merge (the bound holds under
  * arbitrary merge order, Agarwal et al. 2013), so with a threshold
  * above that bound the candidate set has NO false negatives. Pass 2
  * re-scans with an `isin` filter on the ≤ m candidates and counts them
  * exactly, so the final output is exact — false positives from the
  * sketch are filtered by the real count, and the sketch's count error
  * never reaches the result.
  *
  * At 100 TB: the summary is O(capacity) per partition regardless of
  * data size, the merge is a driver-side fold over one map per
  * partition, and the verify pass is a scan with a broadcast in-set
  * predicate followed by a groupBy over ≤ capacity distinct keys —
  * nothing anywhere is vocabulary-sized. Natural pipeline use: finding
  * boilerplate tokens/domains/fingerprints worth a stop-list, the same
  * role as the reference's stop-word filter over backtick tokens
  * (pkg/indexer/documents/parser.go) but discovered from the corpus
  * instead of hard-coded.
  */
object Frequency {

  /** Exact percentile thresholds from per-key value rows via the
    * distributed-CDF shape (q76/q114/q236/q245/q248): reduce to the
    * per-(key, value) SPECTRUM, one cumsum window over the tiny
    * spectrum, then a conditional-min per requested threshold —
    * result v is the smallest value with cum·den ≥ n·num for each
    * (alias, num, den). Never `percentile_disc`, whose buffer holds
    * every distinct value per group. Returns keyCols ++ (n_rows,
    * aliases..., max_val). */
  def cdfPercentiles(rows: DataFrame, keyCols: Seq[String],
      valCol: String, thresholds: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spectrum = rows.groupBy((keyCols :+ valCol).map(col): _*)
      .agg(count(lit(1)).as("c"))
    val cdf = spectrum
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(col(valCol))))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(keyCols.map(col): _*)))
    val aggs = thresholds.map { case (alias, num, den) =>
      min(when(col("cum") * den >= col("n") * num, col(valCol)))
        .as(alias)
    } :+ max(col(valCol)).as("max_val")
    cdf.groupBy(keyCols.map(col): _*)
      .agg(first(col("n")).as("n_rows"), aggs: _*)
  }

  /** Add one observation to an MG summary of size ≤ capacity. */
  private[graft] def mgAdd(m: Map[String, Long], k: String,
      capacity: Int): Map[String, Long] =
    if (m.contains(k) || m.size < capacity) {
      m.updated(k, m.getOrElse(k, 0L) + 1L)
    } else {
      // full and k absent: decrement every counter (the classic
      // "cancel capacity+1 distinct items" step), dropping zeros
      m.flatMap { case (key, v) =>
        if (v > 1L) Some(key -> (v - 1L)) else None
      }
    }

  /** Merge two MG summaries back to capacity: sum counts, then subtract
    * the (capacity+1)-th largest count from all (Agarwal et al. 2013's
    * merge rule — keeps the N/(m+1) deficit bound). */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long],
      capacity: Int): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (m.size <= capacity) m
    else {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      m.flatMap { case (k, v) =>
        if (v > cut) Some(k -> (v - cut)) else None
      }
    }
  }

  /** Tokenizer-style vocabulary build: the `maxSize` most frequent
    * corpus tokens (ties broken by token text), each assigned a dense
    * 1-based id in (count desc, token) order — the id table every
    * featurizer/tokenizer consumes. The corpus-sized work is one
    * groupBy on the token key; the global top-`maxSize` cut runs as a
    * distributed TakeOrdered (no full sort), and the dense ids come
    * from sorted `zipWithIndex` over ONLY the ≤ maxSize-row result —
    * not from a global row_number window, whose empty partition spec
    * would plan the single-partition `WindowExec` this library bans.
    * The index is a per-partition offset sum, so the assigned ids are
    * total-order correct regardless of where the range partitioner
    * places its boundaries.
    *
    * Returns (token, cnt, token_id), ordered by token_id.
    */
  def buildVocab(df: DataFrame, textCol: String, maxSize: Int)
      : DataFrame = {
    require(maxSize >= 1 && maxSize <= 10000000,
      s"maxSize must be in [1, 1e7] (a vocabulary is broadcast-sized " +
        s"by definition), got $maxSize")
    val spark = df.sparkSession
    val top = df
      .filter(length(trim(col(textCol))) > 0)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(maxSize)
    val ranked = top.orderBy(col("cnt").desc, col("token")).rdd
      .zipWithIndex()
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1L) }
    spark.createDataFrame(ranked).toDF("token", "cnt", "token_id")
      .orderBy(col("token_id"))
  }

  /** Apply a [[buildVocab]] vocabulary to the corpus — the tokenizer
    * "encode" step. Each document's whitespace tokens map to their
    * dense ids (out-of-vocabulary → 0), summarized per document as
    * token/OOV counts plus an md5 fingerprint of the comma-joined id
    * sequence — a portable witness that the full encoded sequence is
    * identical across engines without comparing giant arrays.
    *
    * Scale shape: the vocabulary is collected and shipped as a literal
    * map — a vocabulary's defining property is that every worker holds
    * a copy (that is what a tokenizer IS), so the lookup is a
    * broadcast-style `element_at` inside one codegen'd projection.
    * Tokens of a document never leave their row (`transform` over the
    * token array), so encoding adds ZERO shuffles: no explode, no
    * token→id join, no per-doc regroup. At 100 TB this runs at scan
    * speed and composes with pushed filters.
    *
    * Returns (id, n_toks, n_oov, ids_fp), ordered by id.
    */
  def encodeWithVocab(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val entries: Map[String, Long] = vocab.select("token", "token_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vmap = typedLit(entries)
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
      .withColumn("ids", transform(col("tk"),
        t => coalesce(element_at(vmap, t), lit(0L))))
      .select(col(idCol),
        size(col("tk")).cast("long").as("n_toks"),
        size(filter(col("ids"), _ === 0L)).cast("long").as("n_oov"),
        md5(array_join(transform(col("ids"), _.cast("string")), ","))
          .as("ids_fp"))
      .orderBy(col(idCol))
  }

  /** Tokens appearing in at least `minFracPpm` parts-per-million of all
    * corpus token positions, with their EXACT counts, ordered by count
    * desc then token. `minFracPpm * (capacity+1)` must exceed 1e6 so
    * the MG guarantee covers the threshold (no false negatives at any
    * corpus size).
    */
  def heavyHitters(df: DataFrame, textCol: String, minFracPpm: Long,
      capacity: Int = 256): DataFrame = {
    require(minFracPpm >= 1 && minFracPpm <= 1000000L,
      s"minFracPpm must be in [1, 1e6], got $minFracPpm")
    require(minFracPpm * (capacity + 1) > 1000000L,
      s"threshold ${minFracPpm}ppm is below the MG guarantee " +
        s"1e6/(capacity+1) = ${1000000L / (capacity + 1)}ppm — raise " +
        "capacity or the threshold, or false negatives are possible")
    val toks = df
      .filter(length(trim(col(textCol))) > 0)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
    // pass 1: (MG summary, total token count) in one scan
    val (sketch, total) = toks.rdd
      .map(_.getString(0))
      .treeAggregate((Map.empty[String, Long], 0L))(
        seqOp = { case ((m, n), t) => (mgAdd(m, t, capacity), n + 1L) },
        combOp = { case ((m1, n1), (m2, n2)) =>
          (mgMerge(m1, m2, capacity), n1 + n2)
        })
    if (total == 0L || sketch.isEmpty) {
      toks.select(col("token"), lit(0L).as("cnt")).limit(0)
    } else {
      // pass 2: exact counts for the ≤ capacity candidates only.
      // cnt ≥ ceil(minFracPpm·total/1e6) ⟺ cnt·1e6 ≥ minFracPpm·total
      // for positive ints, but the cross-multiplication overflows Long
      // at ~9.2e12 tokens — at the corpus sizes this module targets —
      // so the threshold is computed once, exactly, in BigInt
      val threshold =
        ((BigInt(minFracPpm) * BigInt(total) + 999999) / 1000000).toLong
      toks.filter(col("token").isin(sketch.keys.toSeq: _*))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= lit(threshold))
        .orderBy(col("cnt").desc, col("token"))
    }
  }

  /** Collocation (phrase) mining, word2phrase-style (Mikolov et al.
    * 2013, "Distributed Representations of Words and Phrases", §4):
    * score adjacent word pairs by a discounted lift
    *
    *   score_ppm = ((n_ab − δ)·10⁶ div n_a) · N div n_b
    *
    * where n_ab is the bigram count, n_a/n_b the unigram counts, N the
    * corpus token total, and δ the discount that suppresses rare-pair
    * noise. The two-step floor division is the DEFINITION here (not an
    * approximation of a real-valued formula): it keeps every
    * intermediate ≤ max(10⁶·n_ab, 10⁶·N) — integer-exact and portable
    * to any engine with 64-bit div up to ~9×10¹² corpus tokens.
    *
    * Shape at scale: bigram and unigram counts are vocabulary-sized
    * groupBys; scoring is two equi-joins on word keys; N is a 1-row
    * aggregate cross-joined in. Top-k is a TakeOrdered (orderBy+limit),
    * never a single-partition window. Returns
    * (w1, w2, n_ab, n_a, n_b, score_ppm) — top `k` by
    * (score_ppm desc, w1, w2), pairs with n_ab ≥ minCount only.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5L,
      discount: Long = 5L, k: Int = 50): DataFrame = {
    val base = df
      .filter(length(trim(col(textCol))) > 0)
      .select(TextAnalysis.tokens(col(textCol)).as("tk"))
    val uni = base.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val n_total = uni.agg(sum(col("n")).as("n_tot"))
    val bg = base
      .filter(size(col("tk")) >= 2)
      .select(col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
      .select(element_at(col("tk"), col("i")).as("w1"),
        element_at(col("tk"), col("i") + 1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount && col("n_ab") > discount)
    bg.join(uni.select(col("w").as("w1"), col("n").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), "w2")
      .crossJoin(n_total)
      .withColumn("score_ppm",
        expr(s"((n_ab - $discount) * 1000000 div n_a) * n_tot div n_b"))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        col("score_ppm"))
      .orderBy(col("score_ppm").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Count-Min sketch cells (Cormode & Muthukrishnan 2005): `depth`
    * md5-derived hash rows × `width` buckets of token counts — the
    * constant-size, MERGEABLE frequency summary (cells of two corpus
    * halves simply add) whose point estimate never under-counts:
    * est(t) = min_j cells[j][h_j(t)] ≥ true count, with overshoot
    * ≤ N/width per row w.h.p. Complements [[heavyHitters]]'s
    * Misra-Gries (MG finds the heavy set; CMS answers point queries
    * for ANY token without a second scan). One groupBy over
    * depth×tokens rows into ≤ depth·width cells — nothing
    * vocabulary-sized anywhere. Returns (j, bucket, cnt). */
  def cmsBuild(df: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 256, salt: String = "cms"): DataFrame = {
    // depth ≤ 4: the rows slice ONE md5 digest (32 hex chars) into
    // disjoint 8-hex (32-bit) bucket values — one digest per token
    // instead of one per (token, row), 4× less hashing at any scale
    require(depth >= 1 && depth <= 4 && width >= 2,
      s"bad CMS shape ($depth×$width)")
    val toks = df
      .filter(length(trim(col(textCol))) > 0)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
    toks
      .select(md5(concat(lit(salt), lit(":"), col("token"))).as("dig"))
      .crossJoin(broadcast(
        df.sparkSession.range(depth).select(col("id").as("j"))))
      .select(col("j"),
        (expr("conv(substring(dig, j * 8 + 1, 8), 16, 10)").cast("long")
          % width).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CMS cells over a KEY column (no tokenization) — the sketch side
    * of join-size estimation. Same md5 row-slicing hash family as
    * [[cmsBuild]]; keys are hashed through their decimal string so any
    * engine reproduces the buckets. Returns (j, bucket, cnt). */
  def cmsKeyCells(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256, salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 4 && width >= 2,
      s"bad CMS shape ($depth×$width)")
    df.select(md5(concat(lit(salt), lit(":"),
        col(keyCol).cast("string"))).as("dig"))
      .crossJoin(broadcast(
        df.sparkSession.range(depth).select(col("id").as("j"))))
      .select(col("j"),
        (expr("conv(substring(dig, j * 8 + 1, 8), 16, 10)").cast("long")
          % width).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CM-sketch inner-product (join-size) estimate (Cormode &
    * Muthukrishnan 2005 §4.2): est = min_j Σ_b A_j[b]·B_j[b] ≥
    * |A ⋈_key B|, overshoot ≤ N_A·N_B/width per row w.h.p. The two
    * sketches MUST share depth/width/salt. This is the 100 TB
    * join-planning story: each relation's sketch is one map-side
    * pass (and mergeable across partitions/days), and the estimate
    * costs depth·width cell products — no key-space shuffle, no
    * sampling of either relation. Returns one row (est_join_size). */
  def cmsJoinSize(cellsA: DataFrame, cellsB: DataFrame): DataFrame =
    cellsA
      .join(cellsB.select(col("j"), col("bucket"),
        col("cnt").as("cnt_b")), Seq("j", "bucket"))
      .groupBy(col("j"))
      .agg(sum(col("cnt") * col("cnt_b")).as("dot"))
      .agg(min(col("dot")).as("est_join_size"))

  /** CMS point estimates for the given (token) rows against
    * [[cmsBuild]] cells: min over the depth rows. The parameters MUST
    * match the build call. Returns the input plus `est_cnt`. */
  def cmsEstimate(cells: DataFrame, tokens: DataFrame,
      tokenCol: String, depth: Int = 4, width: Int = 256,
      salt: String = "cms"): DataFrame = {
    val probes = tokens
      .withColumn("dig", md5(concat(lit(salt), lit(":"), col(tokenCol))))
      .crossJoin(broadcast(
        tokens.sparkSession.range(depth).select(col("id").as("j"))))
      .withColumn("bucket",
        expr("conv(substring(dig, j * 8 + 1, 8), 16, 10)").cast("long")
          % width)
    probes.join(cells, Seq("j", "bucket"))
      .groupBy(tokens.columns.map(col): _*)
      .agg(min(col("cnt")).as("est_cnt"))
  }

  /** Vocabulary-growth (Heaps'-law) curve: cumulative distinct token
    * types vs cumulative token count over an ingest order (doc-id
    * order), in `buckets` id-range buckets — the corpus diagnostic for
    * "is the vocabulary still growing, and at what exponent?" (Heaps
    * 1978; sub-linear growth is the expected shape, a flat curve means
    * heavy duplication, a linear one noise/ids).
    *
    * Shape at scale: a token's contribution to the curve is decided
    * entirely by its FIRST-occurrence doc — one vocabulary-sized
    * groupBy(min) — and per-bucket doc/token totals are one linear
    * groupBy. Cumulation happens on the ≤`buckets`-row table via a
    * triangular self-join (the q76 CDF idiom: no unpartitioned
    * window anywhere). Returns
    * (bucket, cum_docs, cum_tokens, cum_types) ordered by bucket.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 20): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val base = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("tk"))
    val bounds = base.agg(min(col("doc")).as("lo"), max(col("doc")).as("hi"))
    val b1 = buckets - 1
    def bucketOf(c: String): Column =
      expr(s"least(($c - lo) * $buckets div (hi - lo + 1), $b1)")
    val docStats = base
      .select(col("doc"), size(col("tk")).cast("long").as("n_toks"))
      .crossJoin(broadcast(bounds))
      .withColumn("bucket", bucketOf("doc"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val firstOcc = base
      .select(col("doc"), explode(array_distinct(col("tk"))).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc")).as("first_doc"))
      .crossJoin(broadcast(bounds))
      .withColumn("bucket", bucketOf("first_doc"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    val per = docStats.join(firstOcc, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
    per.as("a").join(per.as("b"), col("b.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("b.n_docs")).as("cum_docs"),
        sum(col("b.n_tokens")).as("cum_tokens"),
        sum(col("b.new_types")).as("cum_types"))
      .orderBy(col("bucket"))
  }

  // -------------------------------------------------------------------
  // HyperLogLog registers (shared by batch q208 and streaming q223).
  // Register building needs NO distinct and NO order: duplicate keys
  // produce the same rho, and max-merge is associative/commutative —
  // the two properties that make the sketch maintainable one
  // micro-batch at a time with 64 rows of state per group.
  // -------------------------------------------------------------------
  val HllM = 64
  /** alpha for m=64: 0.7213/(1 + 1.079/64) in ppm. */
  val HllAlphaPpm = 709440L

  /** (grpCols..., bucket, reg) partial HLL sketch of `keyCol` —
    * mergeable by register-wise MAX. */
  def hllRegisters(df: DataFrame, grpCols: Seq[String], keyCol: String)
      : DataFrame = {
    val hashed = df
      .withColumn("_h", conv(substring(md5(concat(lit("hll:"),
        col(keyCol).cast("string"))), 1, 15), 16, 10).cast("long"))
      .withColumn("bucket", pmod(col("_h"), lit(HllM.toLong)))
      // integral div — `/` would be double division and lose precision
      // above 2^53 on the 60-bit hash
      .withColumn("_rest", expr(s"_h div $HllM"))
      .withColumn("rho",
        lit(55) - length(ltrim(bin(col("_rest")), "0")))
    hashed.groupBy((grpCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** Raw HLL estimate per group from a (grpCols..., bucket, reg)
    * sketch: densify to all m registers, then αm²/Σ2^-reg as ONE
    * exact rational in DECIMAL(38) (no ln ⇒ no small-range
    * correction — deliberately the RAW estimator). */
  def hllEstimate(sketch: DataFrame, grpCols: Seq[String],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val spine = sketch.select(grpCols.map(col): _*).distinct()
      .crossJoin(broadcast(
        spark.range(HllM).select(col("id").as("bucket"))))
    val dense = spine.join(sketch, grpCols :+ "bucket", "left_outer")
      .select((grpCols.map(col) :+ col("bucket") :+
        coalesce(col("reg"), lit(0)).as("reg")): _*)
    dense.groupBy(grpCols.map(col): _*)
      .agg(sum(expr("shiftleft(cast(1 as bigint), 55 - reg)")).as("s"))
      .select((grpCols.map(col) :+
        expr(s"(cast($HllAlphaPpm as decimal(38,0)) * ${HllM * HllM} " +
          "* 36028797018963968) div (cast(s as decimal(38,0)) * 1000000)")
          .as("est_distinct")): _*)
  }
}
