package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * All decisions are pure functions of a row's id hash — no RNG state,
  * no `rand()` — so a sample is (a) reproducible across runs, engines,
  * and cluster topologies, (b) stable under re-partitioning, and (c)
  * consistent between pipeline stages (the same doc is in-sample
  * everywhere). That's the property a 100 TB curation pipeline needs:
  * `rand()`-sampling changes membership on every retry/re-run, breaking
  * incremental rebuilds and train/test hygiene.
  *
  * The hash family is the engine-portable 60-bit md5 prefix used across
  * this codebase (`conv(substr(md5(x),1,15),16,10)`); a `salt` prefix
  * decorrelates independent decisions drawn from the same id space
  * (sample membership vs split assignment must be independent bits).
  *
  * Scale shape: both operators are stateless row-local projections —
  * no shuffle, no aggregation; they run at scan speed and compose with
  * pushed filters.
  */
object Sampling {

  /** 60-bit engine-portable hash of (salt ":" id). */
  def hash60(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), lit(":"),
      id.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Driver-side JVM mirror of [[hash60]] — for building DATA-
    * INDEPENDENT broadcast literals (e.g. a consistent-hash ring's
    * vnode positions) that both engines re-derive identically. */
  def hash60Jvm(salt: String, id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$id".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB mirror of [[hash60]] — kept NEXT to the Scala formula so
    * the two sides cannot drift (every oracle that samples/hashes
    * interpolates this one string). */
  def hash60Sql(salt: String, idExpr: String): String =
    s"CAST(('0x' || substr(md5('$salt:' || CAST($idExpr AS VARCHAR)), " +
      "1, 15)) AS BIGINT)"

  /** Keep a row iff hash(salt:id) mod 1e6 < ratePpm(stratum) — per-
    * stratum Bernoulli sampling with deterministic membership. Strata
    * missing from `ratesPpm` use `defaultPpm`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      ratesPpm: Map[String, Long], defaultPpm: Long,
      salt: String = "sample"): DataFrame = {
    val rate = ratesPpm.foldLeft(lit(defaultPpm)) {
      case (acc, (stratum, ppm)) =>
        when(col(stratumCol) === stratum, lit(ppm)).otherwise(acc)
    }
    df.filter(hash60(salt, col(idCol)) % 1000000L < rate)
  }

  /** Exactly-k-per-stratum sampling: rank rows within each stratum by
    * their id hash (a deterministic uniform shuffle) and keep the
    * first k — fixed-quota selection (eval-set construction) where
    * rate-based sampling ([[stratifiedSample]]) would only hit k in
    * expectation. One window shuffle on the stratum key. */
  def exactQuotaSample(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, salt: String = "quota"): DataFrame = {
    require(k > 0, s"quota k must be positive ($k)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hash60(salt, col(idCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Train/validation/test assignment by hash bucket: bucket = hash
    * mod 100; < trainPct → "train", < trainPct+valPct → "val", else
    * "test". Adds `split`. Deterministic and independent of any
    * sampling decision drawn with a different salt. */
  def splitAssign(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10, salt: String = "split"): DataFrame =
    splitByKey(df, col(idCol), trainPct, valPct, salt)

  /** [[splitAssign]] generalized to an arbitrary assignment KEY: every
    * row with the same key value lands on the same side. Hashing a
    * CLUSTER key instead of the row id is what makes a split
    * LEAKAGE-FREE: when near/exact duplicates exist, splitting by row
    * id scatters copies of the same content across train and val, and
    * the eval set silently measures memorization (the contamination
    * mechanism Lee et al. 2022 §6 measure). Pass md5(text) for
    * exact-dup integrity, or a connected-component id from
    * [[graft.pipeline.Clusters]] for near-dup integrity. Adds `split`;
    * one projection, zero shuffles. */
  def splitByKey(df: DataFrame, key: Column, trainPct: Int = 80,
      valPct: Int = 10, salt: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages ($trainPct, $valPct)")
    val bucket = hash60(salt, key) % 100L
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Weighted priority sampling (Duffield/Lund/Thorup shape): rank
    * rows within each stratum by `hash60 div weight` ascending — a
    * row's selection odds scale with its weight, yet membership stays
    * a pure function of the id hash (no RNG). Integer floor division
    * keeps the priority engine-portable where the textbook
    * u^(1/w) float form would not be. Keep the k smallest priorities
    * per stratum. One window shuffle on the stratum key; the
    * per-partition top-k (WindowGroupLimit) trims before the shuffle.
    *
    * Returns the input plus `priority` and `rank` (1-based by
    * (priority, id)). Rows with weight ≤ 0 are excluded (they would
    * divide to infinity — a zero-weight row is definitionally never
    * sampled). */
  def weightedPrioritySample(df: DataFrame, idCol: String,
      stratumCol: String, weightCol: String, k: Int,
      salt: String = "wsample"): DataFrame = {
    require(k > 0, s"sample size k must be positive ($k)")
    // `priority`/`rank` are documented OUTPUT columns — refuse rather
    // than silently overwrite same-named input columns
    require(!df.columns.contains("priority") && !df.columns.contains("rank"),
      "input already has a priority/rank column; rename it first")
    // collision-safe temp name + backtick-quoted identifiers EVERYWHERE
    // a user-supplied name is parsed: bare col("a.b") reads ".b" as a
    // struct field, and an unquoted name inside expr() breaks the
    // integer-div expression
    val tmpH = Iterator.from(0).map(i => s"_h$i")
      .find(c => !df.columns.contains(c)).get
    def quoted(c: String): String = "`" + c.replace("`", "``") + "`"
    def qcol(c: String): Column = col(quoted(c))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qcol(stratumCol))
      .orderBy(col("priority"), qcol(idCol))
    df.filter(qcol(weightCol) > 0)
      .withColumn(tmpH, hash60(salt, qcol(idCol)))
      .withColumn("priority",
        expr(s"${quoted(tmpH)} div ${quoted(weightCol)}"))
      .drop(tmpH)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Token-weighted mixture rebalancing: given a target token budget
    * per stratum (source/domain), derive the per-stratum Bernoulli
    * keep-rate `rate_ppm = min(1e6, target·1e6 div stratum_tokens)`
    * and the deterministic per-row keep decision. This is the "data
    * mixture" step of a pretraining pipeline — down-sampling
    * over-represented sources to hit prescribed token proportions —
    * expressed so the achieved mixture is reproducible run-to-run.
    *
    * `weightCol` is the row's token count. Adds `rate_ppm` and `kept`
    * (0/1). Shape: one aggregation over the (few) strata joined back
    * broadcast — the per-row decision stays row-local, so the pass is
    * scan-speed at 100 TB with no repartitioning of the corpus.
    */
  def tokenMixtureSample(df: DataFrame, idCol: String,
      stratumCol: String, weightCol: String,
      targetTokens: Map[String, Long], defaultTarget: Long,
      salt: String = "mix"): DataFrame = {
    val target = targetTokens.foldLeft(lit(defaultTarget)) {
      case (acc, (stratum, t)) =>
        when(col(stratumCol) === stratum, lit(t)).otherwise(acc)
    }
    // a zero/null-weight stratum divides to null and least() skips it →
    // rate 1e6 (keep-all): nothing to down-sample is the right answer
    val totalsWithTarget = df.groupBy(col(stratumCol))
      .agg(sum(col(weightCol)).cast("long").as("_total"))
      .withColumn("_target", target)
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(_target * 1000000) div _total")))
      .select(col(stratumCol).as("_stratum"), col("rate_ppm"))
    // null-safe join: a null stratum is a stratum (it aggregates to a
    // null-key group above) — a plain equi-join would silently drop
    // those rows, unlike sibling stratifiedSample which keeps them
    df.join(broadcast(totalsWithTarget),
        col(stratumCol) <=> col("_stratum"))
      .drop("_stratum")
      .withColumn("kept",
        when(hash60(salt, col(idCol)) % 1000000L < col("rate_ppm"), 1)
          .otherwise(0))
  }

  /** Temperature-scaled source mixture (the α-sampling of multilingual
    * pretraining, Conneau & Lample 2019 / XLM-R: sample source s with
    * probability ∝ mass_s^α, α ∈ (0,1) flattening the head and boosting
    * the tail). α is fixed at 1/2 and the weight is computed as the
    * INTEGER sqrt — floor(sqrt(tokens)) — so every derived number is
    * integer-exact and any engine reproduces it bit-for-bit (double
    * sqrt is correctly rounded per IEEE-754, and floor only straddles a
    * representability boundary at perfect squares, where sqrt is exact).
    *
    * Input: one row per item with (stratumCol, weightCol). Output: one
    * row per stratum with its token mass, the natural share_ppm, the
    * temperature-scaled mix_ppm, and boost_x1000 = mix/share scaled by
    * 1000 (integer) — > 1000 means the source is up-weighted.
    *
    * Shape: one groupBy to stratum granularity, then all arithmetic on
    * the tiny stratum table (a broadcast total, no second pass over the
    * corpus) — scan-speed at 100 TB.
    */
  def temperatureMixture(df: DataFrame, stratumCol: String,
      weightCol: String): DataFrame = {
    val mass = df.groupBy(col(stratumCol))
      .agg(sum(col(weightCol)).cast("long").as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens"))).cast("long"))
    val tot = mass.agg(sum(col("n_tokens")).as("_tt"),
      sum(col("w")).as("_tw"))
    mass.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n_tokens"),
        expr("(n_tokens * 1000000) div _tt").as("share_ppm"),
        expr("(w * 1000000) div _tw").as("mix_ppm"))
      .withColumn("boost_x1000",
        expr("(mix_ppm * 1000) div share_ppm"))
  }
}
