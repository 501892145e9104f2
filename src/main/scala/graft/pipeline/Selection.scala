package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed-n-gram features are under the target-domain distribution
  * than under the raw-corpus distribution, then keep the top slice —
  * the published recipe for "select web data that looks like my
  * high-quality domain" without training a model.
  *
  * Published shape, kept: hashed word-bigram features (the paper's
  * bag-of-hashed-ngrams), two add-one-smoothed unigram-over-buckets
  * distributions fit from the corpus itself (target subset vs all
  * rows), per-document importance weight from the per-feature
  * likelihood ratios, selection by weight.
  *
  * Deliberate deviation, documented: the paper scores log p_t − log
  * p_r summed over features. `ln()` is banned in this codebase (its
  * last-bit behavior differs across engines — see
  * CurationQueries.scala TF-IDF note), so the score is the
  * integer-exact MEAN per-feature likelihood ratio in micro-units:
  *   λ_b = ((ct_b+1)·(R+B)·10⁶) div ((cr_b+1)·(T+B))
  *   score(doc) = (Σ_occurrences λ_bucket) div n_bigrams
  * Same features, same smoothing, same "target-like ranks first"
  * ordering signal; every step is 64-bit integer arithmetic that is
  * bit-identical across engines, partitionings, and re-runs. Since the
  * target rows are a subset of the raw rows, ct_b ≤ cr_b bucket-wise,
  * so λ_b ≤ 10⁶·(R+B)/(T+B) — bounded by the inverse target share.
  *
  * Scale shape: exactly two corpus passes, the same as the paper's
  * fit-then-score. The bigram rows are materialized once
  * (`localCheckpoint`) and feed both passes; the fit is one groupBy
  * over ≤ `buckets` keys; λ is a `buckets`-row broadcast joined back
  * at scan speed; the per-doc score is one aggregation on the id key.
  * Nothing anywhere is vocabulary-sized. At trillion-bigram scale the
  * fit pass can run on a hash-sample of the corpus (the distributions
  * it estimates are per-bucket frequencies, robust to sampling) and
  * the λ intermediate product (ct+1)·(R+B)·10⁶ should widen to
  * DECIMAL/HUGEINT on both engines; at ≤ ~10¹² bigram occurrences it
  * fits i64 as written.
  */
object Selection {

  /** Per-document DSIR importance scores (see object doc for the
    * integer-exact scoring formula). `isTarget` marks the target-domain
    * subset (must be a deterministic predicate over the row). Documents
    * with fewer than 2 tokens carry no bigram feature and are dropped.
    *
    * Returns (id, is_target, n_bigrams, mean_ratio_micro).
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024,
      salt: String = "dsir"): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    val base = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), isTarget.cast("long").as("is_target"),
        TextAnalysis.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
    // one bigram-occurrence row per adjacent token pair, bucketed by
    // the engine-portable 60-bit hash; materialized once for both the
    // fit pass and the score pass
    val occ = base.select(col(idCol), col("is_target"),
        explode(expr("transform(sequence(0, size(tk)-2), " +
          "i -> concat(element_at(tk, i+1), ' ', element_at(tk, i+2)))"))
          .as("bg"))
      .withColumn("bucket", Sampling.hash60(salt, col("bg")) % buckets)
      .drop("bg")
      .localCheckpoint(eager = true)
    // fit: per-bucket occurrence counts under raw (cr) and target (ct)
    val cnt = occ.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"), sum(col("is_target")).as("ct"))
    val tot = cnt.agg(sum(col("cr")).as("r_tot"), sum(col("ct")).as("t_tot"))
    val lam = cnt.crossJoin(broadcast(tot))
      .select(col("bucket"),
        expr(s"((ct + 1L) * (r_tot + ${buckets}L) * 1000000L) div " +
          s"((cr + 1L) * (t_tot + ${buckets}L))").as("lam"))
    // score: mean per-feature likelihood ratio, integer micro-units
    occ.join(broadcast(lam), "bucket")
      .groupBy(col(idCol))
      .agg(max(col("is_target")).as("is_target"),
        count(lit(1)).as("n_bigrams"),
        sum(col("lam")).as("s"))
      .select(col(idCol), col("is_target"), col("n_bigrams"),
        expr("s div n_bigrams").as("mean_ratio_micro"))
  }

  /** DSIR selection: the `keep` highest-scoring documents by
    * (mean_ratio_micro desc, id) — a global top-k (TakeOrdered), never
    * a full sort. */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, keep: Int, buckets: Int = 1024,
      salt: String = "dsir"): DataFrame =
    dsirScores(df, idCol, textCol, isTarget, buckets, salt)
      .orderBy(col("mean_ratio_micro").desc, col(idCol))
      .limit(keep)
}
