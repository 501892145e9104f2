package graft

import org.apache.spark.sql.functions._

/** Round-12 hardening pins:
  *  - the q262 REFINEMENT-FIXPOINT early exit (the tier that fires on
  *    corpora with exact duplicates, where dup_groups never reaches 0
  *    and the round-11 all-distinct exit could not trigger);
  *  - the q272 observe-based completable form (global butterfly total
  *    riding the TakeOrdered job as a CollectMetrics observation
  *    instead of an eager pair-sized localCheckpoint);
  *  - BENCH_FULL.json's window_suspect self-annotation and JVM-sizing
  *    stamp (round-11 verdict task 4 + advice item 4).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // q262 refinement fixpoint: two byte-identical documents keep
  // dup_groups = 3 at EVERY level (duplicated full suffixes never
  // disambiguate), but the partition freezes at k = 2 — distinct
  // classes stay at 3 — so levels 4+ must be exact copies of the
  // level-2 row. Hand profile: positions {(1,0),(2,0)},{(1,1),(2,1)},
  // {(1,2),(2,2)} give dup_positions 6 / dup_groups 3 / distinct 3 /
  // top group size 2 with lexicographically-first rep (1,0) at every
  // level ("a" sorts first at k=1; position order pins it after).
  // ------------------------------------------------------------------

  test("suffixDoublingProfile exact-duplicate corpus hits the " +
      "refinement fixpoint with dup_groups > 0 and replicates rows") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val prof = graft.pipeline.Dedup
      .suffixDoublingProfile(docs, "doc_id", "text", 3)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("dup_positions"),
        r.getAs[Long]("dup_groups"), r.getAs[Long]("distinct_groups"),
        r.getAs[Long]("top_group_size"), r.getAs[Long]("top_doc"),
        r.getAs[Long]("top_p"))).toSeq
    assert(prof === Seq(
      (1L, 6L, 3L, 3L, 2L, 1L, 0L),
      (2L, 6L, 3L, 3L, 2L, 1L, 0L),
      (4L, 6L, 3L, 3L, 2L, 1L, 0L),
      (8L, 6L, 3L, 3L, 2L, 1L, 0L)))
  }

  test("suffixDoublingProfile fixpoint replication preserves a " +
      "mixed dup/unique corpus profile past the convergence level") {
    // "x y x y" + "z w": the 2-token run "x y" repeats within doc 1,
    // everything else is unique. k=1: x{0,2}, y{1,3} dup; k=2: "x y"
    // at p0,p2 dup; k=4: p0 prefix "x y x y" vs p2 "x y" differ ->
    // all distinct -> dup exit; levels 8+ replicate.
    val docs = Seq((1L, "x y x y"), (2L, "z w")).toDF("doc_id", "text")
    val prof = graft.pipeline.Dedup
      .suffixDoublingProfile(docs, "doc_id", "text", 4)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("dup_positions"),
        r.getAs[Long]("dup_groups"), r.getAs[Long]("distinct_groups")))
      .toSeq
    assert(prof === Seq(
      (1L, 4L, 2L, 4L), (2L, 2L, 1L, 5L), (4L, 0L, 0L, 6L),
      (8L, 0L, 0L, 6L), (16L, 0L, 0L, 6L)))
  }

  // ------------------------------------------------------------------
  // q272 observe form: the returned frame is the bounded top-k with
  // the observed global total stamped on every row; the total must
  // equal the sum over ALL pairs, not just the returned 25.
  // (ScaleAlgoSpec pins the total against the naive quadruple count on
  // sf0.001; here the schema/stamping contract is pinned.)
  // ------------------------------------------------------------------

  test("q272 observe form: bounded rows, uniform total_bf equal to " +
      "the full pair-frame sum") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.ScaleQueries
      .q272_butterflies(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 25)
    assert(out.head.schema.fieldNames.toSeq ===
      Seq("p1", "p2", "codeg", "pair_bf", "total_bf"))
    val totals = out.map(_.getAs[Long]("total_bf")).distinct
    assert(totals.length === 1, "total_bf must be uniform across rows")
    // independent full-frame sum (the old checkpoint-based shape)
    val e = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_partkey").as("p")), Seq("o_orderkey"))
      .select(col("c"), col("p")).distinct()
    val full = e.as("a")
      .join(e.as("b"),
        col("a.c") === col("b.c") && col("a.p") < col("b.p"))
      .groupBy(col("a.p"), col("b.p")).agg(count(lit(1)).as("codeg"))
      .agg(sum(expr("codeg * (codeg - 1) div 2"))).head().getLong(0)
    assert(totals.head === full)
  }

  // ------------------------------------------------------------------
  // BENCH_FULL self-annotation (round-11 verdict task 4 + advice #4)
  // ------------------------------------------------------------------

  test("renderFullJson stamps jvm sizing and flags window-struck " +
      "queries (cold > 4x warm AND excess > 2 s)") {
    import org.json4s._
    val results = Seq(
      ("q_struck", 9.000, 1.000),   // 9x ratio, 8 s excess -> flagged
      ("q_ratio_only", 0.900, 0.100), // 9x ratio, 0.8 s excess -> no
      ("q_excess_only", 8.000, 4.000), // 2x ratio, 4 s excess -> no
      ("q_fine", 0.400, 0.300))
    val full = org.json4s.jackson.JsonMethods.parse(
      Bench.renderFullJson(results, Nil, "/root/testdata/sf0.1"))
    val JArray(sus) = (full \ "window_suspect"): @unchecked
    assert(sus === List(JString("q_struck")))
    assert((full \ "jvm" \ "codecache") ===
      JString(sys.env.getOrElse("SPARK_CODECACHE", "1g")))
    assert((full \ "jvm" \ "driver_mem") ===
      JString(sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")))
  }
}
