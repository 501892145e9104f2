package graft

import org.apache.spark.sql.functions._

import graft.queries.PlannerQueries

/** Property tests for the planner/placement/storage-audit tier — the
  * oracle gate pins outputs; these pin the algorithmic guarantees.
  */
class PlannerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ----------------------------------------------------------------
  // q283 — Neyman allocation: budget respected, quotas filled,
  // allocation monotone in N_h·S_h
  // ----------------------------------------------------------------

  test("Neyman allocation stays within budget, fills its quotas, and " +
      "is monotone in stratum weight") {
    val rows = PlannerQueries.q283_neyman_allocation(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("alloc")).sum
    assert(total <= 100 && total >= 100 - rows.length,
      s"floor allocation total $total out of [${100 - rows.length},100]")
    rows.foreach { r =>
      val quota = math.min(r.getAs[Long]("alloc"), r.getAs[Long]("nh"))
      assert(r.getAs[Long]("n_sampled") === quota,
        s"stratum ${r.getString(0)}: quota not filled")
    }
    val byW = rows.sortBy(r => r.getAs[Long]("nh") * r.getAs[Long]("sd"))
    assert(byW.map(_.getAs[Long]("alloc")).sliding(2)
      .forall(p => p.length < 2 || p.head <= p.last),
      "allocation not monotone in N_h*S_h")
  }

  test("the isqrt SQL expression is exact around squares") {
    val probes = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 17L,
      999999L, 1000000L, 1000001L, 4503599627370495L)
    import spark.implicits._
    val got = probes.toDF("varx")
      .selectExpr("varx", PlannerQueries.isqrtSql("varx") + " AS s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { v =>
      val want = BigInt(v).bigInteger.sqrt().longValueExact()
      assert(got(v) === want, s"isqrt($v)")
    }
  }

  // ----------------------------------------------------------------
  // q284 — the HRW minimal-movement guarantee
  // ----------------------------------------------------------------

  test("removing one HRW shard moves exactly its documents and " +
      "nothing else") {
    val rows = PlannerQueries.q284_rendezvous_hashing(spark, sf)
      .collect().map(r => (r.getAs[Long]("shard"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_after"),
        r.getAs[Long]("moved_in")))
    val removedDocs = rows.find(_._1 == 7L).get._2
    assert(rows.find(_._1 == 7L).get._3 === 0L, "removed shard not empty")
    assert(rows.map(_._4).sum === removedDocs,
      "moved total != removed shard's documents")
    rows.filter(_._1 != 7L).foreach { case (s, before, after, moved) =>
      assert(after === before + moved,
        s"shard $s: n_after != n_docs + moved_in")
    }
    val totalDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === totalDocs)
  }

  // ----------------------------------------------------------------
  // q285 — audit math is internally consistent
  // ----------------------------------------------------------------

  test("histogram selectivity actuals are monotone and err_ppm is the " +
      "stated formula") {
    val rows = PlannerQueries.q285_histogram_selectivity(spark, sf)
      .collect().sortBy(_.getAs[Long]("j"))
    assert(rows.length === 9)
    assert(rows.map(_.getAs[Long]("actual_rows")).sliding(2)
      .forall(p => p.length < 2 || p.head <= p.last))
    rows.foreach { r =>
      val (e, a) = (r.getAs[Long]("est_rows"), r.getAs[Long]("actual_rows"))
      assert(r.getAs[Long]("err_ppm") ===
        math.abs(e - a) * 1000000L / math.max(a, 1L))
    }
  }

  // ----------------------------------------------------------------
  // q286 — both join orders end at the same result
  // ----------------------------------------------------------------

  test("join orders agree on the final cardinality and report " +
      "positive estimates") {
    val rows = PlannerQueries.q286_join_order_audit(spark, sf).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("final_rows")).distinct.length === 1)
    rows.foreach(r => assert(r.getAs[Long]("inter_est") > 0))
  }

  // ----------------------------------------------------------------
  // q289 — the distributed prefix-sum agrees with the naive window
  // and the packing conserves tokens
  // ----------------------------------------------------------------

  test("sequence packing conserves tokens and matches a naive " +
      "single-window cumsum") {
    import graft.pipeline.TextAnalysis
    val out = PlannerQueries.q289_sequence_packing(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_crossing") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("max_span") >= 0L)
    }
    val tk = Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .filter(col("n") > 0)
    assert(out.map(_.getAs[Long]("tok_sum")).sum ===
      tk.agg(sum(col("n"))).head().getLong(0))
    // naive global-window mirror of the distributed prefix sum
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val naive = tk.withColumn("cum", sum(col("n")).over(wAll))
      .withColumn("g", expr("((cum - n) div 512) div 64"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr("(cum - 1) div 512 > (cum - n) div 512"), 1L)
          .otherwise(0L)).as("n_crossing"))
      .collect()
      .map(r => r.getAs[Long]("g") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_crossing"))).toMap
    out.foreach { r =>
      assert(naive(r.getAs[Long]("g")) ===
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_crossing")),
        s"group ${r.getAs[Long]("g")} disagrees with the naive cumsum")
    }
  }

  // ----------------------------------------------------------------
  // q290 — the salt plan kills the straggler
  // ----------------------------------------------------------------

  test("skew split plan bounds every post-split slice by the target " +
      "and actually splits something") {
    val rows = PlannerQueries.q290_skew_split_plan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_slice") <= r.getAs[Long]("t_target"),
        s"${r.getString(0)}: slice exceeds target")
      assert((r.getAs[Long]("salt_factor") > 1) ===
        (r.getAs[Long]("is_split") == 1L))
    }
    assert(rows.exists(_.getAs[Long]("is_split") == 1L),
      "event_type histogram should contain at least one hot key")
  }

  // ----------------------------------------------------------------
  // q287 — container accounting adds up and never loses to raw
  // ----------------------------------------------------------------

  test("roaring containers partition into array+bitmap and always " +
      "beat the raw 8B encoding") {
    val rows = PlannerQueries.q287_roaring_audit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_array") + r.getAs[Long]("n_bitmap") ===
        r.getAs[Long]("n_containers"))
      assert(r.getAs[Long]("roaring_bytes") < r.getAs[Long]("raw_bytes"),
        "array<=card bytes and bitmap=32<=8*card for card>32: roaring " +
          "must win")
    }
  }
}
