package graft

import graft.queries.{SelectQueries, StatQueries, TrainPrepQueries}

/** Round-8 batch C: isotonic calibration (q322), Rice postings
  * planner (q323), epoch-shuffle decorrelation (q324) — each checked
  * against a naive single-threaded mirror over collected sf0.001
  * tables, plus the operator's own structural invariants.
  */
class Round8CSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q322 fitted curve is monotone and equals a reference PAVA") {
    val rows = StatQueries.q322_isotonic_calibration(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // monotone non-decreasing fit
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _           => ()
    }
    // counts reproduce the raw rate exactly
    rows.foreach { case (_, n, pos, raw, _) =>
      assert(raw === pos * 1000000L / n)
    }
    // classic stack-based PAVA in exact rationals (pos_a·n_b vs
    // pos_b·n_a cross-multiply — the unique isotonic fit); the
    // operator's minimax-over-floored-ppm must equal floor(fit · 1e6)
    // per block because floor commutes with min/max selection
    val perBucket = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stack = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int)] // pooled n, pooled pos, nBuckets
      rows.foreach { case (_, n, pos, _, _) =>
        stack += ((n, pos, 1))
        while (stack.length >= 2 && {
            val a = stack(stack.length - 2); val b = stack.last
            a._2 * b._1 > b._2 * a._1
          }) {
          val b = stack.remove(stack.length - 1)
          val a = stack.remove(stack.length - 1)
          stack += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      }
      stack.foreach { case (n, pos, nb) =>
        (1 to nb).foreach(_ => out += pos * 1000000L / n)
      }
      out.toList
    }
    assert(rows.map(_._5).toList === perBucket)
  }

  test("q323 chooses the arg-min Rice parameter per term") {
    // rebuild postings naively and check the chosen-k roll-up
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val postings = docs.flatMap { case (id, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      if (t.length < 2) Nil
      else t.sliding(2).map(_.mkString(" ")).toSeq.distinct
        .map(bg => (bg, id))
    }.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted).toMap
      .filter(_._2.length >= 2)
    def riceBits(gaps: Seq[Long], k: Int): Long =
      gaps.map(g => ((g - 1) >> k) + k + 1).sum
    def varintBytes(g: Long): Long =
      if (g < 128) 1 else if (g < 16384) 2 else if (g < 2097152) 3
      else if (g < 268435456L) 4 else if (g < 34359738368L) 5
      else if (g < 4398046511104L) 6 else 7
    val perTerm = postings.map { case (_, ids) =>
      val gaps = (ids.head + 1) +: ids.sliding(2).collect {
        case Array(a, b) => b - a
      }.toSeq
      val costs = (0 to 15).map(k => (riceBits(gaps, k), k))
      val (bits, k) = costs.min
      (k, ids.length.toLong, bits, gaps.map(varintBytes).sum)
    }.toSeq
    val want = perTerm.groupBy(_._1).map { case (k, g) =>
      (k.toLong, g.length.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.map(_._4).sum * 8, g.map(_._2).sum * 64)
    }.toSeq.sortBy(_._1)
    val got = SelectQueries.q323_rice_postings_planner(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got === want)
  }

  test("q324 epochs are bijective permutations that decorrelate") {
    val got = TrainPrepQueries.q324_epoch_shuffle_audit(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length === 3)
    val nDocs = Tables.documents(spark, sf).count()
    got.foreach { case (_, n, adj, disp) =>
      assert(n === nDocs)
      // adjacency retention under an independent re-shuffle is
      // hypergeometric with mean ≈ 1; allow a loose ceiling
      assert(adj <= 5, s"adjacency stuck: $adj of $n")
      // mean displacement within ±25% of the n²/3 expectation
      assert(disp > 750000L && disp < 1250000L,
        s"displacement ratio $disp ppm out of band")
    }
    // naive mirror of one pair's displacement sum
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    def rank(e: Int): Map[Long, Long] =
      ids.map(d => d -> graft.pipeline.Sampling
          .hash60Jvm(s"epoch$e", d))
        .sortBy { case (d, h) => (h, d) }
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1L) }.toMap
    val (r1, r2) = (rank(1), rank(2))
    val sd = ids.map(d => math.abs(r1(d) - r2(d))).sum
    val n = ids.length.toLong
    val wantDisp = BigInt(sd) * 3000000 / (BigInt(n) * n)
    val gotPair = got.find(_._1 == "epoch1->epoch2").get
    assert(gotPair._4 === wantDisp.toLong)
  }
}
