package graft

import graft.queries.TrainPrepQueries

/** q214–q216: batch packing, time-weighted average, AUC — against
  * naive mirrors over collected sf0.001 tables. */
class TrainPrepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q214 padding waste matches a naive mirror; sorting never hurts") {
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map { r =>
        val t = r.getString(2).trim
        val n = if (t.isEmpty) 0L else t.split("\\s+").length.toLong
        (r.getString(0), r.getLong(1), n)
      }
    def waste(sorted: Boolean): (Long, Long, Long, Long) = {
      val batches = docs.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
        val ordered =
          if (sorted) ds.sortBy(d => (d._3, d._2)) else ds.sortBy(_._2)
        ordered.grouped(8).toSeq
      }
      val useful = batches.map(_.map(_._3).sum).sum
      val padded = batches.map(b => b.map(_._3).max * b.length -
        b.map(_._3).sum).sum
      (batches.length.toLong, useful, padded,
        padded * 1000000L / (useful + padded))
    }
    val want = Map("arrival" -> waste(sorted = false),
      "length_sorted" -> waste(sorted = true))
    val got = TrainPrepQueries.q214_length_batching(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
    assert(got("length_sorted")._3 <= got("arrival")._3,
      "length-sorted packing can only reduce padding")
  }

  test("q215 time-weighted averages match a naive mirror exactly") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id",
        "cast(floor(value * 100 + 0.5) as long)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val s = es.sortBy(e => (e._2, e._3))
      val iv = s.zip(s.tail).map { case (a, b) =>
        (a._4, (b._2 - a._2) / 1000000000L)
      }.filter(_._2 > 0)
      if (iv.isEmpty) None
      else Some((u, iv.length.toLong, iv.map(_._2).sum,
        iv.map(x => x._1 * x._2).sum / iv.map(_._2).sum))
    }.sortBy(x => (-x._4, x._1)).take(20)
    val got = TrainPrepQueries.q215_time_weighted_avg(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
  }

  test("q216 AUC matches a naive pairwise computation exactly") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type = 'purchase'",
        "cast(floor(value * 100 + 0.5) as long)").collect()
      .map(r => (r.getBoolean(0), r.getLong(1)))
    val pos = ev.filter(_._1).map(_._2)
    val neg = ev.filterNot(_._1).map(_._2)
    // direct definition: P(pos > neg) + P(tie)/2 over all pairs,
    // doubled to stay integral
    var wins2 = 0L
    pos.foreach { p =>
      neg.foreach { n =>
        if (p > n) wins2 += 2 else if (p == n) wins2 += 1
      }
    }
    val wantPpm = wins2 * 500000L / (pos.length.toLong * neg.length)
    val row = TrainPrepQueries.q216_auc_mannwhitney(spark, sf).collect()(0)
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    assert(row.getLong(2) === wantPpm,
      "rank-sum AUC must equal the pairwise definition")
  }
}
