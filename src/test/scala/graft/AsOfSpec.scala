package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward: latest right row at-or-before, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 50L, 900L))
      .toDF("k", "t", "pay")
    val out = AsOf.asofBackward(left, right, "k", "t", "pay")
      .collect().map(r => (r.getAs[String]("tag"),
        Option(r.getAs[Any]("pay")))).toMap
    assert(out("a") === Some(100L)) // tie: right at equal time matches
    assert(out("b") === Some(200L)) // latest of two priors
    assert(out("c") === None)       // no prior → null (outer form)
  }

  test("asofBackward ignores right rows with a NULL time") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, Option.empty[Long], 999L),
      (1L, Some(5L), 100L)).toDF("k", "t", "pay")
    val out = AsOf.asofBackward(left, right, "k", "t", "pay").collect()
    // without the filter the null-time row sorts first (nulls-first)
    // and 999 would win for rows before t=5
    assert(out.map(_.getAs[Long]("pay")).toSeq === Seq(100L))
  }

  test("asofBackward equals the naive per-row argmax on random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
    val right = (1 to 200).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, 1000L + i))
    val lDf = left.toDF("k", "t", "lid")
    val rDf = right.toDF("k", "t", "pay")
    val got = AsOf.asofBackward(lDf, rDf, "k", "t", "pay")
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[Any]("pay")).map(_.asInstanceOf[Long])).toMap
    // naive oracle: max payload among right rows at the max qualifying
    // time (mirrors the window tie-break)
    val expected = left.map { case (k, t, lid) =>
      val cand = right.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cand.isEmpty) None else {
        val tm = cand.map(_._2).max
        Some(cand.filter(_._2 == tm).map(_._3).max)
      })
    }.toMap
    assert(got === expected)
  }

  test("asofBackward ties at identical (key,time) pick max payload") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L)).toDF("k", "t", "pay")
    val out = AsOf.asofBackward(left, right, "k", "t", "pay").collect()
    assert(out.head.getAs[Long]("pay") === 9L)
  }
}
