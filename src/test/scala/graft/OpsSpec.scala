package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Cdf, Driver, Rank}

/** Property specs for the consolidated iterative/rank/CDF/driver-fold
  * library (graft.ops) — each helper against the naive single-node
  * definition it distributes.
  */
class OpsSpec extends SparkSpec {

  private def mixed() = {
    import spark.implicits._
    // deterministic scramble with duplicates in the payload column
    (1L to 500L).map(i => ((i * 7919L) % 1000L, i, s"p${i % 13}"))
      .toDF("key", "id", "payload")
  }

  // ---- Rank.globalOrdinal ---------------------------------------------

  test("globalOrdinal equals row_number over the total sort order " +
      "and preserves every column") {
    val df = mixed()
    val got = Rank.globalOrdinal(df, "rn", 8, col("key"), col("id"))
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(col("key"), col("id")))
        .cast("long"))
    assert(got.schema.fieldNames.toSeq ===
      Seq("key", "id", "payload", "rn"))
    assert(got.orderBy("rn").collect().toSeq ===
      want.orderBy("rn").collect().toSeq)
    val rns = got.select("rn").collect().map(_.getLong(0)).sorted
    assert(rns.toSeq === (1L to 500L).toSeq)
  }

  test("globalOrdinal is stable under partition-count choice when " +
      "the sort key is total") {
    val df = mixed()
    val a = Rank.globalOrdinal(df, "rn", 3, col("key"), col("id"))
    val b = Rank.globalOrdinal(df, "rn", 17, col("key"), col("id"))
    assert(a.orderBy("rn").collect().toSeq ===
      b.orderBy("rn").collect().toSeq)
  }

  // ---- Cdf.prefixSum --------------------------------------------------

  private def countTable() = {
    import spark.implicits._
    // one row per (group, value): a value-keyed count table
    (for (g <- Seq("a", "b"); v <- 0L until 200L)
      yield (g, v, (v * 31 + g.length) % 7 + 1)).toDF("g", "v", "c")
      .withColumn("bucket", expr("v div 16"))
  }

  test("prefixSum (exclusive and inclusive) equals the naive per-" +
      "group running sum") {
    val df = countTable()
    val rows = df.select("g", "v", "c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def naive(g: String, v: Long, incl: Boolean): Long =
      rows.filter(t => t._1 == g &&
        (t._2 < v || (incl && t._2 == v))).map(_._3).sum
    for (incl <- Seq(false, true)) {
      val got = Cdf.prefixSum(df, Seq("g"), "bucket", "v", "c", "cum",
          inclusive = incl)
        .select("g", "v", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.length === rows.length)
      got.foreach { case (g, v, cum) =>
        assert(cum === naive(g, v, incl), s"($g, $v, incl=$incl)")
      }
    }
  }

  test("prefixSum with no group columns computes the global CDF") {
    import spark.implicits._
    val df = (0L until 100L).map(v => (v, v % 5 + 1))
      .toDF("v", "c").withColumn("bucket", expr("v div 8"))
    val got = Cdf.prefixSum(df, Seq.empty, "bucket", "v", "c", "cum",
        inclusive = true)
      .orderBy("v").select("cum").collect().map(_.getLong(0))
    val want = (0L until 100L).scanLeft(0L)((acc, v) => acc + v % 5 + 1)
      .drop(1)
    assert(got.toSeq === want.toSeq)
  }

  // ---- Driver.boundedCollect ------------------------------------------

  test("boundedCollect returns sorted rows within the bound and " +
      "fails loudly past it") {
    val df = mixed().groupBy("payload").agg(count(lit(1)).as("n"))
      .orderBy("payload")
    val rows = Driver.boundedCollect(df, 13, "opspec")
    assert(rows.length === 13)
    assert(rows.map(_.getString(0)).toSeq ===
      rows.map(_.getString(0)).toSeq.sorted)
    val e = intercept[IllegalArgumentException] {
      Driver.boundedCollect(mixed(), 100, "opspec-unbounded")
    }
    assert(e.getMessage.contains("opspec-unbounded"))
    assert(e.getMessage.contains("bound exceeded"))
  }
}
