package graft

import graft.queries.AugmentQueries
import graft.pipeline.{MediaCodecs, Sampling}

/** q205–q207 augmentation/forensics operators: mirrors and structural
  * properties over sf0.001. */
class AugmentSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q205 finds every same-base variant pair and only near pairs") {
    val rows = AugmentQueries.q205_image_phash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, sf).count()
    val bases = (0L until nDocs).groupBy(_ / 4).values
      .filter(_.length > 1)
    val expectedSameBase = bases.map(g => g.length * (g.length - 1) / 2).sum
    val sameBase = rows.filter { case (a, b, _) => a / 4 == b / 4 }
    assert(sameBase.length === expectedSameBase,
      s"every 1-pixel variant pair must survive the hamming cut")
    assert(rows.forall(_._3 <= 2))
    assert(rows.forall { case (a, b, _) => a < b })
  }

  test("q205 aHash bands match a direct closed-form computation") {
    // bypass the codec: hash the synthesized pixels directly; the query
    // hashes the PNG round-trip — equality proves decode is lossless
    val (w, h, rgb) = AugmentQueries.synthPixels(7L)
    val direct = AugmentQueries.aHashBands(MediaCodecs.BmpImage(w, h, rgb))
    val png = MediaCodecs.encodePng(MediaCodecs.BmpImage(w, h, rgb))
    val decoded = MediaCodecs.decodeImage(png).get
    assert(AugmentQueries.aHashBands(decoded).toSeq === direct.toSeq)
    assert(direct.length === 4)
    assert(direct.forall(b => b >= 0 && b <= 65535),
      "each band holds 16 bits")
  }

  test("q206 span corruption matches a naive mirror exactly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hash60(salt: String, id: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val want = docs.map { case (id, text) =>
      val toks =
        if (text.trim.isEmpty) Array.empty[String]
        else text.trim.split("\\s+")
      val corrupt = toks.indices
        .map(i => hash60("span", s"$id|$i") % 100 < 15)
      // group consecutive corrupted positions into spans
      val spans = scala.collection.mutable.ArrayBuffer.empty[List[Int]]
      var cur = List.empty[Int]
      toks.indices.foreach { i =>
        if (corrupt(i)) cur = cur :+ i
        else if (cur.nonEmpty) { spans += cur; cur = Nil }
      }
      if (cur.nonEmpty) spans += cur
      val spanOf = spans.zipWithIndex
        .flatMap { case (s, idx) => s.map(_ -> idx) }.toMap
      val input = toks.indices.flatMap { i =>
        if (!corrupt(i)) Some(toks(i))
        else if (spans(spanOf(i)).head == i) Some(s"<X_${spanOf(i)}>")
        else None
      }.mkString(" ")
      val target = spans.zipWithIndex.flatMap { case (s, idx) =>
        s"<X_$idx>" +: s.map(toks(_))
      }.mkString(" ")
      (id, input, target, spans.length.toLong)
    }.sortBy(_._1)
    val got = AugmentQueries.q206_span_corruption(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq === want.toSeq)
    // sanity: corruption actually fired somewhere in the corpus
    assert(got.exists(_._4 > 0))
  }

  test("q207 Benford digits match a naive mirror exactly") {
    val vs = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong)
      .filter(_ > 0)
    val total = vs.length.toLong
    val byDigit = vs.groupBy(_.toString.head.asDigit)
      .view.mapValues(_.length.toLong).toMap
    val exp = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
    val got = AugmentQueries.q207_benford_audit(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length === 9)
    got.foreach { case (d, n, obs, e, dev) =>
      val wantN = byDigit.getOrElse(d, 0L)
      assert(n === wantN, s"digit $d count")
      assert(obs === wantN * 1000000L / total)
      assert(e === exp(d))
      assert(dev === math.abs(obs - e))
    }
  }
}
