package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Gen.Parameters
import org.scalacheck.rng.Seed

import graft.ops.AsOf
import graft.pipeline.{Dedup, Frequency, Similarity, TextAnalysis}

/** Property-based checks for the operators whose correctness rests on a
  * non-obvious equivalence: each is compared against a naive reference
  * implementation (or analytic bound) on generated inputs. Fixed-seed
  * raw ScalaCheck (no scalatestplus bridge in the offline cache);
  * datasets stay small so each property runs a handful of Spark jobs,
  * not hundreds.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed0: Long, n: Int): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).map { _ =>
      val v = g.pureApply(Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  test("asofBackward matches the naive per-row maximum-at-or-before") {
    val leftGen = for {
      k <- Gen.choose(0, 3); t <- Gen.choose(0L, 50L)
    } yield (k.toString, t)
    val rightGen = for {
      k <- Gen.choose(0, 3); t <- Gen.choose(0L, 50L)
      p <- Gen.choose(100L, 999L)
    } yield (k.toString, t, p)
    val left = sample(leftGen, 7L, 60)
    val right = sample(rightGen, 11L, 40)
      // mirror the operator's documented tie rule (max payload per
      // (key, time)) exactly in the naive model by pre-deduping
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val out = AsOf.asofBackward(
        left.toDF("key", "time"), right.toDF("key", "time", "payload"),
        "key", "time", "payload")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sorted
    val naive = left.map { case (k, t) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      (k, t, if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.sorted
    assert(out === naive)
  }

  test("containmentPairs equals brute-force subset check") {
    val docGen = Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
        .map(_.mkString(" ")))
    val docs = sample(docGen, 13L, 25).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def bigrams(t: String): Set[String] =
      t.split("\\s+").sliding(2).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> bigrams(t) }
    val naive = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia != ib && sa.size < sb.size && sa.subsetOf(sb)
    } yield (ia, ib)).toSet
    assert(out === naive)
  }

  test("quantizeInt8 codes stay in range with bounded reconstruction error") {
    val vecGen = Gen.listOfN(16,
      Gen.choose(-1000000, 1000000).map(_ / 1e6f))
    val vecs = sample(vecGen, 17L, 30).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val rows = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val scale = r.getLong(1) / 1e9
      val q = r.getSeq[Long](2)
      assert(q.forall(x => x >= -127 && x <= 127), s"range violated at $id")
      val orig = vecs.find(_._1 == id).get._2
      if (scale > 0) {
        // round-half-up to 127 steps → error ≤ half a step plus the
        // ppb floor on the published scale
        val step = scale / 127.0
        orig.zip(q).foreach { case (v, qi) =>
          assert(math.abs(v.toDouble - qi * step) <= step / 2 + 1e-6,
            s"reconstruction error too large at $id")
        }
      } else assert(q.forall(_ == 0L))
    }
  }

  test("duplicatedSpans: naive reference agreement on random corpora") {
    // docs from a tiny vocabulary so shared windows actually occur
    val n = 3
    val docGen = Gen.choose(3, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val docs = sample(docGen, 23L, 20).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = Dedup.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id",
        "text", n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // naive reference: enumerate windows, count multi-doc window texts,
    // union covered positions per doc
    val wins = docs.flatMap { case (id, t) =>
      val tk = t.split("\\s+")
      tk.sliding(n).zipWithIndex.map { case (w, i) =>
        (id, i, w.mkString(" "))
      }
    }
    val dupWins = wins.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size > 1).keySet
    docs.foreach { case (id, t) =>
      val nToks = t.split("\\s+").length.toLong
      val covered = wins.filter(w => w._1 == id && dupWins(w._3))
        .flatMap(w => w._2 until (w._2 + n)).distinct.size.toLong
      assert(got(id) === ((nToks, covered)), s"doc $id")
    }
  }

  test("semDedup: every dropped vector has a lower-id near-dup in its " +
      "cluster; every kept vector has none") {
    val vecGen = Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 1000.0f))
    val vecs = sample(vecGen, 29L, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding",
        threshold = 0.9, centroidMod = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(dot / (na * nb))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = vecs.toMap
    val cluster = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (vid, cid, dropped) =>
      val lowerSameCluster = out.filter(o =>
        o._1 < vid && o._2 == cid &&
        cos(byId(o._1), byId(vid)) >= 0.9)
      if (dropped == 1)
        assert(lowerSameCluster.nonEmpty, s"$vid dropped w/o witness")
      else
        assert(lowerSameCluster.isEmpty, s"$vid kept despite near-dup")
    }
  }

  test("dropRepeatedChunks: naive reference agreement on random corpora") {
    val c = 3
    val docGen = Gen.choose(1, 14).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val docs = sample(docGen, 31L, 18).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = Dedup.dropRepeatedChunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", c)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // naive reference: chunk, count docs per chunk text, drop shared
    val chunked = docs.map { case (id, t) =>
      id -> t.split("\\s+").grouped(c).map(_.mkString(" ")).toSeq
    }
    val docsPerChunk = chunked.flatMap { case (id, ch) =>
      ch.distinct.map(_ -> id)
    }.groupBy(_._1).map { case (ch, v) => ch -> v.map(_._2).distinct.size }
    chunked.foreach { case (id, ch) =>
      val keep = ch.filter(docsPerChunk(_) == 1)
      assert(got(id) ===
        ((ch.size.toLong, keep.size.toLong, sha(keep.mkString(" ")))),
        s"doc $id")
    }
  }

  test("bigramLmScore: naive reference agreement on random corpora") {
    val docGen = Gen.choose(1, 10).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("x", "y", "z")).map(_.mkString(" ")))
    val docs = sample(docGen, 37L, 15).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = TextAnalysis.bigramLmScore(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val bigrams = docs.flatMap { case (id, t) =>
      val tk = t.split("\\s+")
      tk.sliding(2).filter(_.length == 2).map(w => (id, w(0), w(1)))
    }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) =>
      k -> v.size.toLong
    }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> m.values.sum
    }
    docs.foreach { case (id, t) =>
      val bg = bigrams.filter(_._1 == id)
      if (bg.isEmpty) assert(!got.contains(id), s"doc $id")
      else {
        val ps = bg.map(b => c2((b._2, b._3)) * 1000000L / c1(b._2))
        assert(got(id) === ((bg.size.toLong, ps.sum / bg.size)),
          s"doc $id")
      }
    }
  }

  test("Misra-Gries summary never loses an item above N/(m+1), under " +
      "any partitioning") {
    // skewed streams from a small alphabet so heavy items exist
    val tokGen = Gen.frequency(
      5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      1 -> Gen.oneOf("c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8"))
    (0 until 5).foreach { round =>
      val stream = sample(tokGen, 100 + round, 400)
      val m = 4
      val exact = stream.groupBy(identity).map { case (k, v) =>
        k -> v.size.toLong
      }
      // random 4-way partitioning, summaries merged pairwise
      val parts = stream.zipWithIndex.groupBy(_._2 % 4).values
        .map(_.map(_._1))
      val summaries = parts.map(_.foldLeft(Map.empty[String, Long])(
        (acc, t) => Frequency.mgAdd(acc, t, m)))
      val merged = summaries.reduce(Frequency.mgMerge(_, _, m))
      assert(merged.size <= m)
      val bound = stream.size.toLong / (m + 1)
      exact.filter(_._2 > bound).keys.foreach { k =>
        assert(merged.contains(k),
          s"round $round: lost $k (count ${exact(k)} > bound $bound)")
      }
      // deficit bound: retained estimates undercount by at most N/(m+1)
      merged.foreach { case (k, est) =>
        assert(est <= exact(k) && exact(k) - est <= bound,
          s"round $round: estimate for $k out of deficit bound")
      }
    }
  }

  test("graph ops are partition-invariant on random graphs " +
      "(LPA labels, ANF sums, walk paths)") {
    // the determinism claim behind the whole graph/SQL-mirror family:
    // the result is a pure function of the EDGE SET, not of how rows
    // are distributed — re-run every op on a 1-partition and a
    // 13-partition copy of the same random graph and require equality
    val edgeGen = for {
      a <- Gen.choose(1L, 60L); b <- Gen.choose(1L, 60L) if a != b
    } yield (a, b)
    val edges = sample(edgeGen, 97L, 150).distinct
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df13 = edges.toDF("src", "dst").repartition(13)
    def lpa(df: org.apache.spark.sql.DataFrame) =
      graph.Communities.labelPropagation(df, 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa(df1) === lpa(df13))
    def anf(df: org.apache.spark.sql.DataFrame) =
      graph.Communities.neighborhoodFunction(df, 3, 4)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    assert(anf(df1) === anf(df13))
    def walks(df: org.apache.spark.sql.DataFrame) =
      graph.Walks.deterministicWalks(df, col("id") % 5 === 0, 4)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(walks(df1) === walks(df13))
  }

  test("round-7 report queries are shuffle-partition invariant") {
    // the driver hash-compares VALUES; a result that shifts with the
    // partition count would pass locally and fail on any other layout.
    // Exercise the new report tier under 1 vs 17 shuffle partitions.
    val dir = "/root/testdata/sf0.001"
    val names = Seq("q186_epoch_allocation", "q190_cohort_ltv",
      "q193_touch_attribution", "q196_landing_exit",
      "q182_pareto_skyline")
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def run(): Map[String, Seq[String]] = names.map { n =>
      n -> SparkEntry.queries(n)(spark, dir)
        .collect().map(_.toString).toSeq
    }.toMap
    val one =
      try { spark.conf.set("spark.sql.shuffle.partitions", "1"); run() }
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    val many =
      try { spark.conf.set("spark.sql.shuffle.partitions", "17"); run() }
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    names.foreach(n => assert(one(n) === many(n), n))
  }

  test("zkey16 is a bijection on 16-bit pairs (naive interleave mirror)") {
    def naive(a: Long, b: Long): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.sum
    val pairGen = for {
      a <- Gen.choose(0L, 65535L); b <- Gen.choose(0L, 65535L)
    } yield (a, b)
    val pairs = sample(pairGen, 13L, 80) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (1L, 2L))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.ops.ZOrder.zkey16(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    got.foreach { case ((a, b), z) =>
      assert(z === naive(a, b), s"zkey16($a, $b)")
    }
    // injective on the sampled set (collision ⇒ not a bijection)
    assert(got.map(_._2).distinct.length ===
      got.map(_._1).distinct.length)
  }
}
