package graft

import graft.queries.IntegrityQueries

/** q211–q213: behavioral fingerprints, feature hashing, merkle diff —
  * against naive mirrors over collected sf0.001 tables. */
class IntegritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def hash60(salt: String, id: String): Long =
    java.lang.Long.parseLong(md5hex(s"$salt:$id").take(15), 16)

  test("q211 daily fingerprints match a naive mirror exactly") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val byUserDay = ev.groupBy(e => (e._1, e._2 / 86400000000000L))
    val fps = byUserDay.toSeq.map { case ((u, _), es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4).mkString(",")
      (u, md5hex(seq), seq.split(",", -1).length.toLong)
    }
    val want = fps.groupBy(f => (f._2, f._3)).toSeq
      .map { case ((fp, len), xs) =>
        (fp, len, xs.length.toLong, xs.map(_._1).distinct.length.toLong,
          xs.map(_._1).min)
      }
      .filter(_._3 >= 3)
      .sortBy(x => (-x._3, x._1)).take(25)
    val got = IntegrityQueries.q211_behavior_fingerprint(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want)
  }

  test("q212 feature hashing matches a naive mirror exactly") {
    val toks = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
      .flatMap { t =>
        val s = t.trim
        if (s.isEmpty) Array.empty[String] else s.split("\\s+")
      }
    val buckets = toks.map(t => (hash60("fh", t) % 1024L, t))
    val perBucketTok = buckets.groupBy(identity)
      .map { case ((b, t), xs) => (b, t, xs.length.toLong) }
    val perBucket = perBucketTok.groupBy(_._1).map { case (b, xs) =>
      (b, xs.size.toLong, xs.map(_._3).sum)
    }
    val used = perBucketTok.map(_._1).toSeq.distinct.length.toLong
    val distinctToks = toks.distinct.length.toLong
    val want = perBucket.toSeq
      .sortBy { case (b, nt, no) => (-nt, -no, b) }.take(20)
      .map { case (b, nt, no) => (b, nt, no, used, distinctToks) }
    val got = IntegrityQueries.q212_feature_hashing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === want)
  }

  test("q213 merkle digests disagree exactly on buckets with changes") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bucketOf(id: Long) = hash60("mkb", id.toString) % 256L
    def rowH(id: Long, text: String) = hash60("mkr", s"$id:$text")
    val oldRows = docs.filter(_._1 % 20 != 0)
    val newRows = docs.filter(_._1 % 30 != 0).map { case (id, t) =>
      (id, if (id % 7 == 0) t + " EDIT" else t)
    }
    def digests(rows: Seq[(Long, String)]) =
      rows.groupBy(r => bucketOf(r._1)).map { case (b, xs) =>
        b -> (xs.map(r => rowH(r._1, r._2)).reduce(_ ^ _),
          xs.length.toLong)
      }
    val od = digests(oldRows.toSeq)
    val nd = digests(newRows.toSeq)
    val want = (od.keySet ++ nd.keySet).toSeq.sorted.flatMap { b =>
      val (doh, no) = od.getOrElse(b, (0L, 0L))
      val (dnh, nn) = nd.getOrElse(b, (0L, 0L))
      if (doh != dnh) Some((b, doh, no, dnh, nn)) else None
    }
    val got = IntegrityQueries.q213_merkle_diff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === want)
    // completeness: every bucket containing an added/removed/edited
    // doc must surface (XOR digests cannot silently cancel here)
    val changedDocs = docs.map(_._1).filter(id =>
      (id % 20 == 0) != (id % 30 == 0) || (id % 30 != 0 && id % 7 == 0))
    val changedBuckets = changedDocs.map(bucketOf).distinct.sorted
    assert(changedBuckets.forall(b => got.exists(_._1 == b)),
      s"changed buckets $changedBuckets must all be reported")
  }
}
