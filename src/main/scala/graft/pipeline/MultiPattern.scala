package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern substring search via the Aho–Corasick automaton
  * (Aho & Corasick 1975, "Efficient String Matching: An Aid to
  * Bibliographic Search") — the decontamination / PII-sweep primitive
  * at corpus scale. The reference's search surface is one pattern per
  * scan (`pkg/query/lsp.go` SearchSymbols routes a single term to a
  * CONTAINS predicate); sweeping a benchmark suite's n-grams or a
  * blocklist over 100 TB that way costs |patterns| full scans. The
  * automaton folds the whole dictionary into ONE pass per document:
  * O(len + matches) per doc, independent of |patterns|.
  *
  * Spark shape: the automaton is built once on the driver from a
  * BOUNDED dictionary (blocklists and benchmark suites are
  * driver-sized by nature), broadcast, and run inside a typed
  * `mapPartitions` — row-local, zero shuffles, deterministic on any
  * partitioning. The corpus is never collected.
  */
object MultiPattern {

  /** Immutable Aho–Corasick automaton. Serializable (broadcast-safe):
    * flat arrays only. Matching semantics exposed:
    *   - `firstPos`: 1-based position of the first occurrence
    *     (DuckDB `strpos` semantics);
    *   - `nonOverlapCount`: leftmost non-overlapping occurrence count
    *     per pattern (DuckDB `(len(t)-len(replace(t,p,'')))/len(p)`
    *     semantics — greedy left-to-right, scan resumes after each
    *     accepted match; for a fixed-length pattern the AC match
    *     stream arrives in start order, so the greedy filter over it
    *     is exactly the replace() count).
    */
  final class AhoCorasick private[pipeline] (
      gotoMap: Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[Array[Int]],
      val patterns: Array[String]) extends Serializable {

    /** Per-pattern (firstPos 1-based, nonOverlapCount) for patterns
      * occurring in `text`, as (patternIdx, firstPos, count). */
    def scan(text: String): Iterator[(Int, Int, Int)] = {
      val n = patterns.length
      val first = new Array[Int](n)
      val cnt = new Array[Int](n)
      val lastEnd = new Array[Int](n) // 1-based end of last accepted
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !gotoMap(s).contains(c)) s = fail(s)
        s = gotoMap(s).getOrElse(c, 0)
        val hits = out(s)
        var h = 0
        while (h < hits.length) {
          val p = hits(h)
          val len = patterns(p).length
          val start = i + 2 - len // 1-based
          if (start > lastEnd(p)) { // greedy non-overlap accept
            if (cnt(p) == 0) first(p) = start
            cnt(p) += 1
            lastEnd(p) = i + 1
          }
          h += 1
        }
        i += 1
      }
      (0 until n).iterator.filter(cnt(_) > 0)
        .map(p => (p, first(p), cnt(p)))
    }
  }

  /** Build the automaton: trie + BFS failure links + dictionary-suffix
    * output merging (a node reports every pattern that is a suffix of
    * its path). Duplicate patterns are rejected (the per-pattern
    * output contract would be ambiguous). */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    require(patterns.distinct.size == patterns.size,
      "duplicate patterns")
    val pats = patterns.toArray
    val gotoB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = gotoB(s).getOrElseUpdate(c, {
          gotoB += scala.collection.mutable.Map.empty[Char, Int]
          outB += scala.collection.mutable.ArrayBuffer.empty[Int]
          gotoB.size - 1
        })
      }
      outB(s) += pi
    }
    val fail = new Array[Int](gotoB.size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotoB(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoB(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
        fail(s) = if (gotoB(f).contains(c) && gotoB(f)(c) != s)
          gotoB(f)(c) else 0
        outB(s) ++= outB(fail(s)) // dictionary-suffix outputs
      }
    }
    new AhoCorasick(gotoB.map(_.toMap).toArray, fail,
      outB.map(_.toArray.sorted).toArray, pats)
  }

  /** One automaton pass over `docs(idCol, textCol)`: a row per
    * (doc, pattern) occurrence — (doc_id, pattern, first_pos 1-based,
    * n_occ non-overlapping). One shared automaton instance per
    * executor via broadcast; documents stream through untouched. */
  def matchStats(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(build(patterns))
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.flatMap { case (id, text) =>
          ac.scan(if (text == null) "" else text).map {
            case (pi, pos, n) => (id, ac.patterns(pi), pos, n)
          }
        }
      }
      .toDF("doc_id", "pattern", "first_pos", "n_occ")
  }
}
