package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy longest-match subword tokenization (the WordPiece inference
  * rule — Wu et al. 2016 §4.1; BERT's tokenizer applies exactly this
  * walk against a fixed vocabulary). The reference has no tokenizer;
  * a training-data engine needs one to COUNT what a model will see
  * (q147's BPE-ish regex estimates units; this op applies a real,
  * data-derived vocabulary and yields the exact piece stream).
  *
  * Scale shape: tokenization is distributed over the DISTINCT-word
  * table (Zipf: millions of types for trillions of tokens) with the
  * bounded vocabulary broadcast; corpus weights re-attach by one join.
  * The greedy walk is O(len · maxPieceLen) per word, row-local.
  */
object WordPiece {

  /** Tokenize each row of `words(word)` by greedy longest-match over
    * `vocab` (which MUST contain every single character that appears,
    * or the walk would stall — enforced). Returns (word, piece, n_uses)
    * with one row per distinct piece per word. Pieces are capped at
    * `maxLen` characters (matching the vocabulary derivation). */
  def tokenizePieces(words: DataFrame, wordCol: String,
      vocab: Seq[String], maxLen: Int = 4): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val vset = vocab.toSet
    require(vocab.nonEmpty && vocab.forall(p =>
      p.nonEmpty && p.length <= maxLen), "bad vocabulary")
    val bc = spark.sparkContext.broadcast(vset)
    words.select(col(wordCol).cast("string").as("word"))
      .as[String]
      .mapPartitions { it =>
        val v = bc.value
        it.flatMap { w =>
          val counts = scala.collection.mutable.Map.empty[String, Long]
          var pos = 0
          var ok = true
          while (ok && pos < w.length) {
            var l = math.min(maxLen, w.length - pos)
            while (l > 0 && !v.contains(w.substring(pos, pos + l))) l -= 1
            if (l == 0) ok = false // unreachable with full char coverage
            else {
              val p = w.substring(pos, pos + l)
              counts(p) = counts.getOrElse(p, 0L) + 1L
              pos += l
            }
          }
          require(ok, s"vocabulary cannot tokenize '$w' — missing a " +
            "single-character piece")
          counts.iterator.map { case (p, n) => (w, p, n) }
        }
      }
      .toDF("word", "piece", "n_uses")
  }
}
