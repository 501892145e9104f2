package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF for the reference's feature dedup/merge
  * (`pkg/indexer/documents/parser.go:165-189`, SURVEY §2.9's suggested
  * `Aggregator[Feature, Buf, Feature]`): longest description wins, tag
  * union, most-advanced status. Column-expression equivalent lives in
  * `DocumentPipeline.mergeFeatures`; this is the typed surface for
  * callers working in `Dataset[FeatureRow]`.
  */
object FeatureMergeAggregator {

  case class FeatureRow(name: String, description: String, status: String,
      tags: Seq[String])

  case class Buf(name: String, description: String, statusRank: Int,
      status: String, tags: Set[String], n: Long)

  private def rank(status: String): Int = status match {
    case "completed" => 3; case "in_progress" => 2; case "planned" => 1
    case _ => 0
  }

  /** Longest description; ties broken lexicographically (greater wins) so
    * the result is independent of partitioning/merge order — same total
    * order as the column version's max(struct(length, desc)). */
  private def bestDesc(a: String, b: String): String =
    if (a.length != b.length) { if (a.length > b.length) a else b }
    else if (a.compareTo(b) >= 0) a else b

  val merge: Aggregator[FeatureRow, Buf, FeatureRow] =
    new Aggregator[FeatureRow, Buf, FeatureRow] {
      def zero: Buf = Buf(null, "", -1, "unknown", Set.empty, 0L)

      def reduce(b: Buf, f: FeatureRow): Buf = Buf(
        // min name like the column version (deterministic representative)
        if (b.name == null || f.name < b.name) f.name else b.name,
        bestDesc(b.description, Option(f.description).getOrElse("")),
        math.max(b.statusRank, rank(f.status)),
        if (rank(f.status) > b.statusRank) f.status else b.status,
        b.tags ++ Option(f.tags).getOrElse(Nil),
        b.n + 1)

      def merge(a: Buf, b: Buf): Buf = Buf(
        if (a.name == null) b.name
        else if (b.name == null) a.name
        else if (a.name < b.name) a.name else b.name,
        bestDesc(a.description, b.description),
        math.max(a.statusRank, b.statusRank),
        if (a.statusRank >= b.statusRank) a.status else b.status,
        a.tags ++ b.tags, a.n + b.n)

      def finish(b: Buf): FeatureRow =
        FeatureRow(b.name, b.description, b.status, b.tags.toSeq.sorted)

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[FeatureRow] = Encoders.product[FeatureRow]
    }
}
