package graft

import org.apache.spark.sql.functions._

import graft.functions.FeatureMergeAggregator
import graft.functions.FeatureMergeAggregator.FeatureRow

class FeatureMergeSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator merges like the column-expression pipeline") {
    val rows = Seq(
      FeatureRow("Graph Storage", "short", "planned", Seq("a")),
      FeatureRow("Graph Storage", "a much longer description wins",
        "completed", Seq("b")),
      FeatureRow("Query Engine", "only one", "in_progress", Seq("c")))
      .toDS()
    val out = rows.groupByKey(r =>
        r.name.toLowerCase.trim.replaceAll("\\s+", " "))
      .agg(FeatureMergeAggregator.merge.toColumn)
      .map(_._2)
      .collect()
      .map(f => f.name -> f).toMap
    val gs = out("Graph Storage")
    assert(gs.description === "a much longer description wins")
    assert(gs.status === "completed")
    assert(gs.tags === Seq("a", "b"))
    assert(out("Query Engine").status === "in_progress")
  }

  test("merge is associative across partition boundaries") {
    val many = (1 to 100).map(i =>
      FeatureRow("F", s"desc$i" * (i % 7), if (i % 3 == 0) "completed"
        else "planned", Seq(s"t${i % 5}"))).toDS().repartition(8)
    val merged = many.groupByKey(_.name)
      .agg(FeatureMergeAggregator.merge.toColumn).map(_._2).collect()(0)
    assert(merged.status === "completed")
    assert(merged.tags.length === 5)
    // longest description regardless of partitioning; length ties broken
    // lexicographically (matches the column version's struct-max order)
    val expected = (1 to 100).map(i => s"desc$i" * (i % 7))
      .max(Ordering.by((s: String) => (s.length, s)))
    assert(merged.description === expected)
  }
}
