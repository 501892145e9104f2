package graft

import graft.graph.Traversals

class ClosureTreeSpec extends SparkSpec {
  import spark.implicits._

  test("closureTree equals closure on a tree") {
    val tree = (2L to 64L).map(i => (i / 2, i)).toDF("src", "dst")
    val general = Traversals.closure(tree, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fast = Traversals.closureTree(tree, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fast === general)
    assert(fast.nonEmpty)
  }
}
