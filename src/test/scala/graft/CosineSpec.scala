package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

class CosineSpec extends SparkSpec {
  import spark.implicits._

  test("native CosineSimilarity is bit-identical to the column formula") {
    val rnd = new scala.util.Random(13)
    val vecs = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.5),
        Array.fill(64)(rnd.nextDouble() - 0.5))
    }.toDF("id", "a", "b")
    val both = vecs.select(
      Similarity.cosine(col("a"), col("b")).as("ref"),
      Similarity.cosineFast(col("a"), col("b")).as("fast")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null and length-mismatch handling") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0, 3.0))), // length mismatch
      (None, Some(Array(1.0)))                              // null side
    ).toDF("a", "b")
    val out = df.select(Similarity.cosineFast(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
    // null ELEMENT → null result (SQL semantics), not read-as-0.0
    val nullElem = spark.sql(
      "SELECT array(1.0d, CAST(NULL AS DOUBLE)) AS a, " +
        "array(1.0d, 2.0d) AS b")
      .select(Similarity.cosineFast(col("a"), col("b"))).collect()
    assert(nullElem(0).isNullAt(0))
  }

  test("graft_cosine callable from spark.sql after live registration") {
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "graft_cosine",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimilarity(children(0), children(1)))
    val v = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(v === 1.0)
  }

  test("identical vectors give exactly 1.0 through codegen") {
    val df = Seq((Array(0.1, 0.2, 0.3), Array(0.1, 0.2, 0.3)))
      .toDF("a", "b")
    val v = df.select(Similarity.cosineFast(col("a"), col("b"))).collect()(0)
      .getDouble(0)
    assert(math.abs(v - 1.0) < 1e-15)
  }
}
