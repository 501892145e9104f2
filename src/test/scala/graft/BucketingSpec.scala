package graft

import org.apache.spark.sql.functions._

import graft.ops.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("tables bucketed on the join key join without any exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bdb LOCATION '$dir'")
    try {
      val nodes = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
      val edges = (1L to 99L).map(i => (i, i + 1)).toDF("src", "dst")
      Bucketing.writeBucketed(nodes, "bdb.b_nodes", "id", 4)
      Bucketing.writeBucketed(edges.withColumnRenamed("src", "id"),
        "bdb.b_edges", "id", 4)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("bdb.b_edges")
          .join(spark.table("bdb.b_nodes"), Seq("id"))
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-located bucketed join must not shuffle:\n$plan")
        assert(j.count() === 99L)
      } finally spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")
    }
  }
}
