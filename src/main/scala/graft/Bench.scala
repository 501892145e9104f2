package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/file-listing paths so the first timed query
    // doesn't absorb several seconds of one-time cost.
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // Each query runs twice: cold (first plan + codegen + scan) and warm
    // (plan/codegen JIT'd, OS page cache hot). Warm is the number to
    // compare against BASELINE.md's steady-state gates; cold absorbs
    // per-query JVM warm-up that would otherwise be misattributed.
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) => (name, time(fn), time(fn))
    }
    // The harness that collects this line keeps only the tail of the
    // process output; the JSON must stay compact (~2k chars) or its
    // head is truncated and it no longer parses. Short keys ("q01" for
    // "q01_pruned_agg") and 2-decimal [cold, warm] pairs keep ~100
    // queries under that budget.
    def fmt(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.size == shortKeys.size,
      s"bench JSON key collision after prefix-truncation: " +
        shortKeys.diff(shortKeys.distinct).mkString(","))
    val qs = results.zip(shortKeys).map { case ((_, cold, warm), k) =>
      "\"" + k + "\":[" + fmt(cold, 2) + "," + fmt(warm, 2) + "]"
    }.mkString("{", ",", "}")
    val coldTotal = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":${fmt(coldTotal, 3)},"unit":"sec","warm_value":${fmt(warmTotal, 3)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
