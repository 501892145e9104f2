package graft

import org.apache.spark.sql.SparkSession

/** Dev timing harness: time individual SparkEntry queries (cold + warm)
  * without running the whole bench. Usage:
  *   sbt "runMain graft.TimeQ /root/testdata/sf0.1 q26_simhash q17_bfs_reach"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    Tables.names.foreach { t =>
      try Tables.load(spark, dir, t).count()
      catch { case _: Throwable => () }
    }
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(s"TIMEQ $q cold=${(System.nanoTime - t0) / 1e9} rows=$n")
      val t1 = System.nanoTime
      SparkEntry.queries(q)(spark, dir).count()
      println(s"TIMEQ $q warm=${(System.nanoTime - t1) / 1e9}")
    }
    spark.stop()
  }
}
