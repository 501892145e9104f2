package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Selective correctness dump for iteration: like [[Verify]] but only
  * the named queries — parquet per query plus an oracle_sql.json
  * holding just their oracles, so `tools/selfcheck.py` gates a subset
  * without the full 120-query sweep.
  *
  *   sbt "runMain graft.VerifySome /root/testdata/sf0.01 /tmp/vs q122"
  *
  * Names may be full ("q122_editsim_dedup") or the short prefix
  * ("q122").
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static conf, default 100: a ~358-plan session structurally
      // thrashes the Janino codegen cache, so every warm re-execution
      // re-compiles (and re-JITs) its generated classes — measured as
      // multi-second inflation on the biggest plans (q358 +9 s, q262
      // +2 s) ONLY inside full sweeps, never in fresh sessions. Any
      // long-lived production session (query service, MCP server) has
      // the same profile; memory cost is bounded by the plan corpus
      // and already provisioned by the 1g reserved code cache.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names = args.drop(2).map { a =>
      SparkEntry.queries.keys
        .find(k => k == a || k.takeWhile(_ != '_') == a)
        .getOrElse(sys.error(s"unknown query: $a"))
    }
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
