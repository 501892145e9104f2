package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All driver-facing queries take an `sfDir` (e.g. /root/testdata/sf0.01)
  * and read only the tables they need; column pruning + predicate pushdown
  * then reach the parquet scan via Catalyst.
  */
object Tables {

  /** Canonicalize `events.ts` to LONG epoch nanoseconds regardless of how
    * the driver encoded it. Generations of the testdata have alternated
    * between parquet TIMESTAMP(NANOS) (surfacing as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong`) and plain microsecond
    * timestamps; every event-time query downstream does integer math on
    * nanos, and the DuckDB oracle's `epoch_ns(ts)` accepts both, so this
    * is the single seam where the encodings converge.
    *
    * The NTZ branch uses `timestampdiff` between two NTZ values, which is
    * session-timezone-INVARIANT (verified: identical results under UTC and
    * America/New_York) — `unix_micros(cast(ts as timestamp))` is not,
    * because the NTZ→TZ cast applies the session zone. The oracle treats
    * the naive value as UTC, which is exactly what the NTZ diff computes.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // already epoch nanos
      case TimestampNTZType =>
        df.withColumn("ts",
          expr("timestampdiff(MICROSECOND, " +
            "to_timestamp_ntz('1970-01-01 00:00:00'), ts) * 1000"))
      case TimestampType =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected LONG nanos " +
            "or a timestamp type)")
    }
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Open a table as a file STREAM, tolerant of both physical layouts a
    * table arrives in: the driver's single `name.parquet` FILE (the
    * file-stream source rejects a file as basePath, so scan the sf dir
    * with a name glob) and a `name.parquet/` DIRECTORY of part files
    * (Spark's own writer layout — MakeScale's 10× stress data; here the
    * name glob would match nothing and the stream would silently read
    * ZERO rows). Layout is probed through the Hadoop FS API so the same
    * code holds on HDFS/S3 paths, not just local disk. Schema comes
    * from the batch reader (streams cannot infer), and callers
    * normalize types AFTER the source via the same seams as batch
    * ([[normalizeEventTs]]). */
  def streamTable(spark: SparkSession, dir: String, name: String)
      : DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val schema = load(spark, dir, name).schema
    if (fs.getFileStatus(path).isDirectory)
      spark.readStream.schema(schema).parquet(path.toString)
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$name.parquet").parquet(dir)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  /** The inverse guard of [[normalizeEventTs]] for columns consumed with
    * TIMESTAMP semantics (comparisons against timestamp literals,
    * date_format): if a regeneration flips them to parquet
    * TIMESTAMP(NANOS), they surface as LongType under `nanosAsLong` and
    * every timestamp comparison breaks at analysis — so canonicalize
    * long nanos back to a timestamp at the load boundary. Timestamp
    * flavors (LTZ and NTZ) pass through untouched. */
  def normalizeTimestampCol(df: DataFrame, name: String): DataFrame =
    df.schema(name).dataType match {
      case LongType =>
        df.withColumn(name,
          expr(s"timestamp_micros(`$name` div 1000)"))
      case _ => df
    }

  def orders(s: SparkSession, d: String): DataFrame =
    normalizeTimestampCol(load(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTimestampCol(load(s, d, "lineitem"), "l_shipdate")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
