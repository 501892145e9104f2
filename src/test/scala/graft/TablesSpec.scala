package graft

import org.apache.spark.sql.functions._

/** The events.ts normalization seam — the single point where the driver's
  * alternating testdata encodings (parquet TIMESTAMP(NANOS) read as long
  * under nanosAsLong, vs microsecond TIMESTAMP_NTZ, vs zoned TIMESTAMP)
  * converge to canonical epoch nanos. This seam broke 17 queries in
  * round 6 when the testdata regenerated; these tests pin its contract.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2026-01-01T12:00:00.123456 UTC in the three encodings
  private val wantNanos = 1767268800123456000L
  private val micros = wantNanos / 1000L

  test("long ts passes through untouched (nanosAsLong encoding)") {
    val df = Seq((1L, wantNanos)).toDF("event_id", "ts")
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType.typeName === "long")
    assert(out.select("ts").as[Long].collect() === Array(wantNanos))
    // column position preserved (schema-shape stability for readStream)
    assert(out.columns.toSeq === Seq("event_id", "ts"))
  }

  test("TIMESTAMP_NTZ converts to epoch nanos, UTC-interpreted") {
    val df = Seq("2026-01-01 12:00:00.123456").toDF("s")
      .select(lit(1L).as("event_id"), to_timestamp_ntz(col("s")).as("ts"))
    val out = Tables.normalizeEventTs(df).select("ts").as[Long].collect()
    assert(out === Array(wantNanos))
  }

  test("NTZ normalization is session-timezone INVARIANT") {
    // the naive value must be read as UTC (what DuckDB's epoch_ns does)
    // no matter what zone the session runs in — a cast-through-timestamp
    // formulation would shift by the zone offset
    val df = Seq("2026-01-01 12:00:00.123456").toDF("s")
      .select(to_timestamp_ntz(col("s")).as("ts"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      val got = Seq("UTC", "America/New_York", "Asia/Tokyo").map { tz =>
        spark.conf.set("spark.sql.session.timeZone", tz)
        Tables.normalizeEventTs(df).select("ts").as[Long].collect()(0)
      }
      assert(got.distinct === Seq(wantNanos),
        s"timezone-dependent normalization: $got")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("zoned TIMESTAMP converts via unix_micros (instant-exact)") {
    val df = Seq(1L).toDF("event_id")
      .select(col("event_id"), timestamp_micros(lit(micros)).as("ts"))
    assert(df.schema("ts").dataType.typeName === "timestamp")
    val out = Tables.normalizeEventTs(df).select("ts").as[Long].collect()
    assert(out === Array(wantNanos))
  }

  test("unsupported ts type fails loudly, not silently") {
    val df = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(df)
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("date columns: long nanos canonicalize back to timestamp") {
    // the inverse guard: o_orderdate/l_shipdate consumed with TIMESTAMP
    // semantics must survive a regeneration that encodes them as
    // TIMESTAMP(NANOS) (read as long under nanosAsLong)
    val df = Seq((1L, wantNanos)).toDF("o_orderkey", "o_orderdate")
    val out = Tables.normalizeTimestampCol(df, "o_orderdate")
    assert(out.schema("o_orderdate").dataType.typeName === "timestamp")
    assert(out.select(unix_micros(col("o_orderdate"))).as[Long]
      .collect() === Array(micros))
    // timestamp flavors pass through untouched
    val ts = df.withColumn("o_orderdate",
      expr("timestamp_micros(o_orderdate div 1000)"))
    assert(Tables.normalizeTimestampCol(ts, "o_orderdate")
      .schema("o_orderdate").dataType.typeName === "timestamp")
    // the live tables load with timestamp-typed date columns either way
    assert(Tables.orders(spark, "/root/testdata/sf0.001")
      .schema("o_orderdate").dataType.typeName.startsWith("timestamp"))
    assert(Tables.lineitem(spark, "/root/testdata/sf0.001")
      .schema("l_shipdate").dataType.typeName.startsWith("timestamp"))
  }

  test("filters and projections reach the parquet scan (pushdown)") {
    // the scale contract behind every lookup query: the scan must carry
    // PushedFilters and a pruned ReadSchema, or a 100 TB table is read
    // whole for a 4-column point query
    val plan = graft.queries.Relational
      .q02_filter_project(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(1500))
    assert(plan.contains("GreaterThanOrEqual(p_size,25"), plan.take(1500))
    // column pruning: the scan schema mentions the 4 selected columns
    // and NOT the 5 untouched ones (brand/container/retailprice/...)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey"))
    assert(!readSchema.contains("p_retailprice"), readSchema)
  }

  test("the real testdata loads to long nanos and matches DuckDB's view") {
    // whatever encoding the driver generated, the loader must emit BIGINT
    // nanos whose hour buckets agree with the parquet's own micros
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType.typeName === "long")
    val raw = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val nRows = raw.count()
    assert(ev.count() === nRows)
    raw.schema("ts").dataType.typeName match {
      case "long" => // same column — nothing to cross-check
      case _ =>
        // cross-check a value-level invariant: nanos div 1000 must equal
        // the micros the timestamp encodes, for every row
        val mismatches = Tables.normalizeEventTs(raw)
          .select(col("event_id"), col("ts").as("nanos"))
          .join(raw.select(col("event_id"),
            unix_micros(to_utc_timestamp(col("ts").cast("timestamp"),
              spark.conf.get("spark.sql.session.timeZone"))).as("mu")),
            Seq("event_id"))
          .filter(col("nanos") =!= col("mu") * 1000L)
          .count()
        assert(mismatches === 0L)
    }
  }
}
