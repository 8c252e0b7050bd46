package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, unix_millis}
import org.apache.spark.sql.types.TimestampType

/** Schema-drift guard for [[Tables.events]]: the driver has regenerated
  * `events.parquet` with different physical `ts` encodings across rounds
  * (nanos → µs-NTZ), and each switch silently amputated the whole event
  * query family until caught. These tests pin the contract: whatever the
  * physical encoding, `events(...).schema("ts")` is `TimestampType` and
  * `unix_millis(ts)` analyzes.
  */
class TablesSpec extends SparkSpec {

  private def writeAndRead(writeTs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-tables").toString
    writeTs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  test("events ts: µs TIMESTAMP_NTZ parquet normalizes to TimestampType, wall clock preserved") {
    import spark.implicits._
    val df = Seq((1L, "2026-08-13 12:34:56.123456"))
      .toDF("event_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
    val out = writeAndRead(df)
    assert(out.schema("ts").dataType == TimestampType)
    // session tz is UTC → NTZ cast preserves the wall clock exactly
    val ms = out.select(unix_millis(col("ts"))).head().getLong(0)
    assert(ms == 1786624496123L,
      s"expected 2026-08-13T12:34:56.123Z epoch-millis, got $ms")
  }

  test("events ts: tz'd TIMESTAMP parquet passes through as TimestampType") {
    import spark.implicits._
    val df = Seq((1L, "2026-08-13 12:34:56.123456"))
      .toDF("event_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .drop("ts_s")
    val out = writeAndRead(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_millis(col("ts"))).head().getLong(0) == 1786624496123L)
  }

  test("events ts: TIMESTAMP(NANOS) parquet floor-converts to TimestampType µs") {
    // Committed fixture (src/test/resources/events_nanos) carries nanos
    // values [-1500 ns, 0, 2026-08-13T00:00:00.123456789Z]; floor division
    // must round the negative value DOWN (-1500 ns → -2 µs), matching
    // DuckDB, where truncation toward zero would give -1 µs.
    val dir = getClass.getResource("/events_nanos").getPath
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out
      .select(org.apache.spark.sql.functions.unix_micros(col("ts")))
      .collect().map(_.getLong(0)).sorted
    assert(micros sameElements Array(-2L, 0L, 1755043200123456L),
      s"got ${micros.mkString(",")}")
  }

  test("events ts: nanosAsLong conf is NOT flipped by µs-encoded testdata") {
    val fresh = spark.newSession()
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    fresh.conf.unset(key)
    Tables.events(fresh, Sf001).limit(1).collect()
    assert(!fresh.conf.getOption(key).contains("true"),
      "µs testdata must not set the legacy nanosAsLong conf")
  }

  test("events ts: unix_millis analyzes on driver testdata (the r7 regression)") {
    val out = Tables.events(spark, Sf001).select(unix_millis(col("ts")).as("ms"))
    assert(out.limit(1).count() == 1)
  }

  test("driver testdata key columns keep the types the query surface assumes") {
    // The r7 events.ts drift generalized: pin the HANDFUL of (table,
    // column) types every family hard-depends on, so a driver testdata
    // regeneration that changes one surfaces as a single named failure
    // here instead of dozens of analysis errors downstream. Tolerant on
    // purpose — only load-bearing columns, and numeric ids accept any
    // integral width (queries cast).
    import org.apache.spark.sql.types._
    def dt(table: String, column: String): DataType =
      Tables.t(spark, Sf001, table).schema(column).dataType
    val integral = Set[DataType](IntegerType, LongType)
    assert(integral(dt("lineitem", "l_orderkey")))
    assert(Set[DataType](TimestampType, TimestampNTZType, DateType)(
      dt("lineitem", "l_shipdate")),
      s"l_shipdate became ${dt("lineitem", "l_shipdate")}")
    assert(dt("lineitem", "l_quantity") == DoubleType)
    assert(dt("documents", "text") == StringType)
    assert(dt("documents", "source") == StringType)
    assert(integral(dt("documents", "doc_id")))
    (dt("embeddings", "embedding"): @unchecked) match {
      case ArrayType(et, _) =>
        assert(Set[DataType](FloatType, DoubleType)(et),
          s"embedding element became $et")
      case other => fail(s"embeddings.embedding became $other")
    }
    assert(integral(dt("events", "user_id")))
    assert(dt("events", "value") == DoubleType)
    assert(dt("events", "props") == StringType)
  }
}
