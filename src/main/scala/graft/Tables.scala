package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table access for the driver-generated testdata (TESTDATA.md).
  * All schemas are read from parquet footers — never inferred from text.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright. Read nanos as long (legacy conf) and FLOOR to µs — matching
    * DuckDB's conversion for negative (pre-1970) timestamps too, where
    * plain `div` would truncate toward zero and diverge by 1 µs. Integer
    * arithmetic throughout (a double round-trip would lose low bits above
    * 2^53).
    */
  /** Floor-division nanos→µs timestamp conversion for a long column named
    * `col` (exposed for tests; floor ≠ `div` for negative values).
    */
  def nanosToMicrosSql(col: String): String =
    s"timestamp_micros(CASE WHEN $col >= 0 OR $col % 1000 = 0 " +
      s"THEN $col div 1000 ELSE $col div 1000 - 1 END)"

  /** Normalize `events.ts` to `TimestampType` regardless of the physical
    * parquet encoding the generator emitted. Three encodings are seen in the
    * wild (the driver's testdata has switched between them across rounds):
    *
    *   - `timestamp[ns]` (parquet TIMESTAMP(NANOS)): Spark's reader rejects
    *     this outright unless `nanosAsLong` is on, which surfaces it as a
    *     raw `LongType` → floor-convert to µs (see [[nanosToMicrosSql]]).
    *   - `timestamp[us]` no timezone → `TimestampNTZType`: most time
    *     functions (`unix_millis`, …) require `TimestampType`; cast. The
    *     session timezone is pinned UTC everywhere in this library, so the
    *     wall clock is preserved exactly.
    *   - `timestamp[us]` tz'd → already `TimestampType`: pass through.
    *
    * NOTE on conf scope: `nanosAsLong` must be on at SCAN time (the conf is
    * consulted per-file at execution, not just at schema inference — a
    * set-then-restore window around this call would race the actual read),
    * so when a nanos file IS encountered the flag is necessarily
    * session-wide while events queries run. To keep the side effect minimal
    * the flag is only set when the un-flagged read actually fails on a
    * nanos file — µs-encoded testdata never flips it.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val raw =
      try t(s, d, "events")
      catch {
        case e: Exception
            if e.getMessage != null && e.getMessage.contains("NANOS") &&
              !s.conf.getOption(key).contains("true") =>
          s.conf.set(key, "true")
          t(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr(nanosToMicrosSql("ts")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** Streaming twin of [[events]]: a file-source `readStream` over
    * `dir/events.parquet` with an explicit imposed schema (streaming
    * sources never infer) derived from the table's ACTUAL physical
    * encoding via one batch footer probe, normalizing `ts` to
    * `TimestampType` identically to the batch path — so stream/batch
    * parity tests survive driver testdata regeneration the same way the
    * batch side does.
    */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    val raw = {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      try t(s, d, "events")
      catch {
        case e: Exception
            if e.getMessage != null && e.getMessage.contains("NANOS") &&
              !s.conf.getOption(key).contains("true") =>
          s.conf.set(key, "true")
          t(s, d, "events")
      }
    }
    // The trailing [t] glob keeps the source's basePath at `d` (a real
    // directory) while matching exactly `events.parquet` — the driver
    // emits the table as a single FILE, which a glob-free path would
    // reject ("Option 'basePath' must be a directory").
    val stream = s.readStream.schema(raw.schema).parquet(s"$d/events.parque[t]")
    raw.schema("ts").dataType match {
      case LongType => stream.withColumn("ts", expr(nanosToMicrosSql("ts")))
      case TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case _ => stream
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
