package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

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

  /** NOTE on conf scope: `nanosAsLong` must be on at SCAN time (schema
    * resolution happens lazily, at plan/execute — a set-then-restore window
    * around this call would race the actual read), so the flag is
    * necessarily session-wide while events queries run. To keep the side
    * effect minimal it is set only when not already `true`, never toggled
    * back and forth per call; any caller that needs nanos-as-timestamp
    * semantics elsewhere must read in a separate session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!s.conf.getOption(key).contains("true")) s.conf.set(key, "true")
    val raw = t(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr(nanosToMicrosSql("ts")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
