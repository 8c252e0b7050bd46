package graft

import java.nio.file.Files

/** e22_disorder on CRAFTED out-of-order arrivals — the driver testdata is
  * globally event-time-ordered (its e22 result is the honest "bucket −1
  * only"), so the bucketing path is pinned here end-to-end through the
  * same query entry (temp events.parquet → Tables.events normalization →
  * histogram).
  */
class EventDisorderSpec extends SparkSpec {
  import spark.implicits._

  test("out-of-order arrivals land in their log2 lateness buckets") {
    val dir = Files.createTempDirectory("graft-disorder").toString
    // Arrival order = event_id. Within shard 'a': t=10s, then t=5s
    // (5000 ms late → bucket ⌊log2 5000⌋ = 12), then t=11s (in order),
    // then t=10.999s (1 ms late → bucket 0). Shard 'b': in order.
    Seq(
      (1L, "2026-01-01 00:00:10.0", 7L, "a", 1.0, "{}"),
      (2L, "2026-01-01 00:00:05.0", 7L, "a", 1.0, "{}"),
      (3L, "2026-01-01 00:00:11.0", 8L, "a", 1.0, "{}"),
      (4L, "2026-01-01 00:00:10.999", 8L, "a", 1.0, "{}"),
      (5L, "2026-01-01 00:00:01.0", 9L, "b", 1.0, "{}"),
      (6L, "2026-01-01 00:00:02.0", 9L, "b", 1.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts_s").cast("timestamp"))
      .drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("e22_disorder")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // buckets: -1 (in-order: events 1, 3, 5, 6), 0 (1 ms), 12 (5000 ms).
    assert(got == List((-1L, 4L, 0L), (0L, 1L, 1L), (12L, 1L, 5000L)), s"got $got")
  }
}
