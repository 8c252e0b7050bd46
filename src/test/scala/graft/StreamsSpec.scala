package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Structured Streaming parity: the streaming operators produce the same
  * results as their batch twins when fed the same rows.
  */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val fixture = Seq(
    Event(1, ts(0), 1L, "click", 1.0),
    Event(2, ts(5), 1L, "click", 2.0),
    Event(3, ts(50), 1L, "view", 3.0), // >30 min gap → new session
    Event(4, ts(10), 2L, "click", 4.0),
    Event(5, Timestamp.valueOf("2024-01-01 11:30:00"), 2L, "view", 5.0))

  test("streaming hourly window matches batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = Streams.hourlyCounts(mem.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    // With a 0s watermark and one batch, windows at/after the max event
    // time may be withheld in append mode; assert the emitted subset
    // matches the batch computation for the same windows.
    val got = spark.table("hourly")
      .select("hour", "event_type", "n", "total")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // batch twin: same logic without watermark semantics
    val exp = fixture.toDS().toDF()
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.subsetOf(exp), s"got=$got exp=$exp")
    assert(got.nonEmpty)
  }

  test("streaming OHLC bars match batch e15 aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = Streams.ohlcBars(mem.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("ohlc_bars")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("ohlc_bars")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSet
    // Batch twin on the same rows (same ordered-struct aggregation).
    val ms = unix_millis(col("ts"))
    val exp = fixture.toDS().toDF()
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("bar_start"),
        col("event_type"))
      .agg(
        min(struct(ms.as("ms"), col("event_id"), col("value"))).as("o"),
        max(struct(ms.as("ms"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("n"))
      .select(col("bar_start"), col("event_type"),
        round(col("o.value"), 4), round(col("high"), 4),
        round(col("low"), 4), round(col("c.value"), 4), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSet
    assert(got.subsetOf(exp), s"got=$got exp=$exp")
    assert(got.nonEmpty)
  }

  test("streaming heavy hitters carry Misra-Gries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    // Two micro-batches; k=8 > 4 distinct keys ⇒ MG is EXACT, so the
    // final complete-mode emission must equal whole-stream counts —
    // which only happens if the sketch buffer survived batch 1.
    mem.addData("a", "b", "a", "c")
    val q = Streams.heavyHittersStream(mem.toDF().toDF("t"), "t", k = 8)
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.apx"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    mem.addData("a", "d", "b")
    q.processAllAvailable(); q.stop()

    val got = spark.table("hh_stream")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L), s"got=$got")
  }

  test("streaming distinct sketches carry HLL and theta state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    mem.addData(("g1", 1L), ("g1", 2L), ("g2", 1L))
    val q = Streams.distinctSketchStream(mem.toDF().toDF("g", "k"), "g", "k")
      .select(col("g"), col("apx"),
        org.apache.spark.sql.graft.ThetaSketchAgg.thetaEstimate(col("theta"))
          .as("texact"))
      .writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    mem.addData(("g1", 2L), ("g1", 3L), ("g2", 9L)) // g1 {1,2,3}, g2 {1,9}
    q.processAllAvailable(); q.stop()
    val got = spark.table("sketch_stream")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // Exact regimes at these cardinalities (HLL coupon mode, theta below
    // nominal entries) — whole-stream distincts only appear if the
    // sketch buffers survived batch 1 inside the state store.
    assert(got == Map("g1" -> ((3L, 3.0)), "g2" -> ((2L, 2.0))), s"got=$got")
  }

  test("streaming quantile sketches carry KLL state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    mem.addData(("g1", 1.0), ("g1", 2.0), ("g2", 10.0))
    val q = Streams.quantileSketchStream(mem.toDF().toDF("g", "v"), "g", "v")
      .select(col("g"),
        org.apache.spark.sql.graft.KllStoreFns.kllValue(col("kll"), lit(0.5))
          .as("median"))
      .writeStream.format("memory").queryName("kll_stream")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    mem.addData(("g1", 3.0), ("g1", 4.0), ("g1", 5.0), ("g2", 20.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("kll_stream")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Exact regime: whole-stream medians (g1 over {1..5} → 3, g2 over
    // {10,20} → INCLUSIVE ⌈0.5·2⌉ = 1st value = 10) only appear if the
    // KLL buffers survived batch 1 inside the state store.
    assert(got == Map("g1" -> 3.0, "g2" -> 10.0), s"got=$got")
  }

  test("sketch aggregation state survives a query RESTART from checkpoint") {
    // The TypedImperativeAggregate buffers (HLL + theta) live in the
    // state store between micro-batches; a restart additionally
    // round-trips them through checkpoint recovery in a NEW query
    // instance — if serialize/deserialize were not self-contained, the
    // restarted query would resume from corrupt or empty state. File
    // source + checkpointLocation (MemoryStream cannot restart).
    val root = java.nio.file.Files.createTempDirectory("graft_sketch_ckpt")
    val in = s"$root/in"
    val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()
    def runOnce(name: String): Map[String, (Long, Double)] = {
      val stream = spark.readStream.schema("g STRING, k LONG").parquet(in)
      val q = Streams.distinctSketchStream(stream, "g", "k")
        .select(col("g"), col("apx"),
          org.apache.spark.sql.graft.ThetaSketchAgg.thetaEstimate(col("theta"))
            .as("texact"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").trigger(Trigger.ProcessingTime(0))
        .start()
      q.processAllAvailable(); q.stop()
      spark.table(name)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
    }
    Seq(("g1", 1L), ("g1", 2L), ("g2", 1L)).toDF("g", "k")
      .write.mode("append").parquet(in)
    assert(runOnce("sk_ckpt_a") == Map("g1" -> ((2L, 2.0)), "g2" -> ((1L, 1.0))))
    // New data lands while the query is DOWN; the restarted instance must
    // fold it into the recovered buffers.
    Seq(("g1", 2L), ("g1", 3L), ("g2", 9L)).toDF("g", "k")
      .write.mode("append").parquet(in)
    assert(runOnce("sk_ckpt_b") == Map("g1" -> ((3L, 3.0)), "g2" -> ((2L, 2.0))),
      "restarted query did not recover sketch state from the checkpoint")
  }

  test("streaming PageRank materialization converges to batch PageRank") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    @volatile var last: org.apache.spark.sql.DataFrame = null
    val q = Streams.pageRankStream(mem.toDF(), beta = 0.85, iterations = 4) {
      (_, ranks) => last = ranks
    }
    mem.addData((1L, 2L), (2L, 3L))
    q.processAllAvailable()
    mem.addData((3L, 1L), (1L, 3L), (4L, 1L), (1L, 2L)) // includes a duplicate edge
    q.processAllAvailable(); q.stop()

    val got = last.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(last)
    val exp = graft.graph.PageRank.fixedIterations(
        spark,
        Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L)).toDF("src", "dst"),
        0.85, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, r) => assert(math.abs(got(id) - r) < 1e-12, s"id=$id") }
  }

  test("streaming sessionization matches batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val gapMs = 30L * 60 * 1000
    val q = Streams.sessionize(mem.toDS(), gapMs, withTimeouts = false)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    // Sessions still open (no timeout fired in one batch) are not emitted;
    // emitted sessions must match the batch twin's CLOSED subset exactly.
    val got = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batchAll = Streams.sessionizeBatch(fixture.toDS(), gapMs)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.subsetOf(batchAll), s"streaming emitted a session batch does not have: ${got -- batchAll}")
    // user 1 has two sessions, the first of which must have closed.
    assert(got.exists(s => s._1 == 1L && s._3 == 2L && math.abs(s._4 - 3.0) < 1e-12))
  }

  test("builtin session_window twin: batch = sessionizeBatch groups, stream = batch subset") {
    val gapMs = 30L * 60 * 1000
    // Batch parity: same groups (user, start, n, value) as the island
    // formulation — including the gap convention (diff ≤ gap merges).
    val batch = Streams.sessionWindows(fixture.toDF(), gapMs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val island = Streams.sessionizeBatch(fixture.toDS(), gapMs)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), math.rint(r.getDouble(3) * 100) / 100))
      .toSet
    assert(batch == island, s"builtin=$batch island=$island")
    // Boundary pin: events exactly gapMs apart must share a session
    // (the gapMs+1 builtin gap under test).
    val boundary = Seq(
      Event(1, ts(0), 9L, "click", 1.0),
      Event(2, new Timestamp(ts(0).getTime + gapMs), 9L, "click", 2.0))
    val b = Streams.sessionWindows(boundary.toDF(), gapMs).collect()
    assert(b.length == 1 && b.head.getLong(2) == 2L,
      s"boundary events split: ${b.mkString(", ")}")
    // Streaming: the same groupBy as a stream; with a 0s watermark in
    // append mode, emitted sessions must be a subset of the batch ones.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = Streams.sessionWindows(mem.toDF(), gapMs, watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("session_windows")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("session_windows")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.subsetOf(batch), s"stream emitted unknown sessions: ${got -- batch}")
    assert(got.nonEmpty, "stream emitted nothing despite closed sessions")
  }

  test("file-source streaming over events parquet matches batch hourly counts") {
    // Real readStream file source via Tables.eventsStream: the imposed
    // schema (streaming never infers) and the ts normalization are both
    // derived from the file's actual physical encoding, so this parity
    // test tracks driver testdata regeneration exactly like batch does.
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Tables.eventsStream(spark, dir.toString)
    val q = stream
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("file_hourly")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val exp = SparkEntry.queries("e1_hour_window")(spark, Sf001)
      .select("hour", "event_type", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == exp, s"stream/batch mismatch: ${(got -- exp) ++ (exp -- got)}")
  }

  test("streaming dedup drops later duplicates, keeps first arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // event_id 1 appears three times (twice in batch 1, once in batch 2);
    // event_id 2 twice; 3 once.
    mem.addData(
      Event(1, ts(0), 1L, "click", 1.0),
      Event(1, ts(1), 1L, "click", 99.0),
      Event(2, ts(2), 2L, "view", 2.0))
    // Default trigger (not AvailableNow): the query must stay live to
    // consume the second batch added below.
    val q = Streams.dedupByKey(mem.toDF(), Seq("event_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData(
      Event(1, ts(3), 1L, "click", 98.0),
      Event(2, ts(4), 2L, "view", 97.0),
      Event(3, ts(5), 3L, "view", 3.0))
    q.processAllAvailable(); q.stop()

    val got = spark.table("dedup")
      .select("event_id", "value").as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === 1.0) // the FIRST arrival survived
    assert(got(2L) === 2.0)
    assert(got(3L) === 3.0)
  }

  test("streaming gap report over events parquet matches batch e20") {
    // File-source stream (Tables.eventsStream, encoding-proof) through
    // the keyed-state gap detector; the WHOLE file arrives as micro-
    // batches, so the emitted gaps must equal the batch LAG window's.
    val dir = java.nio.file.Files.createTempDirectory("events_gap_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Tables.eventsStream(spark, dir.toString)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Streams.Event]
    val q = Streams.gapReport(stream, gapMs = 3600000L)
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("gap_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exp = SparkEntry.queries("e20_gap_report")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == exp,
      s"stream/batch gap mismatch: ${(got -- exp).take(3)} / ${(exp -- got).take(3)}")
  }

  test("streaming exact dedup over sf0.01 documents matches batch d1 (scale parity)") {
    // File-source stream over the real documents table, staged TWICE into
    // the source directory so every content hash arrives (at least) twice
    // — the streaming twin of d1_dedup_exact at data scale, not a toy
    // fixture. Event time is synthesized from doc_id (the table has no
    // timestamp column), offset 1h past epoch: a ts exactly AT the
    // initial watermark (epoch 0) is classed late and silently dropped.
    // All rows sit inside one watermark horizon, so the op must emit
    // exactly one representative per distinct content hash.
    val dir = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf01/documents.parquet"),
      dir.resolve("documents_a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf01/documents.parquet"),
      dir.resolve("documents_b.parquet"))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(dir.toString)
      .withColumn("h", md5(col("text")))
      .withColumn("ts", expr("timestamp_micros(doc_id + 3600000000)"))
    val q = Streams.dedupByKey(stream, Seq("h"), watermark = "1 hour")
      .writeStream.format("memory").queryName("docs_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("docs_dedup")
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val batch = graft.dedup.Dedup.exact(
        Tables.documents(spark, Sf01), "doc_id", "text")
      .as[(String, Long, Long)].collect()
    // one surviving row per distinct hash (every hash arrived >= twice),
    // hash set identical to the batch dedup's
    assert(got.values.forall(_ == 1L), "streaming dedup emitted a duplicate")
    assert(got.keySet === batch.map(_._1).toSet)
  }

  test("streaming latest-snapshot matches batch e12 over sf0.001 events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, Sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streams.Event].collect()
    val mem = MemoryStream[Streams.Event]
    // Two micro-batches split mid-corpus: the snapshot must survive state
    // handoff between batches, not just a single-batch reduction.
    val (b1, b2) = rows.splitAt(rows.length / 2)
    mem.addData(b1.toIndexedSeq)
    val q = Streams.latestSnapshot(mem.toDS())
      .writeStream.format("memory").queryName("snap")
      .outputMode("update").start()
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable(); q.stop()

    // Update mode re-emits a key on every change — the LAST emission per
    // key is the live snapshot value.
    val streamed = spark.table("snap")
      .groupBy(col("user_id"))
      .agg(max(struct(col("last_ms"), col("last_event"), col("last_type"), col("last_value"))).as("m"))
      .select(col("user_id"), col("m.last_event"), col("m.last_type"),
        col("m.last_ms"), round(col("m.last_value"), 4).as("last_value"))
      .as[(Long, Long, String, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("e12_latest_snapshot")(spark, Sf001)
      .as[(Long, Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming curation matches the batch stage composition on sf0.001") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.text.TextFns
    val docs = Tables.documents(spark, Sf001)
    val bench = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
      .select(explode(TextFns.shingles(col("text"), 4)).as("s"))
      .distinct().as[String].collect()
    val corpus = docs.filter(pmod(col("doc_id"), lit(25)) =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1) // arrival in id order → first arrival = min id

    val mem = MemoryStream[(Long, String, Timestamp)]
    val (b1, b2) = corpus.map { case (id, t) => (id, t, ts(0)) }.splitAt(corpus.length / 2)
    mem.addData(b1.toIndexedSeq)
    val q = Streams.curateStream(
      mem.toDF().toDF("doc_id", "text", "ts"), bench, n = 4)
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("curated").select("doc_id").as[Long].collect().toSet

    // Batch twin, stage for stage (min-id representative per content hash).
    val keep = docs.filter(pmod(col("doc_id"), lit(25)) =!= 0)
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val batch = docs.join(keep, "doc_id")
      .filter(
        TextFns.tokenCount(col("text")) >= 15 &&
          TextFns.punctRatio(col("text")) <= 0.2 &&
          TextFns.stopwordRatio(col("text")) <= 0.6 &&
          !arrays_overlap(TextFns.shingles(col("text"), 4), lit(bench)))
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream band join matches batch RangeJoin pairs") {
    implicit val sqlCtx = spark.sqlContext
    // Covers: tie (1,2 same ts — strictly-after excludes), in-band pairs,
    // out-of-band gap (3→4 is 15 min > 10-min band), per-key isolation.
    val rows = Seq(
      Event(1, ts(0), 1L, "click", 1.0),
      Event(2, ts(0), 1L, "click", 1.0),
      Event(3, ts(5), 1L, "view", 1.0),
      Event(4, ts(20), 1L, "view", 1.0),
      Event(5, ts(8), 2L, "view", 1.0),
      Event(6, ts(12), 2L, "view", 1.0))
    val memL = MemoryStream[Event]; val memR = MemoryStream[Event]
    memL.addData(rows: _*); memR.addData(rows: _*)
    val q = Streams.bandJoinStream(memL.toDF(), memR.toDF(), bandSeconds = 600)
      .writeStream.format("memory").queryName("bandjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("bandjoin")
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet

    val ev = rows.toDS().toDF()
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
    val want = graft.ops.RangeJoin.bandPairs(
        ev.select(col("user_id"), col("event_id").as("l_id"), col("ms").as("l_ms")),
        ev.select(col("user_id"), col("event_id").as("r_id"), col("ms").as("r_ms")),
        key = "user_id", lOrd = "l_ms", rOrd = "r_ms", band = 600000L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want === Set((1L, 3L), (2L, 3L), (5L, 6L)))
  }

  test("stream-stream interval overlap matches batch overlapPairs") {
    implicit val sqlCtx = spark.sqlContext
    // Covers: containment (20 ⊃ 21), partial overlap (20/22), touching
    // endpoints (half-open: 20 ends 10:10 exactly when 23 starts — no
    // overlap), disjoint (24), and an over-long interval (25, > maxLen)
    // that the stream drops on both sides.
    def iv(id: Long, fromMin: Int, toMin: Int): (Long, Timestamp, Timestamp) =
      (id, ts(fromMin), ts(toMin))
    val lRows = Seq(iv(20, 0, 10), iv(24, 40, 45), iv(25, 0, 59))
    val rRows = Seq(iv(21, 2, 8), iv(22, 5, 15), iv(23, 10, 20))
    val memL = MemoryStream[(Long, Timestamp, Timestamp)]
    val memR = MemoryStream[(Long, Timestamp, Timestamp)]
    memL.addData(lRows: _*); memR.addData(rRows: _*)
    val q = Streams.overlapStream(
        memL.toDF().toDF("id", "start", "end"),
        memR.toDF().toDF("id", "start", "end"),
        maxLenSeconds = 1200)
      .writeStream.format("memory").queryName("overlapstream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("overlapstream")
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet

    // Batch twin on the SAME (length-bounded) rows, epoch-ms ordinals.
    def ms(rows: Seq[(Long, Timestamp, Timestamp)], p: String) =
      rows.toDF("id", "start", "end")
        .filter(unix_millis(col("end")) - unix_millis(col("start")) <= 1200000L)
        .select(col("id").as(s"${p}_id"),
          unix_millis(col("start")).as(s"${p}_start"),
          unix_millis(col("end")).as(s"${p}_end"))
    val want = graft.ops.IntervalJoin.overlapPairs(
        ms(lRows, "l"), ms(rRows, "r"),
        "l_start", "l_end", "r_start", "r_end", width = 600000L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want === Set((20L, 21L), (20L, 22L)))
  }

  test("streaming as-of enrichment matches batch AsOfJoin across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def t(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val memL = MemoryStream[(Long, Timestamp, Long)] // (k, ts, id)
    val memR = MemoryStream[(Long, Timestamp, Long)] // (k, ts, v)
    val q = Streams.asOfStream(
        memL.toDF().toDF("k", "ts", "id"),
        memR.toDF().toDF("k", "ts", "v"),
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("asofstream")
      .outputMode("append").start()
    // Batch 1: early rows. Watermark is still 0 → nothing emits yet.
    memL.addData((1L, t("09:55"), 1L), (1L, t("10:00"), 2L), (2L, t("10:10"), 4L))
    memR.addData((1L, t("10:00"), 100L), (2L, t("10:05"), 200L))
    q.processAllAvailable()
    // Batch 2: watermark = min(10:10, 10:05) = 10:05 → ids 1 (no right at
    // or before 09:55 → null) and 2 (inclusive match at 10:00) emit; the
    // equal-t rights (101 vs 150) land for the later tie-rule check.
    memL.addData((1L, t("10:30"), 3L), (3L, t("10:15"), 5L))
    memR.addData((1L, t("10:20"), 101L), (1L, t("10:20"), 150L))
    q.processAllAvailable()
    // Batch 3: per-key flush sentinels; watermark = min(10:30, 10:20) =
    // 10:20 → id 4 (→200) and id 5 (k=3 has no earlier right → null).
    memL.addData((99L, t("11:00"), 99L))
    memR.addData((1L, t("11:00"), 888L), (2L, t("11:00"), 888L), (3L, t("11:00"), 888L))
    q.processAllAvailable()
    // Batch 4: watermark = 11:00 → id 3 ripens; among the equal-t 10:20
    // rights the LARGEST v (150) must win, matching the batch tie rule.
    memR.addData((1L, t("11:30"), 889L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("asofstream")
      .filter(col("id") <= 5L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

    // Batch twin over the SAME rows (sentinels included — they sit after
    // every left timestamp, so the backward as-of ignores them).
    val lRows = Seq(
      (1L, t("09:55"), 1L), (1L, t("10:00"), 2L), (2L, t("10:10"), 4L),
      (1L, t("10:30"), 3L), (3L, t("10:15"), 5L), (99L, t("11:00"), 99L))
    val rRows = Seq(
      (1L, t("10:00"), 100L), (2L, t("10:05"), 200L),
      (1L, t("10:20"), 101L), (1L, t("10:20"), 150L),
      (1L, t("11:00"), 888L), (2L, t("11:00"), 888L), (3L, t("11:00"), 888L),
      (1L, t("11:30"), 889L))
    val want = graft.ops.AsOfJoin.asOf(
        lRows.toDF("k", "ts", "id")
          .select(col("k"), unix_millis(col("ts")).as("t"), col("id")),
        rRows.toDF("k", "ts", "v")
          .select(col("k"), unix_millis(col("ts")).as("t"), col("v")))
      .filter(col("id") <= 5L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got === want, s"got=$got want=$want")
    assert(got === Map(
      1L -> None, 2L -> Some(100L), 3L -> Some(150L),
      4L -> Some(200L), 5L -> None))
  }

  test("incremental out-degrees update across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = Streams.incrementalOutDegrees(mem.toDF().toDF("src", "dst"))
      .writeStream.format("memory").queryName("degrees")
      .outputMode("complete").start()
    mem.addData((1L, 2L), (1L, 3L), (2L, 3L))
    q.processAllAvailable()
    val after1 = spark.table("degrees")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after1 == Map(1L -> 2L, 2L -> 1L))
    // second batch only adds edges; state carries over
    mem.addData((1L, 4L), (3L, 1L))
    q.processAllAvailable(); q.stop()
    val after2 = spark.table("degrees")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after2 == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("nanos→micros conversion floors for negative timestamps") {
    val micros = spark.sql(
      s"""SELECT unix_micros(${Tables.nanosToMicrosSql("ts")}) AS u FROM VALUES
         |  (CAST(1500 AS LONG)), (CAST(-1500 AS LONG)),
         |  (CAST(-1000 AS LONG)), (CAST(0 AS LONG)) AS v(ts)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(micros == Seq(1L, -2L, -1L, 0L), s"got $micros")
  }

  test("streaming decontamination matches batch contamination pairs") {
    implicit val sqlCtx = spark.sqlContext
    val benchDocs = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val trainRows = Seq(
      (1L, "something about the quick brown fox appearing"),
      (2L, "entirely unrelated training content here"),
      (3L, "again the quick brown fox jumps elsewhere"))
    val benchSh = graft.dedup.Dedup
      .shingleIndex(benchDocs, "doc_id", "text", n = 4)
      .select(col("id").as("bench_id"), col("s"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(trainRows: _*)
    val q = Streams.decontaminateStream(
        mem.toDF().toDF("doc_id", "text"), benchSh, "doc_id", "text", n = 4)
      .writeStream.format("memory").queryName("decon")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("decon")
      .select("train_id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    val want = graft.dedup.Dedup.contamination(
        trainRows.toDF("doc_id", "text"), benchDocs, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(want.map(_._1) === Set(1L, 3L)) // doc 2 is clean
  }

  test("flag twins with an event-time watermark emit identical rows (bounded state)") {
    // windowedGroup's parity contract: every row of a key carries the
    // SAME ts (it rides the key's input row), so grouping by
    // (event-time window, key) partitions exactly as the bare key does
    // — the watermark only adds state eviction. Run each flag twin
    // twice on identical input, with and without eventTime, and pin
    // row equality.
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def drain(df: org.apache.spark.sql.DataFrame, name: String)
        : org.apache.spark.sql.DataFrame = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      spark.table(name)
    }

    // decontaminate
    val benchSh = graft.dedup.Dedup.shingleIndex(
        Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text"),
        "doc_id", "text", 4)
      .select(col("id").as("bench_id"), col("s"))
    val trainRows = Seq(
      (1L, "something about the quick brown fox appearing"),
      (3L, "again the quick brown fox jumps elsewhere"))
    val memD0 = MemoryStream[(Long, String)]
    memD0.addData(trainRows: _*)
    val memD1 = MemoryStream[(Long, String, java.sql.Timestamp)]
    memD1.addData(trainRows.map { case (i, t) => (i, t, t0) }: _*)
    val d0df = drain(Streams.decontaminateStream(
      memD0.toDF().toDF("doc_id", "text"), benchSh, "doc_id", "text", 4),
      "wm_d0")
    val d0 = d0df.as[(Long, Long, Long)].collect().toSet
    val d1df = drain(Streams.decontaminateStream(
      memD1.toDF().toDF("doc_id", "text", "ts"), benchSh, "doc_id", "text", 4,
      eventTime = Some(("ts", "10 minutes"))), "wm_d1")
    // Schema parity, not just row parity: the internal window key must
    // be projected away, so positional/schema-sensitive consumers see
    // the documented (train_id, bench_id, n_shared) either way.
    assert(d1df.columns.toSeq === d0df.columns.toSeq,
      s"decontaminate schema diverges with eventTime: ${d1df.columns.toSeq}")
    val d1 = d1df.as[(Long, Long, Long)].collect().toSet
    assert(d1 == d0 && d0.nonEmpty, s"decontaminate wm parity: $d1 vs $d0")
    // windowLen decoupled from the watermark delay (short windows =
    // fine-grained eviction, long delay = generous lateness horizon):
    // output is invariant because a key's rows share one ts.
    val memD2 = MemoryStream[(Long, String, java.sql.Timestamp)]
    memD2.addData(trainRows.map { case (i, t) => (i, t, t0) }: _*)
    val d2 = drain(Streams.decontaminateStream(
      memD2.toDF().toDF("doc_id", "text", "ts"), benchSh, "doc_id", "text", 4,
      eventTime = Some(("ts", "10 minutes")),
      windowLen = Some("30 seconds")), "wm_d2")
      .as[(Long, Long, Long)].collect().toSet
    assert(d2 == d0, s"decontaminate windowLen parity: $d2 vs $d0")

    // near-dup (stored relations derived exactly as DedupStore persists)
    val oldDocs = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val oldSh = graft.dedup.Dedup.shingleIndex(oldDocs, "doc_id", "text", 3)
    val oldBands = graft.dedup.Dedup.minhashBanded(oldSh, 16, 4)
    val fresh = Seq((20L, "alpha beta gamma delta epsilon zeta eta iota"))
    val memN0 = MemoryStream[(Long, String)]
    memN0.addData(fresh: _*)
    val memN1 = MemoryStream[(Long, String, java.sql.Timestamp)]
    memN1.addData(fresh.map { case (i, t) => (i, t, t0) }: _*)
    val n0 = drain(Streams.nearDupStream(memN0.toDF().toDF("doc_id", "text"),
      oldBands, oldSh, "doc_id", "text", 3, 16, 4, 0.5), "wm_n0")
      .as[(Long, Long, Double)].collect().toSet
    val n1 = drain(Streams.nearDupStream(
      memN1.toDF().toDF("doc_id", "text", "ts"),
      oldBands, oldSh, "doc_id", "text", 3, 16, 4, 0.5,
      eventTime = Some(("ts", "10 minutes"))), "wm_n1")
      .select("train_id", "old_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(n1 == n0 && n0.nonEmpty, s"nearDup wm parity: $n1 vs $n0")

    // hamming
    val storedFp = Seq((1L, 0xF0F0L), (2L, 0x1234L)).toDF("id", "fp")
    val freshFp = Seq((30L, 0xF0F1L))
    val memH0 = MemoryStream[(Long, Long)]
    memH0.addData(freshFp: _*)
    val memH1 = MemoryStream[(Long, Long, java.sql.Timestamp)]
    memH1.addData(freshFp.map { case (i, f) => (i, f, t0) }: _*)
    val h0 = drain(Streams.hammingDupStream(
      memH0.toDF().toDF("id", "fp"), storedFp, 2), "wm_h0")
      .as[(Long, Long, Long)].collect().toSet
    val h1 = drain(Streams.hammingDupStream(
      memH1.toDF().toDF("id", "fp", "ts"), storedFp, 2,
      eventTime = Some(("ts", "10 minutes"))), "wm_h1")
      .select("id", "dup_of", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(h1 == h0 && h0.nonEmpty, s"hamming wm parity: $h1 vs $h0")

    // semantic
    val store = Seq((1L, Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v"),
        graft.sim.IndexStore.cellOf(col("v"), 4).as("cell"))
    val freshV = Seq((40L, Seq(0.9, 0.9, 0.9, 0.9)))
    val memS0 = MemoryStream[(Long, Seq[Double])]
    memS0.addData(freshV: _*)
    val memS1 = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
    memS1.addData(freshV.map { case (i, v) => (i, v, t0) }: _*)
    val s0 = drain(Streams.semDedupStream(
      memS0.toDF().toDF("vec_id", "v"), store, 4, 0.95), "wm_s0")
      .as[(Long, Long, Double)].collect().toSet
    val s1 = drain(Streams.semDedupStream(
      memS1.toDF().toDF("vec_id", "v", "ts"), store, 4, 0.95,
      eventTime = Some(("ts", "10 minutes"))), "wm_s1")
      .select("vec_id", "dup_of", "dup_cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(s1 == s0 && s0.nonEmpty, s"semDedup wm parity: $s1 vs $s0")
  }

  test("streaming near-dup vs stored index matches DedupStore cross-batch pairs") {
    implicit val sqlCtx = spark.sqlContext
    val (n, bnd, rpb, thr) = (3, 16, 4, 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_stream").toString
    val docs = Tables.documents(spark, Sf001).select(col("doc_id"), col("text"))
    val old = docs.filter(col("doc_id") < 300)
    val freshRows = docs.filter(col("doc_id") >= 300)
      .as[(Long, String)].collect().toSeq
    graft.dedup.DedupStore.save(old, "doc_id", "text", n, bnd, rpb, s"$dir/ix")
    val mem = MemoryStream[(Long, String)]
    mem.addData(freshRows: _*)
    val q = Streams.nearDupStream(
        mem.toDF().toDF("doc_id", "text"),
        spark.read.parquet(s"$dir/ix/bands"),
        spark.read.parquet(s"$dir/ix/shingles"),
        "doc_id", "text", n, bnd, rpb, thr)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("neardup")
      .as[(Long, Long, Double)].collect().toSet
    // Batch truth: the persisted-index probe, restricted to CROSS pairs
    // (within-batch dup handling is curateStream stage 1, not this op),
    // reoriented to (new, old).
    val want = graft.dedup.DedupStore.searchNew(
        spark, s"$dir/ix", freshRows.toDF("doc_id", "text"),
        "doc_id", "text", n, bnd, rpb, thr)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a < 300) != (b < 300) }
      .map { case (a, b, j) => if (a >= 300) (a, b, j) else (b, a, j) }
      .toSet
    assert(got == want,
      s"got ${got.size} vs want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "split yields no cross-batch near-dups")
  }

  test("streaming release front-door: gate + near-dup flags match the p22 increment's stages") {
    // The r13 #8 composition: curate front-door = classifier gate (the
    // store's current weights as plan literals) -> near-dup flags vs the
    // accepted corpus through the persisted DedupStore relations — the
    // live twin of ReleaseStore.increment steps 1–2, pinned against the
    // batch spelling of exactly those stages.
    implicit val sqlCtx = spark.sqlContext
    val P = graft.release.ReleaseParams()
    val dir = java.nio.file.Files.createTempDirectory("graft_frontdoor").toString
    val docs = Tables.documents(spark, Sf001).select(col("doc_id"), col("text"))
    val stored = docs.filter(col("doc_id") < 300)
    val batch = docs.filter(col("doc_id") >= 300)
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
      graft.release.ReleaseStore.init(spark, stored, "doc_id", "text", P, s"$dir/st"))
    // Retrain-on-arrival, exactly as increment's gate: append the
    // batch's statistics, trainStored = bit-identical union weights.
    val ml = graft.ml.LinearClassifier
    val feat = ml.features(batch, "doc_id", "text", P.dims)
    val lab = ml.weakLabels(batch, "doc_id", "text")
    graft.ml.ClassifierStore.append(feat, lab, s"$dir/st/classifier")
    val w = graft.ml.ClassifierStore.trainStored(
      spark, s"$dir/st/classifier", P.dims, P.iters)

    val mem = MemoryStream[(Long, String)]
    mem.addData(batch.as[(Long, String)].collect().toSeq: _*)
    val q = Streams.releaseFrontDoorStream(
        mem.toDF().toDF("doc_id", "text"), w, P.dims,
        spark.read.parquet(s"$dir/st/neardup/bands"),
        spark.read.parquet(s"$dir/st/neardup/shingles"),
        "doc_id", "text", P.n, P.bands, P.rowsPerBand, P.threshold)
      .writeStream.format("memory").queryName("frontdoor")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("frontdoor")
      .as[(Long, Long, Double)].collect().toSet

    // Batch truth, stage by stage: the increment's gate decisions...
    val keptB = batch.join(
        ml.score(feat, lab, w).filter(col("margin") > 0).select(col("doc_id")),
        "doc_id")
      .select(col("doc_id"), col("text"))
    // ...then its near-dup probe's STORED arm (within-batch pairs are
    // dropDuplicatesWithinWatermark's job, exactly as nearDupStream).
    val searched = graft.dedup.DedupStore.searchNew(
      spark, s"$dir/st/neardup", keptB, "doc_id", "text",
      P.n, P.bands, P.rowsPerBand, P.threshold)
    val want = searched
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a < 300) != (b < 300) }
      .map { case (a, b, j) => if (a >= 300) (a, b, j) else (b, a, j) }
      .toSet
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(searched)
    assert(got == want,
      s"front-door flags diverged from the increment's stages: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "no stored near-dup among gate survivors; fixture too weak")
    // The gate is actually wired in (on this corpus every near-dup
    // batch doc happens to pass the real gate, so the restriction
    // can't bite above; margin parity itself is pinned by the
    // classifierScoreStream test): a reject-all model (bias -1, zero
    // bucket weights -> margin = -1 for every doc) must flag NOTHING.
    val rejectAll = Seq((-1L, -1L)).toDF("dim", "w")
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData(batch.as[(Long, String)].collect().toSeq: _*)
    val q2 = Streams.releaseFrontDoorStream(
        mem2.toDF().toDF("doc_id", "text"), rejectAll, P.dims,
        spark.read.parquet(s"$dir/st/neardup/bands"),
        spark.read.parquet(s"$dir/st/neardup/shingles"),
        "doc_id", "text", P.n, P.bands, P.rowsPerBand, P.threshold)
      .writeStream.format("memory").queryName("frontdoor_closed")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("frontdoor_closed").isEmpty,
      "a reject-all gate still let near-dup flags through; the gate is not wired into the composition")
  }

  test("end-to-end streaming front-door: released rows match ReleaseStore.increment on the same batch") {
    // The full live twin of p22: gate -> near-dup drop -> span excision
    // -> split as ONE streaming query, parity-pinned against the batch
    // increment ITSELF (not just its stages) on the same batch + store.
    // Fixture is constructed inside the twin's documented scope: no
    // within-batch near-dups/spans (dropDuplicatesWithinWatermark's
    // job) and no dethroning (a stream cannot re-elect canonicals).
    implicit val sqlCtx = spark.sqlContext
    val P = graft.release.ReleaseParams()
    val dir = java.nio.file.Files.createTempDirectory("graft_frontdoor_e2e").toString
    def toks(ns: String, k: Int): Vector[String] =
      (0 until k).map { i =>
        if (i % 3 == 0) graft.text.TextFns.Stopwords(i / 3 % 7)
        else s"${ns}x$i"
      }.toVector
    def mkDocs(rows: Seq[(Long, Vector[String])]) =
      rows.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
    def negDocs(base: Long, k: Int): Seq[(Long, Vector[String])] =
      (0 until k).map(i =>
        (base + i, (0 until 24).map(j => s"neg${base + i}q$j").toVector))
    val d20 = toks("c20", 36) // released span source
    val d30 = toks("c30", 30) // released near-dup source
    val storedRows = Seq(20L -> d20, 30L -> d30) ++
      (0 until 6).map(i => (40L + i) -> toks(s"f$i", 21)) ++ negDocs(60, 6)
    // 400 = SHORTER near-dup of stored 30: loses the election in the
    // increment, near-dup-dropped in the stream — same outcome.
    val d400 = d30.take(26)
    // 402 = novel doc carrying a span of the released 20: excised.
    val d402 = toks("b402", 15) ++ d20.slice(6, 15) ++ toks("b402z", 9)
    // 404 = novel doc: released uncut, rep = self.
    val d404 = toks("b404", 24)
    val batchRows = Seq(400L -> d400, 402L -> d402, 404L -> d404) ++
      negDocs(420, 3)
    val stored = mkDocs(storedRows)
    val batch = mkDocs(batchRows)
    // Two identical stores: A feeds the stream's static relations (and
    // takes the manual stat append that reproduces increment's retrain);
    // B takes the real increment — so neither run sees the other's
    // appends.
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
      graft.release.ReleaseStore.init(spark, stored, "doc_id", "text", P, s"$dir/a"))
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
      graft.release.ReleaseStore.init(spark, stored, "doc_id", "text", P, s"$dir/b"))
    val ml = graft.ml.LinearClassifier
    val feat = ml.features(batch, "doc_id", "text", P.dims)
    val lab = ml.weakLabels(batch, "doc_id", "text")
    graft.ml.ClassifierStore.append(feat, lab, s"$dir/a/classifier")
    val w = graft.ml.ClassifierStore.trainStored(
      spark, s"$dir/a/classifier", P.dims, P.iters)
    // Fixture guards: the scenario docs pass the retrained gate; the
    // ballast negatives fail it (so the gate is a real decision).
    val kept = ml.score(feat, lab, w).filter(col("margin") > 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(Set(400L, 402L, 404L).subsetOf(kept), s"gate rejected a scenario doc: $kept")
    assert(!kept.exists(_ >= 420L), s"a ballast negative passed the gate: $kept")

    val mem = MemoryStream[(Long, String)]
    mem.addData(batchRows.map { case (id, ts) => (id, ts.mkString(" ")) }: _*)
    val q = Streams.releaseFrontDoorStream(
        mem.toDF().toDF("doc_id", "text"), w, P.dims,
        spark.read.parquet(s"$dir/a/neardup/bands"),
        spark.read.parquet(s"$dir/a/neardup/shingles"),
        spark.read.parquet(s"$dir/a/spans/grams"),
        "doc_id", "text", P.n, P.bands, P.rowsPerBand, P.threshold,
        P.minTokens)
      .writeStream.format("memory").queryName("frontdoor_e2e")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("frontdoor_e2e")
      .as[(Long, Long, String, String)].collect().toSet

    val inc = graft.release.ReleaseStore.increment(
      spark, batch, "doc_id", "text", P, s"$dir/b")
    val want = inc.select(col("doc_id"), col("rep_id"), col("split"),
        col("text_dedup"))
      .as[(Long, Long, String, String)].collect().toSet
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(inc)
    assert(got == want,
      s"streamed release diverged from the increment: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // The scenario really exercised every stage.
    assert(!want.exists(_._1 == 400L), "400 was not near-dup dropped; fixture too weak")
    val t402 = want.find(_._1 == 402L).get._4
    assert(t402 != d402.mkString(" "), "402 kept its copied span; the span stage never fired")
    assert(want.find(_._1 == 404L).get._4 == d404.mkString(" "),
      "the novel doc 404 was altered")

    // The WATERMARKED variant (eventTime bounds the per-doc aggregation
    // state — the long-running-query shape) releases the identical rows:
    // the window key partitions docs exactly as the bare doc_id key.
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val memW = MemoryStream[(Long, String, java.sql.Timestamp)]
    memW.addData(batchRows.map { case (id, ts) =>
      (id, ts.mkString(" "), t0) }: _*)
    val qw = Streams.releaseFrontDoorStream(
        memW.toDF().toDF("doc_id", "text", "ts"), w, P.dims,
        spark.read.parquet(s"$dir/a/neardup/bands"),
        spark.read.parquet(s"$dir/a/neardup/shingles"),
        spark.read.parquet(s"$dir/a/spans/grams"),
        "doc_id", "text", P.n, P.bands, P.rowsPerBand, P.threshold,
        P.minTokens, eventTime = Some(("ts", "10 minutes")))
      .writeStream.format("memory").queryName("frontdoor_e2e_wm")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    qw.processAllAvailable(); qw.stop()
    val gotW = spark.table("frontdoor_e2e_wm")
      .as[(Long, Long, String, String)].collect().toSet
    assert(gotW == want,
      s"watermarked front-door diverged from the increment: " +
        s"missing=${(want -- gotW).take(3)} extra=${(gotW -- want).take(3)}")
  }

  test("end-to-end streaming front-door WITH the semantic stage matches increment on a vec-initialized store") {
    // The fourth stage composed in: a doc's vector rides on its stream
    // row, probes the persisted IVF store's sign cell, and an ε-hit
    // drops the doc — increment step 5b's stored arm. Docs without a
    // vector pass unprobed (the increment's own rule).
    implicit val sqlCtx = spark.sqlContext
    val P = graft.release.ReleaseParams()
    val dir = java.nio.file.Files.createTempDirectory("graft_frontdoor_sem").toString
    def toks(ns: String, k: Int): Vector[String] =
      (0 until k).map { i =>
        if (i % 3 == 0) graft.text.TextFns.Stopwords(i / 3 % 7)
        else s"${ns}x$i"
      }.toVector
    def mkDocs(rows: Seq[(Long, Vector[String])]) =
      rows.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
    def negDocs(base: Long, k: Int): Seq[(Long, Vector[String])] =
      (0 until k).map(i =>
        (base + i, (0 until 24).map(j => s"neg${base + i}q$j").toVector))
    val v1 = Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    val vNear = v1.map(_ * 0.9) // cosine 1.0 with v1, same sign cell
    val vFar = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0) // its own cell
    val storedRows = Seq(50L -> toks("c50", 30)) ++
      (0 until 6).map(i => (40L + i) -> toks(s"f$i", 21)) ++ negDocs(60, 6)
    // 406 = text-novel doc whose VECTOR duplicates stored 50's: dropped
    // by the semantic stage alone. 404 = novel text + novel vector:
    // released. 402 = no vector at all: released, never probed.
    val batchRows = Seq(402L -> toks("b402", 24), 404L -> toks("b404", 24),
      406L -> toks("b406", 24)) ++ negDocs(420, 3)
    val stored = mkDocs(storedRows)
    val batch = mkDocs(batchRows)
    val storedVecs = Seq((50L, v1)).toDF("vec_id", "v")
    val batchVecs = Seq((406L, vNear), (404L, vFar)).toDF("vec_id", "v")
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
      graft.release.ReleaseStore.init(spark, stored, "doc_id", "text", P,
        s"$dir/a", vecs = Some(storedVecs)))
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
      graft.release.ReleaseStore.init(spark, stored, "doc_id", "text", P,
        s"$dir/b", vecs = Some(storedVecs)))
    val ml = graft.ml.LinearClassifier
    val feat = ml.features(batch, "doc_id", "text", P.dims)
    val lab = ml.weakLabels(batch, "doc_id", "text")
    graft.ml.ClassifierStore.append(feat, lab, s"$dir/a/classifier")
    val w = graft.ml.ClassifierStore.trainStored(
      spark, s"$dir/a/classifier", P.dims, P.iters)
    val kept = ml.score(feat, lab, w).filter(col("margin") > 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(Set(402L, 404L, 406L).subsetOf(kept), s"gate rejected a scenario doc: $kept")

    val vecOf = Map(406L -> vNear, 404L -> vFar)
    val mem = MemoryStream[(Long, String, Option[Seq[Double]])]
    mem.addData(batchRows.map { case (id, ts) =>
      (id, ts.mkString(" "), vecOf.get(id)) }: _*)
    val q = Streams.releaseFrontDoorStream(
        mem.toDF().toDF("doc_id", "text", "vec"), w, P.dims,
        spark.read.parquet(s"$dir/a/neardup/bands"),
        spark.read.parquet(s"$dir/a/neardup/shingles"),
        spark.read.parquet(s"$dir/a/spans/grams"),
        "doc_id", "text", P.n, P.bands, P.rowsPerBand, P.threshold,
        P.minTokens,
        semantic = Some((spark.read.parquet(s"$dir/a/ivf"),
          P.vecDims, P.vecEps, "vec")))
      .writeStream.format("memory").queryName("frontdoor_sem")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("frontdoor_sem")
      .as[(Long, Long, String, String)].collect().toSet

    val inc = graft.release.ReleaseStore.increment(
      spark, batch, "doc_id", "text", P, s"$dir/b", vecs = Some(batchVecs))
    val want = inc.select(col("doc_id"), col("rep_id"), col("split"),
        col("text_dedup"))
      .as[(Long, Long, String, String)].collect().toSet
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(inc)
    assert(got == want,
      s"streamed semantic release diverged from the increment: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(!want.exists(_._1 == 406L), "406 was not semantically dropped; fixture too weak")
    assert(want.exists(_._1 == 404L) && want.exists(_._1 == 402L),
      "a novel/vector-less doc was wrongly dropped")
  }

  test("streaming semantic dedup vs stored IVF cells matches the batch probe's stored arm") {
    implicit val sqlCtx = spark.sqlContext
    val (dims, eps) = (3, 0.35)
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup_stream").toString
    val vecs = Tables.embeddings(spark, Sf001)
      .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("v"))
    val old = vecs.filter(col("vec_id") < 300)
    graft.sim.IndexStore.saveIvfStatic(old, dims, s"$dir/ivf")
    val freshRows = vecs.filter(col("vec_id") >= 300)
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    mem.addData(freshRows: _*)
    val q = Streams.semDedupStream(
        mem.toDF().toDF("vec_id", "v"),
        spark.read.parquet(s"$dir/ivf"), dims, eps)
      .writeStream.format("memory").queryName("semdedup")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("semdedup")
      .as[(Long, Long, Double)].collect().toSet
    // Batch truth: the persisted-probe decision restricted to its
    // STORED arm. All stored ids < every batch id, so whenever a stored
    // neighbor exists the batch min-struct picks it — the stream twin's
    // rows are exactly the dup_of < 300 slice.
    val batch = graft.sim.IndexStore.dedupNewIvfStatic(
      spark, s"$dir/ivf", vecs.filter(col("vec_id") >= 300), dims, eps)
    val want = batch.filter(col("is_dup") && col("dup_of") < 300)
      .select(col("vec_id"), col("dup_of"), col("dup_cos"))
      .as[(Long, Long, Double)].collect().toSet
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(batch)
    assert(got == want,
      s"got ${got.size} vs want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "split yields no cross-batch semantic dups")
  }

  test("streaming Hamming dedup matches the exact stored-arm truth") {
    implicit val sqlCtx = spark.sqlContext
    val radius = 2
    val all = graft.dedup.Dedup.simhash16Portable(
        Tables.documents(spark, Sf001).select(col("doc_id"), col("text")),
        "doc_id", "text")
      .select(col("doc_id").as("id"), col("simhash16").as("fp"))
    val stored = all.filter(col("id") < 300)
    val streamRows = all.filter(col("id") >= 300)
      .as[(Long, Long)].collect().toSeq
    // Batch truth: EXACT all-pairs vs stored (test-sized), nearest by
    // (hamming, old_id) — the blocking must lose nothing at r <= 3.
    val want = all.filter(col("id") >= 300)
      .crossJoin(stored.select(col("id").as("old_id"), col("fp").as("old_fp")))
      .withColumn("hamming", expr("cast(bit_count(fp ^ old_fp) as bigint)"))
      .filter(col("hamming") <= radius)
      .groupBy(col("id"))
      .agg(min(struct(col("hamming"), col("old_id"))).as("m"))
      .select(col("id"), col("m.old_id"), col("m.hamming"))
      .as[(Long, Long, Long)].collect().toSet
    val mem = MemoryStream[(Long, Long)]
    mem.addData(streamRows: _*)
    val q = Streams.hammingDupStream(
        mem.toDF().toDF("id", "fp"), stored, radius)
      .writeStream.format("memory").queryName("hamdup")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hamdup").as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"got ${got.size} vs want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "split yields no cross-batch Hamming dups")
  }

  test("streaming classifier scoring matches the batch t23 margins exactly") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ml.LinearClassifier
    val dims = 32
    val docs = Tables.documents(spark, Sf001).select(col("doc_id"), col("text"))
    val feat = LinearClassifier.features(docs, "doc_id", "text", dims)
    val lab = LinearClassifier.weakLabels(docs, "doc_id", "text")
    val weights = LinearClassifier.train(spark, feat, lab, dims, 16)
    // Batch truth: the t23 apply stage under the same weights.
    val want = LinearClassifier.score(feat, lab, weights)
      .select(col("doc_id"), col("margin"), col("pred"))
      .as[(Long, Long, Long)].collect().toSet
    val rows = docs.as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = Streams.classifierScoreStream(
        mem.toDF().toDF("doc_id", "text"), weights, dims, "doc_id", "text")
      .writeStream.format("memory").queryName("clf_scored")
      .outputMode("append").start()
    mem.addData(rows.take(200)); mem.addData(rows.drop(200))
    q.processAllAvailable(); q.stop()
    val got = spark.table("clf_scored")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"got ${got.size} vs want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty)
  }

  test("streaming quality-drift windows match the batch scoring exactly") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ml.LinearClassifier
    val dims = 32
    val docs = Tables.documents(spark, Sf001).select(col("doc_id"), col("text"))
    val feat = LinearClassifier.features(docs, "doc_id", "text", dims)
    val lab = LinearClassifier.weakLabels(docs, "doc_id", "text")
    val weights = LinearClassifier.train(spark, feat, lab, dims, 16)
    // Minute-spaced event times: 50 docs per 10-minute window.
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val rows = docs.as[(Long, String)].collect().toSeq.map { case (id, t) =>
      (id, t, new Timestamp(base + (id / 50) * 600000L))
    }
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.qualityDriftStream(
        mem.toDF().toDF("doc_id", "text", "ts"), weights, dims, "text",
        watermark = "0 seconds", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("drift")
      .outputMode("append").start()
    mem.addData(rows: _*)
    // A far-future sentinel advances the watermark past every fixture
    // window so append mode emits them all (its own window stays open).
    mem.addData((-1L, "sentinel", Timestamp.valueOf("2024-02-01 00:00:00")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("drift")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSet
    val tsDf = rows.map { case (id, _, t) => (id, t) }.toDF("doc_id", "ts")
    val exp = LinearClassifier.score(feat, lab, weights)
      .join(tsDf, "doc_id")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_agree"),
        sum(col("margin")).as("margin_sum"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_docs"), col("n_pos"), col("n_agree"), col("margin_sum"),
        round(col("n_pos").cast("double") / col("n_docs"), 6).as("pos_rate"),
        round(col("n_agree").cast("double") / col("n_docs"), 6).as("agree_rate"))
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(got == exp,
      s"got ${got.size} windows vs exp ${exp.size}; " +
        s"missing=${(exp -- got).take(2)} extra=${(got -- exp).take(2)}")
    assert(got.size >= 5, "fixture must span several windows")
  }

  test("lifecycle: drift alarm -> incremental retrain -> post-swap stream matches batch t23 on the union") {
    // The full classifier lifecycle wired end to end (r12 verdict ask #9):
    // a model trained on the accepted corpus monitors arriving windows via
    // qualityDriftStream; a drifted window (token-prefixed texts — every
    // hashed feature moves and the stopword signal disappears, the "crawl
    // mix shifted" failure) trips the agree_rate bound; the response is
    // ClassifierStore.append(increment) + trainStored (one batch-sized
    // pass, weights bit-identical to a from-scratch union train), and the
    // swapped-in weights drive the live scorer to EXACT batch-t23 parity
    // on the union.
    implicit val sqlCtx = spark.sqlContext
    import graft.ml.{ClassifierStore, LinearClassifier}
    val dims = 32
    val iters = 32
    val dir = java.nio.file.Files.createTempDirectory("graft_clf_lifecycle").toString
    val old = Tables.documents(spark, Sf001)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 250)
    val drifted = Tables.documents(spark, Sf001).filter(col("doc_id") >= 250)
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat_ws(" ", transform(graft.text.TextFns.tokens(col("text")),
          t => concat(lit("x"), t))).as("text"))
    val featOld = LinearClassifier.features(old, "doc_id", "text", dims)
    val labOld = LinearClassifier.weakLabels(old, "doc_id", "text")
    ClassifierStore.save(featOld, labOld, s"$dir/clf")
    val w0 = ClassifierStore.trainStored(spark, s"$dir/clf", dims, iters)
    // (1) monitor: the accepted corpus lands in window 1, the drifted
    // batch in window 2.
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val oldRows = old.as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t, new Timestamp(base)) }
    val newRows = drifted.as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t, new Timestamp(base + 600000L)) }
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.qualityDriftStream(
        mem.toDF().toDF("doc_id", "text", "ts"), w0, dims, "text",
        watermark = "0 seconds", windowLength = "10 minutes")
      .writeStream.format("memory").queryName("lifecycle_drift")
      .outputMode("append").start()
    mem.addData(oldRows: _*)
    mem.addData(newRows: _*)
    mem.addData((-1L, "sentinel", Timestamp.valueOf("2024-02-01 00:00:00")))
    q.processAllAvailable(); q.stop()
    val windows = spark.table("lifecycle_drift")
      .select(col("window_start"), col("agree_rate"))
      .as[(String, Double)].collect().toMap
    val bound = 0.65
    val healthy = windows("2024-01-01 10:00:00")
    val alarm = windows("2024-01-01 10:10:00")
    assert(healthy >= bound,
      s"training-corpus window agree_rate $healthy below the $bound bound; fixture broken")
    assert(alarm < bound,
      s"drifted window agree_rate $alarm did not trip the $bound alarm")
    // (2) the alarm's response: append ONLY the increment's statistics
    // and retrain — bit-identical to a from-scratch train on the union
    // (statistics additivity, the ClassifierStore contract).
    val featNew = LinearClassifier.features(drifted, "doc_id", "text", dims)
    val labNew = LinearClassifier.weakLabels(drifted, "doc_id", "text")
    ClassifierStore.append(featNew, labNew, s"$dir/clf")
    val w1 = ClassifierStore.trainStored(spark, s"$dir/clf", dims, iters)
    def wmap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val union = old.unionAll(drifted)
    val featU = LinearClassifier.features(union, "doc_id", "text", dims)
    val labU = LinearClassifier.weakLabels(union, "doc_id", "text")
    val wUnion = LinearClassifier.train(spark, featU, labU, dims, iters)
    assert(wmap(w1) == wmap(wUnion),
      "incremental retrain diverged from the from-scratch union train")
    assert(wmap(w1) != wmap(w0),
      "retrain did not move the weights; the drift fixture is vacuous")
    // (3) post-swap: the live scorer under the retrained weights matches
    // the batch t23 apply stage on the union exactly.
    val mem2 = MemoryStream[(Long, String)]
    val q2 = Streams.classifierScoreStream(
        mem2.toDF().toDF("doc_id", "text"), w1, dims, "doc_id", "text")
      .writeStream.format("memory").queryName("lifecycle_scored")
      .outputMode("append").start()
    mem2.addData(union.as[(Long, String)].collect().toSeq: _*)
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("lifecycle_scored")
      .as[(Long, Long, Long)].collect().toSet
    val want = LinearClassifier.score(featU, labU, wUnion)
      .select(col("doc_id"), col("margin"), col("pred"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"post-swap stream diverged from batch t23: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
  }

  test("stream-static enrichment join decorates events with customer dims") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("k", "segment")
    val q = Streams.enrich(
        mem.toDF().toDF("user_id", "value"), dim, "user_id", "k")
      .select(col("user_id"), col("value"), col("segment"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData((1L, 10.0), (2L, 20.0), (99L, 5.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("enriched")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSet
    assert(got == Set((1L, Some("BUILDING")), (2L, Some("MACHINERY")), (99L, None)))
  }

  test("batch sessionization on sf0.001 events matches e2 query") {
    val ev = Tables.events(spark, Sf001).as[Event]
    val viaStreamsModule = Streams.sessionizeBatch(ev, 30L * 60 * 1000)
      .agg(count(lit(1)), sum(col("n_events"))).collect().head
    val viaQuery = SparkEntry.queries("e2_sessionize")(spark, Sf001)
      .agg(count(lit(1)), sum(col("n_events"))).collect().head
    assert(viaStreamsModule.getLong(0) == viaQuery.getLong(0))
    assert(viaStreamsModule.getLong(1) == viaQuery.getLong(1))
  }
}
