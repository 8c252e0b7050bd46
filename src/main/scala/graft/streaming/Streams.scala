package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine (SURVEY §7.5 extension path):
  * the same event analytics the batch queries expose (`EventQueries`), as
  * incremental streams — windowed aggregation under a watermark, and
  * gap-based sessionization as custom state over
  * `flatMapGroupsWithState`. Batch/stream parity is asserted in ScalaTest
  * by feeding the same rows through `MemoryStream` and comparing to the
  * batch twin.
  *
  * Scale notes: state is keyed by (window, event_type) / user_id — Spark
  * hash-partitions state across executors; the watermark bounds state
  * retention so a 100 TB/day stream does not accumulate unbounded windows.
  */
object Streams {

  /** Event row as a typed stream element. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** The shared state-bounding device of the flag-shaped stream twins
    * ([[decontaminateStream]] / [[nearDupStream]] / [[hammingDupStream]]
    * / [[semDedupStream]] / [[releaseFrontDoorStream]]): their one
    * update-mode aggregation keys on a doc/vector id, and without a
    * watermark Spark retains a buffer for every key EVER streamed —
    * per-batch the state is hit-bounded, over a long-running query it
    * grows without bound. With `eventTime` = (ts column, delay) the
    * aggregation instead groups by (event-time window, keys...) under a
    * watermark, so a key's buffer evicts once the watermark passes its
    * window. Every row of a given key carries the SAME ts (it rides the
    * key's input row), so the window key partitions exactly as the bare
    * keys do — StreamsSpec pins output parity with and without.
    *
    * LATE-DATA CONTRACT (what the watermark costs): Spark DROPS any row
    * whose event time lags the max ts observed so far by more than
    * `delay`, and these flag streams fail OPEN on a drop — a late
    * contaminated/duplicate doc simply emits no flag and passes as
    * clean; there is no dead-letter side-channel in a streaming agg.
    * Id monotonicity (the stores' caller contract) does NOT imply ts
    * monotonicity, so opting into `eventTime` adds a second caller
    * contract: doc timestamps must be near-monotone — no doc may arrive
    * with a ts more than `delay` behind the newest ts already streamed
    * (in practice: use ingest time, not document-creation time, and set
    * `delay` above the pipeline's max reordering). Callers that cannot
    * bound lateness must leave `eventTime` off and bound state
    * operationally (restart cadence) instead. `windowLen` decouples the
    * grouping-window length from the watermark delay (it defaults to
    * `delay`): a SHORT window with a LONG delay keeps eviction
    * fine-grained while tolerating more reordering — the two knobs
    * serve different tunings and only `delay` sets the lateness
    * horizon. Output is invariant to `windowLen` because a key's rows
    * share one ts (parity spec-pinned).
    */
  private def windowedGroup(
      df: DataFrame, eventTime: Option[(String, String)],
      windowLen: Option[String], keys: Column*)
      : org.apache.spark.sql.RelationalGroupedDataset =
    eventTime match {
      case Some((_, delay)) =>
        df.withWatermark("ts", delay)
          .groupBy(window(col("ts"), windowLen.getOrElse(delay)).as("w")
            +: keys: _*)
      case None => df.groupBy(keys: _*)
    }

  /** `col(ts).as("ts")` when an event time rides the stream — appended
    * to the stream side's FIRST projection; downstream stages carry
    * `col("ts")` via [[tsThread]].
    */
  private def tsEntry(eventTime: Option[(String, String)]): Seq[Column] =
    eventTime.toSeq.map { case (tc, _) => col(tc).as("ts") }

  private def tsThread(eventTime: Option[(String, String)]): Seq[Column] =
    eventTime.toSeq.map(_ => col("ts"))

  /** Tumbling-window counts/sums under a watermark — streaming twin of
    * `e1_hour_window` (append mode: a window emits once its watermark
    * passes). `windowLength` is configurable so short-lived runs (demos,
    * tests) can use seconds-scale windows that actually close.
    */
  def hourlyCounts(
      events: DataFrame,
      watermark: String = "1 hour",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))

  /** A closed session emitted by [[sessionize]]. */
  case class Session(user_id: Long, session_start: Timestamp,
      n_events: Long, session_value: Double)

  /** Internal keyed state for [[sessionize]] (non-private: the encoder's
    * generated code must be able to resolve the accessors).
    */
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)

  /** Gap-based sessionization as explicit keyed state: a session closes
    * when no event arrives for `gapMs`. Streaming twin of `e2_sessionize`.
    *
    * `withTimeouts=true` (production) flushes idle users via
    * processing-time timeouts; tests pass `false` so a finite
    * `Trigger.AvailableNow` run terminates (a pending timeout keeps the
    * micro-batch loop alive indefinitely under that trigger).
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      withTimeouts: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (withTimeouts) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, new Timestamp(s.start), s.n, s.total)).iterator
            state.remove()
            out
          } else {
            // Within a micro-batch, order events by time (Spark does not
            // guarantee iterator order).
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (withTimeouts) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Builtin `session_window` twin of [[sessionize]] / [[sessionizeBatch]]
    * — the let-Catalyst-do-it spelling: one declarative groupBy that runs
    * UNCHANGED in batch and streaming (pass a `watermark` to stream;
    * Spark's UpdatingSessionsExec / session-merge state store replace the
    * hand-written flatMapGroupsWithState state machine). Semantics note:
    * `session_window(gap)` merges events with diff < gap, while the
    * e2/sessionize convention keeps diff ≤ gapMs in one session — so the
    * builtin gap is gapMs+1 ms, making the two groupings identical at
    * millisecond resolution (parity-tested in StreamsSpec; e23 is
    * oracled against e2's island formulation).
    */
  def sessionWindows(
      events: DataFrame,
      gapMs: Long,
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapMs + 1} milliseconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("session_start_ms"),
        col("n_events"), col("session_value"))
  }

  case class Gap(user_id: Long, gap_start_event: Long,
      gap_end_event: Long, gap_ms: Long)

  /** Keyed state for [[gapReport]]: the last-seen (event time, event id)
    * per user (non-private for encoder codegen, like [[SessionState]]).
    */
  case class GapState(lastTs: Long, lastId: Long)

  /** Streaming twin of `e20_gap_report`: per-user telemetry-gap
    * detection as keyed state — when an event arrives more than `gapMs`
    * after its predecessor, the (predecessor, successor, gap) record is
    * emitted. The live-monitoring dual of the batch LAG window: the
    * batch query finds historical gaps, this one flags a recovering
    * sensor the moment it reports back. State is ONE (ts, id) pair per
    * user — |users|-bounded, not history-bounded; a production deploy
    * adds timeout eviction for retired users (same knob as
    * [[sessionize]]'s `withTimeouts`, omitted here so finite
    * AvailableNow parity runs terminate).
    */
  def gapReport(events: Dataset[Event], gapMs: Long): Dataset[Gap] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, Gap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[GapState]) =>
          // Within a micro-batch, order events by time (Spark does not
          // guarantee iterator order); the unique event_id tiebreak
          // matches the batch window's determinism.
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var out = List.empty[Gap]
          var prev = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            prev match {
              case Some(p) if t - p.lastTs > gapMs =>
                out ::= Gap(userId, p.lastId, e.event_id, t - p.lastTs)
              case _ =>
            }
            prev = Some(GapState(t, e.event_id))
          }
          prev.foreach(state.update)
          out.reverseIterator
      }
  }

  /** Incremental out-degree maintenance over a stream of edge arrivals
    * (SURVEY §7.5): a running `groupBy(src).count()` in update mode —
    * Spark keeps the per-key state, so each micro-batch emits only the
    * degrees that changed. At 100 TB/day edge-ingest scale the state is
    * |V|-sized and hash-partitioned across executors.
    */
  def incrementalOutDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src")).agg(count(lit(1)).as("out_degree"))

  /** Streaming exact dedup — the training-pipeline `d1_dedup_exact` as an
    * incremental stream: first arrival per key wins, later duplicates are
    * dropped. `dropDuplicatesWithinWatermark` keeps per-key state only
    * until the watermark passes, so state is bounded by (dup horizon ×
    * arrival rate) instead of growing with the full corpus — the property
    * that makes streaming dedup viable on a 100 TB/day ingest.
    */
  def dedupByKey(
      stream: DataFrame,
      keys: Seq[String],
      watermark: String = "1 hour",
      tsCol: String = "ts"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Current-state row maintained by [[latestSnapshot]]. */
  case class Latest(user_id: Long, last_event: Long, last_type: String,
      last_ms: Long, last_value: Double)

  /** CDC changelog compaction as a live materialized view — streaming twin
    * of `e12_latest_snapshot`: per key, the latest event (epoch-ms order,
    * event_id tie-break) is kept as state and re-emitted whenever it
    * changes (update mode). State is one row per key — |keys|-sized and
    * hash-partitioned, the streaming analogue of the batch max(struct)
    * aggregate; out-of-order arrivals older than the held row are ignored
    * rather than regressing the snapshot.
    */
  def latestSnapshot(events: Dataset[Event]): Dataset[Latest] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Latest, Latest](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Latest]) =>
          val incoming = rows.map(e =>
            Latest(userId, e.event_id, e.event_type, e.ts.getTime, e.value))
          val best = (incoming ++ state.getOption.iterator)
            .maxBy(l => (l.last_ms, l.last_event))
          state.update(best)
          best
      }
  }

  /** Stream-stream banded interval join — streaming twin of the batch
    * `ops.RangeJoin` (e10): pairs of same-key events where the right event
    * falls in (left.ts, left.ts + band]. The event-time range condition is
    * what lets Spark BOUND the join state: each side keeps rows only until
    * the other side's watermark passes the band, so state is (band +
    * watermark) × arrival-rate sized, not unbounded.
    */
  def bandJoinStream(
      left: DataFrame, // (event_id, ts, user_id, ...)
      right: DataFrame,
      bandSeconds: Long,
      watermark: String = "1 hour"): DataFrame = {
    val l = left.select(
      col("user_id").as("l_user"), col("event_id").as("l_id"), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(
      col("user_id").as("r_user"), col("event_id").as("r_id"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $bandSeconds SECONDS"))
      .select(col("l_user").as("user_id"), col("l_id"), col("r_id"))
  }

  /** Stream-stream INTERVAL-overlap join — the streaming twin of
    * `ops.IntervalJoin.overlapPairs` (both sides are intervals, not
    * points). Inputs are interval streams (id, start TIMESTAMP,
    * end TIMESTAMP), half-open [start, end), with every interval no
    * longer than `maxLenSeconds` (longer or empty intervals are filtered
    * out — state cannot be bounded for them; pick maxLen ≥ the domain's
    * interval-length cap).
    *
    * Shape: the batch operator's bin-replication becomes the join's
    * REQUIRED equality key (Spark rejects stream-stream joins without
    * one). Bin width = maxLen, so a length-bounded interval touches at
    * most 2 bins (replication ≤ 2); a pair is attributed to exactly one
    * bin — the one containing the overlap start — and the exact overlap
    * predicate rides as the residual, so the output matches the batch
    * operator row for row on the same (length-bounded) inputs. State
    * reclamation comes from the band predicate on the two WATERMARKED
    * start columns: bounded length pins a true overlap's r.start inside
    * (l.start − maxLen, l.start + maxLen), so each side's state is
    * watermark + maxLen bounded. Epochs must be nonnegative (bin uses
    * double floor-division, exact below 2^53 ms).
    */
  def overlapStream(
      left: DataFrame, // streaming (id, start TIMESTAMP, end TIMESTAMP)
      right: DataFrame,
      maxLenSeconds: Long,
      watermark: String = "1 hour"): DataFrame = {
    val len = expr(s"INTERVAL $maxLenSeconds SECONDS")
    val wMs = maxLenSeconds * 1000L
    def bin(c: Column): Column = floor(unix_millis(c) / wMs).cast("long")
    val l = left.select(
      col(left.columns(0)).as("l_id"),
      col(left.columns(1)).as("l_start"), col(left.columns(2)).as("l_end"))
      .filter(col("l_end") > col("l_start") && col("l_end") <= col("l_start") + len)
      .withWatermark("l_start", watermark)
      .withColumn("l_bin", explode(sequence(
        bin(col("l_start")),
        floor((unix_millis(col("l_end")) - 1) / wMs).cast("long"))))
    val r = right.select(
      col(right.columns(0)).as("r_id"),
      col(right.columns(1)).as("r_start"), col(right.columns(2)).as("r_end"))
      .filter(col("r_end") > col("r_start") && col("r_end") <= col("r_start") + len)
      .withWatermark("r_start", watermark)
      .withColumn("r_bin", explode(sequence(
        bin(col("r_start")),
        floor((unix_millis(col("r_end")) - 1) / wMs).cast("long"))))
    l.join(r,
      col("l_bin") === col("r_bin") &&
        col("r_start") >= col("l_start") - len &&
        col("r_start") <= col("l_start") + len &&
        col("l_start") < col("r_end") && col("r_start") < col("l_end") &&
        bin(greatest(col("l_start"), col("r_start"))) === col("l_bin"))
      .select(col("l_id"), col("r_id"))
  }

  /** Tagged element of the unified as-of input stream. */
  case class AsOfEv(k: Long, t: Long, isRight: Boolean,
      v: Option[Long], id: Option[Long], ts: Timestamp)
  /** Per-key as-of buffer: unmatched lefts (t, id) and candidate rights
    * (t, v).
    */
  case class AsOfPending(lefts: List[(Long, Long)], rights: List[(Long, Long)])
  /** One as-of match (asofV None when no right row at or before t). */
  case class AsOfMatch(id: Long, k: Long, asofV: Option[Long])

  /** Stream-stream AS-OF enrichment — the streaming twin of
    * `ops.AsOfJoin.asOf` (backward direction): every left row decorated
    * with the latest right value at or before its event time on the same
    * key. Spark has no streaming as-of join, and the batch union+window
    * merge needs a per-key sort streams can't do — so this is custom
    * state over `flatMapGroupsWithState` (the §2.10 ladder's (c) rung),
    * with WATERMARK-BOUNDED buffers:
    *
    *  - a left row buffers until the watermark passes its event time —
    *    only then can no earlier-or-equal right row still arrive — and
    *    emits exactly once (append semantics);
    *  - right rows at or before the watermark collapse to the single
    *    latest one (it is the only one a future left can still need:
    *    un-dropped future lefts have t ≥ watermark); rights beyond the
    *    watermark are kept as-is. State per key is therefore
    *    O(arrival rate × watermark delay), never corpus-sized.
    *
    * Tie rule matches the batch operator: rights at exactly t_left are
    * visible; among rights with equal t the largest v wins. Event-time
    * timeouts flush buffered lefts of QUIET keys (groups with no new
    * rows) once their emission point passes.
    */
  def asOfStream(
      left: DataFrame, // streaming (k LONG, ts TIMESTAMP, id LONG)
      right: DataFrame, // streaming (k LONG, ts TIMESTAMP, v LONG)
      watermark: String = "1 hour"): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.select(
        col(left.columns(0)).as("k"), col(left.columns(1)).as("ts"),
        col(left.columns(2)).as("id"))
      .withWatermark("ts", watermark)
      .select(col("k"), unix_millis(col("ts")).as("t"),
        lit(false).as("isRight"), lit(null).cast("long").as("v"),
        col("id").cast("long").as("id"), col("ts"))
    val r = right.select(
        col(right.columns(0)).as("k"), col(right.columns(1)).as("ts"),
        col(right.columns(2)).as("v"))
      .withWatermark("ts", watermark)
      .select(col("k"), unix_millis(col("ts")).as("t"),
        lit(true).as("isRight"), col("v").cast("long").as("v"),
        lit(null).cast("long").as("id"), col("ts"))
    l.unionByName(r).as[AsOfEv]
      .groupByKey(_.k)
      .flatMapGroupsWithState[AsOfPending, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, it: Iterator[AsOfEv], state: GroupState[AsOfPending]) =>
          val st = state.getOption.getOrElse(AsOfPending(Nil, Nil))
          val rows = it.toList
          val lefts = st.lefts ++
            rows.filter(!_.isRight).map(e => (e.t, e.id.get))
          val rights = (st.rights ++
            rows.filter(_.isRight).map(e => (e.t, e.v.get))).sorted
          val wm = state.getCurrentWatermarkMs()
          val (ripe, rest) = lefts.partition(_._1 <= wm)
          val out = ripe.sorted.map { case (t, id) =>
            // rights sorted by (t, v): the last entry at or before t is
            // the max-t (then max-v) match — the batch tie rule.
            AsOfMatch(id, k, rights.takeWhile(_._1 <= t).lastOption.map(_._2))
          }
          val (expired, live) = rights.partition(_._1 <= wm)
          val keptRights = expired.lastOption.toList ++ live
          if (rest.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsOfPending(rest, keptRights))
            // Wake the group when the earliest buffered left ripens (must
            // be strictly beyond the current watermark).
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(math.max(rest.map(_._1).min, wm + 1))
          }
          out.iterator
      }
      .select(col("id"), col("k"), col("asofV").as("asof_v"))
  }

  /** Streaming benchmark decontamination — the stream-static twin of
    * `Dedup.contamination`: documents arrive as a stream, the (small,
    * static) benchmark shingle index is broadcast, and each micro-batch
    * emits its contaminated (train_id, bench_id, n_shared) pairs (update
    * mode). The corpus stream never shuffles for the join itself
    * (broadcast hash join per micro-batch), and the running aggregation
    * keeps state only for pairs that actually share a shingle — the
    * contamination hits, a vanishing fraction of the corpus — so a
    * 100 TB/day ingest pipeline's leakage check stays incremental.
    */
  def decontaminateStream(
      docs: DataFrame, // streaming (doc_id LONG, text STRING, ...)
      benchShingles: DataFrame, // static (bench_id LONG, s STRING)
      idCol: String,
      textCol: String,
      n: Int,
      // optional state bound: see [[windowedGroup]]
      eventTime: Option[(String, String)] = None,
      windowLen: Option[String] = None): DataFrame = {
    // explode+window shingling needs a per-key sort that streaming
    // disallows; the array-slice form computes the same distinct shingle
    // set row-locally (per document), which is exactly what a stream can
    // do without state.
    val trainSh = docs.select(Seq(
      col(idCol).as("train_id"),
      explode(graft.text.TextFns.shingles(col(textCol), n)).as("s"))
      ++ tsEntry(eventTime): _*)
    windowedGroup(trainSh.join(broadcast(benchShingles), "s"), eventTime,
        windowLen, col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      // project the internal window key away so the schema is identical
      // with and without eventTime (the other twins all do the same)
      .select(col("train_id"), col("bench_id"), col("n_shared"))
  }

  /** Streaming near-duplicate detection against a STORED corpus — the
    * stream-static twin of [[graft.dedup.DedupStore.searchNew]]:
    * documents arrive as a stream, the persisted MinHash band/shingle
    * relations are static, and each micro-batch emits the arriving
    * docs' near-dup pairs (train_id, old_id, jaccard) in update mode.
    *
    * Per-row (stateless) signature: the batch banding's hash family
    * computed over the in-row shingle ARRAY (`array_min(transform(...))`
    * ≡ the batch `min(xxhash64(s, k))` over exploded rows — duplicates
    * cannot change a min, and `TextFns.shingles` is the same distinct
    * shingle set DedupSimSpec pins against `shingleIndex`), so a doc
    * hashes to exactly the buckets [[graft.dedup.Dedup.minhashBanded]]
    * would store for it. Candidates come from a stream-static equi-join
    * on (band, bucket); the exact-Jaccard refine joins the stored
    * shingles of matched OLD docs and tests membership against the
    * stream row's own array. A pair met through several bands is
    * deduplicated by `collect_set` inside the single streaming
    * aggregation (streaming forbids count_distinct and stacked aggs;
    * the set is bounded by the doc's shingle count). Like
    * [[decontaminateStream]], state is kept only for pairs that share a
    * bucket — the near-dup hits, a vanishing fraction of the stream.
    *
    * Within-batch (new×new) duplication is deliberately NOT this
    * operator's job — that is `dropDuplicatesWithinWatermark` /
    * [[curateStream]] stage 1; this is the batch-vs-corpus check.
    */
  def nearDupStream(
      docs: DataFrame, // streaming (idCol, textCol)
      storedBands: DataFrame, // static (band, bucket, id) — DedupStore layout
      storedShingles: DataFrame, // static (id, s)
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      // optional state bound: see [[windowedGroup]]
      eventTime: Option[(String, String)] = None,
      windowLen: Option[String] = None): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSh = docs.select(Seq(
        col(idCol).as("train_id"),
        graft.text.TextFns.shingles(col(textCol), n).as("sh"))
        ++ tsEntry(eventTime): _*)
      .filter(size(col("sh")) > 0)
    val minCols = (0 until numHashes).map { k =>
      array_min(transform(col("sh"), s => xxhash64(s, lit(k)))).as(s"m$k")
    }
    val sig = withSh.select(
      Seq(col("train_id"), col("sh")) ++ tsThread(eventTime) ++ minCols: _*)
    val bandCols = (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(k => col(s"m$k")): _*).as(s"b$b")
    }
    val banded = sig
      .select(Seq(col("train_id"), col("sh")) ++ tsThread(eventTime)
        ++ bandCols: _*)
      .select(Seq(col("train_id"), col("sh"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("bucket"))): _*)).as("e"))
        ++ tsThread(eventTime): _*)
      .select(Seq(col("train_id"), col("sh"),
        col("e.band").as("band"), col("e.bucket").as("bucket"))
        ++ tsThread(eventTime): _*)
    val cand = banded
      .join(storedBands.select(col("band"), col("bucket"), col("id").as("old_id")),
        Seq("band", "bucket"))
      .select(Seq(col("train_id"), col("old_id"), col("sh"))
        ++ tsThread(eventTime): _*)
    // Static per-old-doc shingle counts, joined BEFORE the aggregation
    // (a stream-static join after a streaming agg is not allowed in
    // update mode).
    val nbRel = storedShingles.groupBy(col("id").as("old_id"))
      .agg(count(lit(1)).as("nb"))
    windowedGroup(cand
        .join(storedShingles.select(col("id").as("old_id"), col("s")), "old_id")
        .filter(array_contains(col("sh"), col("s")))
        .join(nbRel, "old_id"),
        eventTime, windowLen, col("train_id"), col("old_id"))
      .agg(
        size(collect_set(col("s"))).cast("long").as("common"),
        first(size(col("sh"))).cast("long").as("na"),
        first(col("nb")).as("nb"))
      .withColumn("j_raw",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("j_raw") >= threshold)
      .select(col("train_id"), col("old_id"), round(col("j_raw"), 6).as("jaccard"))
  }

  /** Live twin of the banded Hamming dedup's stored arm (d4c text
    * SimHash / m4 perceptual pHash) — fingerprint near-dup flagging of
    * an arriving stream against an accepted corpus's fingerprint
    * relation: each stream fingerprint explodes into its 4 nibble bands
    * per row (stateless), candidates come from a stream-static equi-join
    * on (band, nibble) — COMPLETE for radius ≤ 3 by the same pigeonhole
    * as the batch operator — the refine is exact popcount, and the
    * per-id nearest stored duplicate collapses in ONE update-mode
    * min-struct aggregation (nearest by Hamming, ties to the smallest
    * stored id; state only for ids that hit a neighbor). Emits
    * (id, dup_of, hamming). Within-batch duplication is
    * `dropDuplicatesWithinWatermark`'s job, exactly as [[nearDupStream]]
    * / [[semDedupStream]]. StreamsSpec pins parity with the batch
    * banded join restricted to stream-vs-stored pairs.
    */
  def hammingDupStream(
      fps: DataFrame, // streaming (id, fp) — 16-bit fingerprints
      stored: DataFrame, // static (id, fp)
      radius: Int,
      // optional state bound: see [[windowedGroup]]
      eventTime: Option[(String, String)] = None,
      windowLen: Option[String] = None): DataFrame = {
    require(radius >= 0 && radius <= 3, "4-band blocking is complete only for r <= 3")
    def banded(df: DataFrame, idOut: String, fpOut: String,
        extra: Seq[Column]): DataFrame = df
      .select(Seq(col("id").as(idOut), col("fp").as(fpOut),
        explode(sequence(lit(0), lit(3))).as("band")) ++ extra: _*)
      .withColumn("bkey", expr(s"shiftright($fpOut, band * 4) & 15"))
    windowedGroup(banded(fps, "id", "fp", tsEntry(eventTime))
        .join(banded(stored, "old_id", "old_fp", Nil), Seq("band", "bkey"))
        .withColumn("hamming", expr("cast(bit_count(fp ^ old_fp) as bigint)"))
        .filter(col("hamming") <= radius),
        eventTime, windowLen, col("id"))
      .agg(min(struct(col("hamming"), col("old_id"))).as("m"))
      .select(col("id"), col("m.old_id").as("dup_of"),
        col("m.hamming").as("hamming"))
  }

  /** Live twin of [[graft.sim.IndexStore.dedupNewIvfStatic]]'s
    * stored-corpus arm — SEMANTIC near-dup flagging of an arriving
    * vector stream against the persisted IVF store: each stream vector
    * computes its sign cell per row (stateless), candidates come from a
    * stream-static equi-join on the cell, the ε-refine is the exact
    * cosine, and the per-vector best (smallest-id) duplicate source
    * collapses in ONE update-mode aggregation (min-struct — streaming
    * forbids stacked aggs; state is held only for vectors that hit a
    * stored ε-neighbor, a vanishing fraction of a deduplicated stream).
    * Emits (vec_id, dup_of, dup_cos). Within-batch (new×new)
    * duplication is deliberately NOT this operator's job — exactly as
    * [[nearDupStream]]: that is `dropDuplicatesWithinWatermark` /
    * [[curateStream]] stage 1; this is the batch-vs-corpus check.
    * StreamsSpec pins parity with the batch probe's stored arm.
    */
  def semDedupStream(
      vecs: DataFrame, // streaming (vec_id, v ARRAY<DOUBLE>)
      store: DataFrame, // static (vec_id, v, cell) — IndexStore layout
      dims: Int, eps: Double,
      // optional state bound: see [[windowedGroup]]
      eventTime: Option[(String, String)] = None,
      windowLen: Option[String] = None): DataFrame = {
    val asg = vecs.select(Seq(col("vec_id"), col("v"),
      graft.sim.IndexStore.cellOf(col("v"), dims).as("cell"))
      ++ tsEntry(eventTime): _*)
    windowedGroup(asg
        .join(store.select(col("cell"), col("vec_id").as("nbr_id"),
          col("v").as("nv")), Seq("cell"))
        .filter(graft.sim.Similarity.cosine(col("v"), col("nv")) >= eps)
        .select(Seq(col("vec_id"), col("nbr_id"),
          round(graft.sim.Similarity.cosine(col("v"), col("nv")), 4).as("cos"))
          ++ tsThread(eventTime): _*),
        eventTime, windowLen, col("vec_id"))
      .agg(min(struct(col("nbr_id"), col("cos"))).as("m"))
      .select(col("vec_id"), col("m.nbr_id").as("dup_of"),
        col("m.cos").as("dup_cos"))
  }

  /** Streaming corpus curation — the batch `p7_curate` pipeline as a live
    * ingest, each stage the streaming analogue of its batch twin:
    *
    *  1. content dedup: `dropDuplicatesWithinWatermark` on the md5 digest
    *     (first ARRIVAL is the representative — the streaming counterpart
    *     of batch min-id; state bounded by the dup horizon);
    *  2. quality gate: stateless per-row screen (token count, punctuation
    *     and stopword ratios — `TextFns` builtins, no state at all);
    *  3. decontamination: stateless per-row `arrays_overlap` of the doc's
    *     shingle set against the benchmark shingle array, which ships as a
    *     literal in the plan (the benchmark side is tiny by definition —
    *     the same assumption the batch d6 broadcast makes; a stream-stream
    *     anti-join is not expressible in append mode, and a per-doc
    *     stateful aggregation would hold unbounded state).
    *
    * Emits the surviving (doc_id, text) rows in append mode. At 100 TB/day
    * the only state is the dedup digests inside the watermark; everything
    * else is per-row.
    */
  def curateStream(
      docs: DataFrame, // streaming (doc_id LONG, text STRING, ts TIMESTAMP)
      benchShingles: Array[String],
      n: Int,
      minTokens: Int = 15,
      maxPunctRatio: Double = 0.2,
      maxStopwordRatio: Double = 0.6,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .withColumn("h", md5(col("text")))
      .dropDuplicatesWithinWatermark("h")
      .filter(
        graft.text.TextFns.tokenCount(col("text")) >= minTokens &&
          graft.text.TextFns.punctRatio(col("text")) <= maxPunctRatio &&
          graft.text.TextFns.stopwordRatio(col("text")) <= maxStopwordRatio &&
          !arrays_overlap(
            graft.text.TextFns.shingles(col("text"), n), lit(benchShingles)))
      .select(col("doc_id"), col("text"))

  /** OHLC bar compaction as a stream — twin of the batch `e15_ohlc`: per
    * (tumbling window × event_type), open/close via the same ordered-struct
    * argmin/argmax single aggregation (no window sort), high/low/count
    * alongside. Append mode: a bar emits exactly once, when the watermark
    * closes its window — the natural shape for continuously materializing
    * downsampled bars off a 100 TB/day tick stream.
    */
  def ohlcBars(
      events: DataFrame,
      watermark: String = "1 hour",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        min(struct(unix_millis(col("ts")).as("ms"), col("event_id"), col("value"))).as("o"),
        max(struct(unix_millis(col("ts")).as("ms"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        count(lit(1)).as("n"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bar_start"),
        col("event_type"),
        round(col("o.value"), 4).as("open"),
        round(col("high"), 4).as("high"),
        round(col("low"), 4).as("low"),
        round(col("c.value"), 4).as("close"),
        col("n"))

  /** Streaming heavy hitters — the a17 Misra-Gries sketch maintained as
    * live aggregation state: the TypedImperativeAggregate's serialized
    * buffer lives in the state store and merges per micro-batch, so the
    * state is O(k) per group (here: global ⇒ one k-entry buffer) no matter
    * how much stream has passed — the streaming form of the mergeable-
    * summaries property. Complete output mode re-emits the current
    * top list each batch.
    */
  def heavyHittersStream(stream: DataFrame, keyCol: String, k: Int): DataFrame =
    stream.agg(
      org.apache.spark.sql.graft.MisraGriesAgg.heavyHitters(col(keyCol), k).as("hh"))

  /** Streaming per-group distinct sketches — the sketch family's
    * distinct-count (HLL) and SET-ALGEBRA (theta) members as streaming
    * aggregation state. Both are mergeable TypedImperativeAggregates, so
    * the state store carries one serialized buffer per group and every
    * micro-batch folds in with a merge — no raw-key state, no rescan.
    * The theta column makes the SNAPSHOTS composable after the fact:
    * two groups' (or two streams') stored sketches answer |A∪B| / |A∩B|
    * / |A∖B| via `theta_*_est` without re-reading either stream — the
    * cross-day/cross-stream audience questions (parity + cross-batch
    * state survival in StreamsSpec).
    */
  def distinctSketchStream(
      stream: DataFrame, groupCol: String, keyCol: String): DataFrame =
    stream.groupBy(col(groupCol)).agg(
      org.apache.spark.sql.graft.HllSketchAgg.hllDistinct(col(keyCol)).as("apx"),
      org.apache.spark.sql.graft.ThetaSketchAgg
        .thetaSketch(col(keyCol), 16).as("theta"))

  /** Streaming per-group QUANTILE state: the stored-KLL twin of
    * [[distinctSketchStream]] — one serialized KLL buffer per group in
    * the state store, folded by merge every micro-batch. The emitted
    * column is the stored BINARY, not an evaluated quantile, so
    * snapshots stay re-aggregatable downstream (`kll_merge` across
    * groups/streams/days, `kll_value` at any rank later) — the same
    * store-now/ask-later contract as the theta column. Parity +
    * cross-batch state survival in StreamsSpec.
    */
  def quantileSketchStream(
      stream: DataFrame, groupCol: String, valCol: String): DataFrame =
    stream.groupBy(col(groupCol)).agg(
      org.apache.spark.sql.graft.KllStoreFns.kllSketch(col(valCol)).as("kll"))

  /** Continuous PageRank materialization over an edge-arrival stream —
    * the reference's defining fixpoint (SURVEY §2.9) meeting its §2.10
    * streaming extension: each micro-batch folds the new edges into the
    * accumulated edge set (eager localCheckpoint; the superseded
    * checkpoint is freed, so state is one edge snapshot, not a lineage
    * chain) and recomputes fixed-iteration ranks on the updated graph,
    * handing the fresh rank table to `onUpdate`. PageRank has no exact
    * per-key incremental decomposition, so recompute-on-ingest over
    * foreachBatch IS the standard continuous-materialization shape; at
    * cluster scale the recompute cost is the batch PageRank cost and the
    * ingest cadence throttles it. Parity: the last emitted table equals
    * batch PageRank over the full edge set (StreamsSpec).
    *
    * Each batch's rank table supersedes the previous one, and the
    * previous one's checkpoint backing is freed BEFORE `onUpdate` runs —
    * consumers must materialize (write/collect) inside the callback
    * rather than hold rank DataFrames across batches; only the latest
    * table is live. RESTART CAVEAT: the accumulated edge snapshot is
    * session-local (localCheckpoint, deliberately non-recoverable) — a
    * restarted query resumes the SOURCE from its offsets but starts the
    * edge accumulation empty, so this is a within-session materialized
    * view; durable recovery needs the caller to replay the full edge log
    * or persist/restore the snapshot externally (batchId-keyed,
    * idempotent).
    */
  def pageRankStream(
      edgeStream: DataFrame,
      beta: Double,
      iterations: Int)(
      onUpdate: (Long, DataFrame) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var acc: DataFrame = null
    var prevRanks: DataFrame = null
    edgeStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cols = batch.columns
        val fresh = batch.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
        val merged =
          (if (acc == null) fresh else acc.unionAll(fresh)).distinct().localCheckpoint(true)
        if (acc != null)
          org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(acc)
        acc = merged
        // Free the superseded rank table: without this, one checkpointed
        // |V|-row snapshot would accumulate per trigger for the life of
        // the query.
        if (prevRanks != null)
          org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(prevRanks)
        val ranks =
          graft.graph.PageRank.fixedIterations(batch.sparkSession, acc, beta, iterations)
        prevRanks = ranks
        onUpdate(batchId, ranks)
      }
      .start()
  }

  /** Stream-static enrichment join: each micro-batch of events is joined
    * against a static dimension table (re-read per batch if backed by a
    * mutable source). Catalyst broadcasts the static side when small —
    * the standard shape for decorating a 100 TB/day stream with dimension
    * attributes without shuffling the stream.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), "left")

  /** Streaming quality-classifier scoring — the live twin of the batch
    * t23 apply stage: documents arrive as a stream and every row gets its
    * margin under a TRAINED [[graft.ml.LinearClassifier]] weight relation
    * — the online filter a curation front-door runs on arriving crawl
    * data once the batch trainer has fit the model.
    *
    * The batch plan (explode → hashed-feature groupBy → weight join →
    * per-doc sum) would need a doc-keyed stateful aggregation in
    * streaming; the same margin is computed STATELESS here by folding the
    * in-row token array against the weight vector shipped as a plan
    * literal: margin = w_bias + Σ_tokens w[md5(token) mod dims]
    * (grouping tokens per bucket first cannot change an integer sum, so
    * per-token lookup ≡ the batch n·w form — StreamsSpec pins exact
    * parity). The dims+1-row weight relation is driver-collected once at
    * plan build — the same bounded collect the trainer itself makes; no
    * join, no shuffle, no state: a pure projection that scales to any
    * stream rate.
    */
  /** The stateless margin projection shared by every streaming scorer:
    * weights ship as plan literals (the dims+1-row collect the trainer
    * itself makes), margin = w_bias + Σ_tokens w[md5(token) mod dims] —
    * exactly the batch n·w form (grouping per bucket first cannot
    * change an integer sum; StreamsSpec pins parity).
    */
  private def marginExpr(
      weights: DataFrame, dims: Int,
      textCol: String): org.apache.spark.sql.Column = {
    val w = weights.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val warr = array((0 until dims).map(j => lit(w.getOrElse(j.toLong, 0L))): _*)
    aggregate(graft.text.TextFns.tokens(col(textCol)), lit(w.getOrElse(-1L, 0L)),
      (acc, t) => acc + element_at(warr,
        (pmod(graft.ops.Portable.md5Long(t), lit(dims.toLong)) + 1).cast("int")))
  }

  def classifierScoreStream(
      docs: DataFrame, // streaming (idCol, textCol)
      weights: DataFrame, // static (dim LONG, w LONG), dim -1 = bias
      dims: Int,
      idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        marginExpr(weights, dims, textCol).as("margin"))
      .withColumn("pred", when(col("margin") > 0, 1L).otherwise(-1L))

  /** The streaming RELEASE FRONT-DOOR — the live twin of the p22
    * increment's gate + near-dup stages ([[graft.release.ReleaseStore]]
    * .increment steps 1–2), composed: arriving documents are gated by
    * the store's current classifier (the stateless margin projection —
    * retraining is the drift lifecycle's job, see qualityDriftStream),
    * and gate-survivors are flagged against the ACCEPTED corpus through
    * the persisted DedupStore band/shingle relations (stream-static
    * equi-join + exact-Jaccard refine — [[nearDupStream]]). Emits one
    * row per (new doc, stored near-dup) hit: (doc_id, dup_of, jaccard);
    * novel gate-survivors produce no row (streaming cannot left-join
    * after its one aggregation — the sink anti-joins flags from the
    * gated stream). Within-batch duplication is
    * `dropDuplicatesWithinWatermark` upstream, and span excision stays
    * a batch stage by design (it needs the merged-interval state of the
    * whole increment — the micro-batch boundary would change results).
    * StreamsSpec pins the composition against the batch increment's own
    * stages: gate decisions == the batch score-filter, flags == the
    * DedupStore.searchNew stored arm restricted to gate survivors.
    */
  def releaseFrontDoorStream(
      docs: DataFrame, // streaming (idCol, textCol)
      weights: DataFrame, // static (dim LONG, w LONG), dim -1 = bias
      dims: Int,
      storedBands: DataFrame, // static (band, bucket, id) — DedupStore layout
      storedShingles: DataFrame, // static (id, s)
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val gated = docs
      .filter(marginExpr(weights, dims, textCol) > 0)
      .select(col(idCol), col(textCol))
    nearDupStream(gated, storedBands, storedShingles,
        idCol, textCol, n, bands, rowsPerBand, threshold)
      .select(col("train_id").as("doc_id"), col("old_id").as("dup_of"),
        col("jaccard"))
  }

  /** The END-TO-END streaming release front-door — the live twin of the
    * FULL p22 increment on one arriving batch: gate → near-dup drop →
    * span excision → split, emitting the batch's RELEASED rows
    * (doc_id, rep_id, split, text_dedup) exactly as
    * [[graft.release.ReleaseStore.increment]] appends them. StreamsSpec
    * parity-pins the composition against increment itself (not merely
    * its stages) on the same batch and store.
    *
    * Streaming allows ONE aggregation, so the composition cannot be
    * "flag stage, anti-join, range stage" — instead every per-doc
    * decision collapses into a single `groupBy(doc_id)` over the UNION
    * of three stream-static probe legs (four with the optional
    * SEMANTIC stage — a SemDeDup cell probe of the persisted IVF
    * store, the vector riding on its doc's stream row):
    *
    *   - leg 0 carries the doc itself (a novel doc hits nothing and
    *     must still release);
    *   - the NEAR-DUP leg bands the doc row-locally (the
    *     [[nearDupStream]] signature — identical hash family to the
    *     stored [[graft.dedup.DedupStore]] layout), equi-joins the
    *     stored band relation, and computes the exact Jaccard ROW-
    *     locally against per-stored-doc shingle ARRAYS (a static-side
    *     pre-aggregation — allowed where a streaming second agg is
    *     not), so the drop decision needs only `max(j)`;
    *   - the SPAN leg builds the doc's complete minTokens-token anchor
    *     windows row-locally (`slice`/`array_join` ≡
    *     [[graft.dedup.Dedup.anchorGrams]]'s window spelling) and
    *     equi-joins the stored gram relation, keeping only the matched
    *     POSITIONS: a maximal span's removal range [min pb, max pb + L)
    *     is exactly the interval union of its seeds' windows
    *     [pb, pb+L), so the per-(pair, diagonal) islands merge the
    *     batch operator runs is equivalent to excising
    *     ∪ {[p, p+L) : anchor at p matched} — no second grouping, just
    *     `collect_set(pos)` inside the one aggregation and a row-local
    *     exists() filter over token positions at emit time.
    *
    * Like every stored-arm stream twin, within-batch (new×new)
    * duplication and spans are `dropDuplicatesWithinWatermark` /
    * the batch increment's job, and a batch doc that would DETHRONE a
    * stored canonical (near-dup hit but longer — increment releases it
    * with the cluster's rep) is conservatively dropped here: a stream
    * cannot join the flag back to the cluster relation after its one
    * aggregation. Survivors are therefore novel docs — rep = self,
    * split drawn on their own id, the increment's own rule.
    *
    * STATE: the per-doc aggregation buffer (matched positions + max
    * Jaccard + the doc's text) is probe-hit-bounded per DOC, but the
    * groupBy(doc_id) itself retains one buffer per doc EVER streamed —
    * without a watermark, update-mode aggregation state never evicts,
    * so a long-running query grows without bound (and the retained
    * text column makes each buffer heavier than the flag-only twins).
    * Pass `eventTime` = (timestamp column, delay) to bound it: the
    * aggregation then groups by (event-time window, doc_id) under a
    * watermark and evicts a doc's buffer once the watermark passes its
    * window. LATE-DATA CONTRACT: the watermark DROPS docs whose ts lags
    * the observed max by more than `delay`, and a dropped doc here
    * fails CLOSED for release (it is silently never released) — so
    * opting in requires near-monotone timestamps (ingest time, delay
    * above the pipeline's max reordering); see [[windowedGroup]] for
    * the full contract and the `windowLen` eviction-granularity knob.
    * StreamsSpec pins released-row parity with and without it. The
    * stored relations stream through one side of each equi-join, never
    * shuffled by the stream.
    */
  def releaseFrontDoorStream(
      docs: DataFrame, // streaming (idCol, textCol[, vec col][, ts col])
      weights: DataFrame, // static (dim LONG, w LONG), dim -1 = bias
      dims: Int,
      storedBands: DataFrame, // static (band, bucket, id) — DedupStore layout
      storedShingles: DataFrame, // static (id, s)
      storedGrams: DataFrame, // static (id, pos, g) — SpanStore layout
      idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      minTokens: Int,
      // OPTIONAL semantic stage (SemDeDup vs the persisted IVF store,
      // the increment's step 5b): (ivf relation in IndexStore layout —
      // (vec_id, v, cell) —, sign-cell dims, duplicate cosine ε, name
      // of the doc stream's vector column). A vector rides ON its doc
      // row (a stream-stream docs×vecs join is not expressible);
      // null-vector docs pass unprobed, the increment's own rule.
      semantic: Option[(DataFrame, Int, Double, String)] = None,
      // OPTIONAL state bound: (event-time TIMESTAMP column on the doc
      // stream, watermark delay e.g. "10 minutes") — see STATE above.
      eventTime: Option[(String, String)] = None,
      windowLen: Option[String] = None): DataFrame = {
    val gatedCols = Seq(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text")) ++
      semantic.map { case (_, _, _, vc) => col(vc).as("vec") } ++
      eventTime.map { case (tc, _) => col(tc).as("ts") }
    // Every probe leg carries the doc's event time so the one
    // aggregation can group under the watermark.
    val tsc = eventTime.toSeq.map(_ => col("ts"))
    val gated = docs
      .filter(marginExpr(weights, dims, textCol) > 0)
      .select(gatedCols: _*)
    val nullText = lit(null).cast("string").as("text")
    val nullJ = lit(null).cast("double").as("j")
    val nullPos = lit(null).cast("int").as("mpos")
    val nullSem = lit(null).cast("int").as("sem")

    // Leg 0: the doc itself — survives the inner probe joins even when
    // it hits nothing.
    val base = gated.select(
      Seq(col("doc_id"), col("text"), nullJ, nullPos, nullSem) ++ tsc: _*)

    // Near-dup leg: banding identical to nearDupStream/DedupStore.
    val numHashes = bands * rowsPerBand
    val withSh = gated.select(Seq(col("doc_id"),
        graft.text.TextFns.shingles(col("text"), n).as("sh")) ++ tsc: _*)
      .filter(size(col("sh")) > 0)
    val minCols = (0 until numHashes).map { k =>
      array_min(transform(col("sh"), s => xxhash64(s, lit(k)))).as(s"m$k")
    }
    val sig = withSh.select(
      Seq(col("doc_id"), col("sh")) ++ tsc ++ minCols: _*)
    val bandCols = (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(k => col(s"m$k")): _*).as(s"b$b")
    }
    val banded = sig
      .select(Seq(col("doc_id"), col("sh")) ++ tsc ++ bandCols: _*)
      .select(Seq(col("doc_id"), col("sh"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("bucket"))): _*)).as("e"))
        ++ tsc: _*)
      .select(Seq(col("doc_id"), col("sh"),
        col("e.band").as("band"), col("e.bucket").as("bucket")) ++ tsc: _*)
    // Static-side pre-aggregation: one shingle ARRAY per stored doc, so
    // the exact-Jaccard refine is a row-local set intersection instead
    // of a (forbidden) second streaming aggregation. shingleIndex rows
    // are distinct per doc, so array sizes are set cardinalities.
    val storedSets = storedShingles.groupBy(col("id").as("old_id"))
      .agg(collect_list(col("s")).as("old_sh"))
    val common = size(array_intersect(col("sh"), col("old_sh")))
    val ndLeg = banded
      .join(storedBands.select(col("band"), col("bucket"),
        col("id").as("old_id")), Seq("band", "bucket"))
      .join(storedSets, "old_id")
      .select(Seq(col("doc_id"), nullText,
        (common.cast("double") /
          (size(col("sh")) + size(col("old_sh")) - common).cast("double"))
          .as("j"),
        nullPos, nullSem) ++ tsc: _*)

    // Span leg: matched anchor positions vs the stored gram relation.
    val toks = graft.text.TextFns.tokens(col("text"))
    val gramArr = when(size(toks) >= minTokens,
        transform(sequence(lit(0), size(toks) - minTokens),
          i => array_join(slice(toks, i + 1, lit(minTokens)), " ")))
      .otherwise(lit(Array.empty[String]))
    val spanLeg = gated
      .select(Seq(col("doc_id"), posexplode(gramArr).as(Seq("mpos", "g")))
        ++ tsc: _*)
      .join(storedGrams.select(col("g")).distinct(), "g")
      .select(Seq(col("doc_id"), nullText, nullJ, col("mpos"), nullSem)
        ++ tsc: _*)

    // Optional SEMANTIC leg — the stored arm of the increment's SemDeDup
    // stage: the doc's vector computes its sign cell row-locally, a
    // stream-static equi-join probes the IVF store's cell, and the
    // ε-refine is the exact cosine; any hit drops the doc (within-batch
    // peers are the batch increment's job, like every other leg).
    val semLeg = semantic.map { case (store, vdims, veps, _) =>
      gated.filter(col("vec").isNotNull)
        .select(Seq(col("doc_id"), col("vec"),
          graft.sim.IndexStore.cellOf(col("vec"), vdims).as("cell")) ++ tsc: _*)
        .join(store.select(col("cell"), col("v").as("nv")), Seq("cell"))
        .filter(graft.sim.Similarity.cosine(col("vec"), col("nv")) >= veps)
        .select(Seq(col("doc_id"), nullText, nullJ, nullPos,
          lit(1).as("sem")) ++ tsc: _*)
    }

    val legs = Seq(base, ndLeg, spanLeg) ++ semLeg
    val unioned = legs.reduce(_ unionAll _)
    // With an event time, group under the watermark by (window, doc_id):
    // every leg row of a doc carries the SAME ts (it rides the doc's
    // input row), so the window key partitions docs exactly as the bare
    // doc_id key does — identical groups, evictable state.
    val grouping = windowedGroup(unioned, eventTime, windowLen, col("doc_id"))
    val agg = grouping
      .agg(max(col("j")).as("jmax"),
        collect_set(col("mpos")).as("cut"),
        max(col("sem")).as("semhit"),
        max(col("text")).as("text"))
    val t = graft.text.TextFns.tokens(col("text"))
    val keptPos = filter(sequence(lit(0), size(t) - 1),
      p => !exists(col("cut"), q => p >= q && p < q + minTokens))
    agg
      .filter((col("jmax").isNull || col("jmax") < threshold) &&
        col("semhit").isNull)
      .select(col("doc_id"), col("doc_id").as("rep_id"),
        graft.release.ReleaseStore.splitOf(col("doc_id")).as("split"),
        when(size(t) === 0, lit(""))
          .otherwise(array_join(
            transform(keptPos, p => element_at(t, p + 1)), " "))
          .as("text_dedup"))
  }

  /** Streaming quality-DRIFT monitor — the live tail of the classifier
    * lifecycle (t22 train → t23 score → t24 calibrate → monitor): tumbling-
    * window aggregates of the stateless margin scorer over arriving
    * documents. Per window: volume, positive-prediction rate, weak-label
    * agreement rate, and the exact integer margin sum — the signals a
    * curation front-door alarms on when the crawl mix drifts away from
    * the distribution the classifier was trained on (agreement falling =
    * the weak heuristic and the model diverging; pos_rate moving = the
    * accept fraction shifting). Margin and weak label are the same
    * zero-state projections as [[classifierScoreStream]] (weights ship as
    * plan literals; the weak label is the batch
    * [[graft.ml.LinearClassifier.weakLabels]] spelling), so the ONLY
    * state is the windowed aggregation under the watermark — bounded by
    * the lateness horizon at any stream rate. StreamsSpec pins exact
    * parity against the batch computation of the same windows.
    */
  def qualityDriftStream(
      docs: DataFrame, // streaming (idCol, textCol, ts TIMESTAMP)
      weights: DataFrame, // static (dim LONG, w LONG), dim -1 = bias
      dims: Int,
      textCol: String,
      watermark: String = "10 minutes",
      windowLength: String = "10 minutes"): DataFrame = {
    val toks = graft.text.TextFns.tokens(col(textCol))
    val margin = marginExpr(weights, dims, textCol)
    val hits = size(filter(toks, tok =>
      tok.isin(graft.text.TextFns.Stopwords: _*)))
    val y = when(hits * 16 > size(toks), 1L).otherwise(-1L)
    docs
      .select(col("ts"), margin.as("margin"), y.as("y"))
      .withColumn("pred", when(col("margin") > 0, 1L).otherwise(-1L))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_agree"),
        sum(col("margin")).as("margin_sum"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_docs"), col("n_pos"), col("n_agree"), col("margin_sum"),
        round(col("n_pos").cast("double") / col("n_docs"), 6).as("pos_rate"),
        round(col("n_agree").cast("double") / col("n_docs"), 6).as("agree_rate"))
  }

  /** Batch reference for [[sessionize]] (same semantics, same rounding) —
    * used by tests to check stream/batch parity.
    */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val msCol = unix_millis(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(msCol, col("event_id"))
    events.toDF()
      .withColumn("new_s",
        when(lag(msCol, 1).over(w).isNull || (msCol - lag(msCol, 1).over(w)) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("session_value"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("session_value"))
  }
}
