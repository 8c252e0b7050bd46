package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted repeated-span (ExactSubstr) index — [[DedupStore]]'s
  * sibling for the d10/d19 family, closing the incremental-curation gap
  * the batch operators leave: [[Dedup.spanDedup]] rebuilds the
  * anchor-gram relation over the WHOLE corpus per run, so a pipeline
  * re-running span dedup per crawl increment pays O(corpus) tokenize +
  * window work for O(batch) questions. This store persists the one
  * relation the operator derives from the corpus:
  *
  *   `<path>/grams`:   (id, pos, g) — every complete minTokens-token
  *                     anchor window of every accepted document
  *                     ([[Dedup.anchorGrams]]), the blocking state AND
  *                     the span-merge input in one. v2 stores Hive-
  *                     partition it by gb = pmod(xxhash64(g),
  *                     gram_buckets) for the probe's file pruning.
  *   `<path>/gramidx`: (gh) — the distinct gram HASHES, the cheap
  *                     existence index the probe consults to find which
  *                     gb partitions can hold a batch-matching gram
  *                     (matched grams are rare, so most partitions
  *                     prune even for broad batches).
  *   `<path>/layout`:  one-row meta (gram_buckets); pre-upgrade stores
  *                     lack it and read as legacy ([[compact]] migrates
  *                     them).
  *
  * The anchor-gram family is deterministic across batches, so probing
  * stored grams with a new batch's grams is EQUAL to running
  * [[Dedup.spanDedup]] on (stored ∪ new) and keeping the spans that
  * touch the new batch — SpanStoreSpec pins that equality. [[append]]
  * adds the new batch's grams; nothing old is recomputed or rewritten.
  *
  * Scale shape: save/append tokenize and window ONLY the batch;
  * [[searchNew]] joins the batch's grams against the stored relation by
  * gram content (inverted-index equi-join — the stored corpus streams
  * through as one join side, never a self-join) plus the batch-vs-batch
  * arm, then runs the per-(pair, diagonal) islands merge on the
  * seed-sized result. Skew risk (a boilerplate gram shared by many
  * docs) is the same profile as the batch operator — cap stop-grams by
  * document frequency upstream and let AQE skew-split the residue.
  */
object SpanStore {

  /** Default gram-bucket count for new stores (the v2 layout). */
  private[dedup] val DefaultGramBuckets = 32

  /** Minimum stored-relation size before a probe runs its pruning
    * DISCOVERY pass (the gramidx intersection scan / bucket collect).
    * Below this a straight scan of the relation is cheaper than the
    * discovery job that would prune it. Test-visible so specs can force
    * the pruned path on fixture-sized stores.
    */
  @volatile private[graft] var PruneMinStoreBytes: Long = 256L << 20

  private[dedup] def dirBytes(spark: SparkSession, p: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) 0L else fs.getContentSummary(hp).getLength
  }

  private def gbOf(g: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(g), lit(buckets.toLong)).cast("int")

  private def writeGrams(
      g: DataFrame, buckets: Option[Int], path: String, mode: String): Unit =
    buckets match {
      case Some(b) =>
        g.select(col("id"), col("pos"), col("g"))
          .withColumn("gb", gbOf(col("g"), b))
          .repartition(b, col("gb"))
          .write.mode(mode).partitionBy("gb").parquet(s"$path/grams")
      case None =>
        g.select(col("id"), col("pos"), col("g"))
          .write.mode(mode).parquet(s"$path/grams")
    }

  /** The per-increment df partials + (on the v2 layout) the existence
    * INDEX, from ONE aggregation pass: the distinct-gram relation the
    * partials are built on IS the index's row set, so gramidx is a
    * hash projection of the checkpointed aggregate — no second shuffle
    * over the batch's grams. The index holds one long per distinct
    * gram, ~an order of magnitude fewer bytes than the pos-level
    * relation; the probe's pruning scans it to find which gb
    * partitions can hold a batch-matching gram. Hash collisions and
    * rows surviving a remove only ADD buckets (pruning stays a
    * superset — always correct); [[compact]] rebuilds it exactly.
    *
    * WRITE ORDER is a crash-safety invariant: gramidx lands FIRST
    * (before gramdf here, before the grams relation in [[write]] /
    * the fused append), so a torn append can only ever leave the index
    * a SUPERSET of the stored grams — extra hashes add pruning buckets,
    * which is always safe, whereas missing hashes would silently hide
    * true span matches from every uncapped probe until the next
    * compact. The residue of a torn append is then at worst inflated
    * df partials (rows whose grams never landed), which can over-cap a
    * `maxDf` probe but never lose an uncapped match; re-running the
    * failed append (the batch-retry contract) or a compact settles it.
    */
  private def writeDfAndIndex(
      g: DataFrame, buckets: Option[Int], path: String, mode: String): Unit = {
    val dfPart = g.select(col("g"), col("id")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("nd"))
      .localCheckpoint(true) // feeds gramidx AND gramdf
    if (buckets.isDefined)
      dfPart.select(xxhash64(col("g")).as("gh"))
        .write.mode(mode).parquet(s"$path/gramidx")
    dfPart.write.mode(mode).parquet(s"$path/gramdf")
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(dfPart)
  }

  private def write(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, path: String, mode: String,
      buckets: Option[Int]): Unit = {
    val g = Dedup.anchorGrams(docs, idCol, textCol, minTokens)
      .localCheckpoint(true) // written twice (grams + df partials)
    // Per-increment document-frequency PARTIALS (g, nd) — additive like
    // DedupStore's counts relation (ids never repeat across batches), so
    // the stop-gram cap's union df is a sum of partials, never a rescan
    // of the pos-level gram relation. [[compact]] merges them;
    // [[remove]] appends negated rows (exact integer subtraction).
    // Index + partials BEFORE grams (see [[writeDfAndIndex]]'s order
    // invariant): a torn append leaves the existence index a superset.
    writeDfAndIndex(g, buckets, path, mode)
    writeGrams(g, buckets, path, mode)
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(g)
  }

  /** Build + persist the anchor-gram index for an initial corpus.
    * `gramBuckets` picks the v2 layout's bucket count (≤ 1 = the legacy
    * unbucketed layout, kept for the A/B harnesses and pre-upgrade
    * parity).
    */
  def save(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, path: String,
      gramBuckets: Int = DefaultGramBuckets): Unit = {
    val b = if (gramBuckets > 1) Some(gramBuckets) else None
    write(docs, idCol, textCol, minTokens, path, "overwrite", b)
    val s = docs.sparkSession
    b match {
      case Some(x) => DedupStore.writeLayout(s, path, "gram_buckets", x)
      case None =>
        val lp = new org.apache.hadoop.fs.Path(s"$path/layout")
        lp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(lp, true)
        ()
    }
  }

  /** Add a new batch to the stored index (call AFTER [[searchNew]] has
    * adjudicated it). Append-only: old state is untouched; the batch
    * lands in whatever layout the store declares.
    */
  def append(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, path: String): Unit =
    write(docs, idCol, textCol, minTokens, path, "append",
      DedupStore.appendLayout(
        docs.sparkSession, path, "gram_buckets", "grams", "gb"))

  /** Maintenance: rewrite the gram relation into `files` gram-clustered
    * files. Each [[append]] leaves its own shuffle-parallelism-sized file
    * set, so a many-increment store's probe pays a file-count tax on the
    * two stored scans (the AbSpanInc residual) — the same fragmentation
    * [[DedupStore.compact]] and [[graft.sim.IndexStore.compact]] fix.
    * Rows are range-repartitioned and sorted by gram content, so each
    * file carries a tight min/max `g` range in its parquet footer and
    * the probe's content equi-join reads gram-clustered runs. Crash
    * safety is the shared rename-aside swap: stage to
    * `<path>/.compact.tmp`, live → `.old`, tmp → live, delete `.old`.
    * A crash anywhere in the swap leaves either the live `grams` dir or
    * its `grams.old` copy intact (recover by renaming `.old` back) —
    * never a hole, but note the window between the two renames has no
    * live path, so concurrent probes can fail until recovery.
    * [[searchNew]] results are row-identical across layouts
    * (SpanStoreSpec pins it).
    */
  def compact(spark: SparkSession, path: String, files: Int = 8): Unit = {
    require(files >= 1, s"files must be >= 1; got $files")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(path, ".compact.tmp")
    fs.delete(tmp, true)
    // A bucketed store compacts to one gram-sorted file per bucket; a
    // LEGACY store MIGRATES to the bucketed layout here (the layout meta
    // is STAGED into tmp and swaps LAST, so a crash mid-migration leaves
    // bucketed relations with a missing — never wrong — meta: reads stay
    // correct as legacy and appends are refused until the idempotent
    // recover + compact re-run). The existence index is rebuilt EXACTLY
    // from the live grams, retiring hashes whose grams a remove() purged.
    val buckets = DedupStore.readLayout(spark, path, "gram_buckets")
      .getOrElse(DefaultGramBuckets)
    // stagedWrite: retry-once on a transient task-commit denial — the
    // r18 driver run's VERIFY failure died exactly here (see
    // [[DedupStore.stagedWrite]] for the race: a denied commit wrapped
    // as TASK_WRITE_FAILED counts as a plain task failure under local
    // mode's maxTaskFailures = 1). The staged dir is private until the
    // swap, so the clean retry is always safe.
    val live = spark.read.parquet(s"$path/grams")
      .select(col("id"), col("pos"), col("g"))
    DedupStore.stagedWrite(spark, s"$tmp/grams") {
      live.withColumn("gb", gbOf(col("g"), buckets))
        .repartition(buckets, col("gb"))
        .sortWithinPartitions(col("g"), col("id"), col("pos"))
        .write.partitionBy("gb").parquet(s"$tmp/grams")
    }
    // Merge the per-increment df partials into one row per gram
    // (dropping grams a remove() fully cancelled) — the capped probe's
    // heavy-gram aggregation then reads pre-merged rows, and the
    // surviving gram set IS the live distinct-gram set (gramdf and
    // grams move through the same swaps in lockstep), so the existence
    // index rebuilds from the SAME merged aggregate — retiring removed
    // hashes without a second pass over the pos-level relation.
    val merged = gramDf(spark, path)
      .groupBy(col("g")).agg(sum(col("nd")).as("nd"))
      .filter(col("nd") > 0)
      .localCheckpoint(true) // feeds gramdf AND gramidx
    DedupStore.stagedWrite(spark, s"$tmp/gramdf") {
      merged
        .repartitionByRange(files, col("g"))
        .sortWithinPartitions(col("g"))
        .write.parquet(s"$tmp/gramdf")
    }
    DedupStore.stagedWrite(spark, s"$tmp/gramidx") {
      merged.select(xxhash64(col("g")).as("gh"))
        .write.parquet(s"$tmp/gramidx")
    }
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(merged)
    DedupStore.writeLayoutFile(spark, s"$tmp/layout", "gram_buckets", buckets)
    // gramidx swaps BEFORE grams so every kill point keeps the index a
    // superset of the live grams (the staged index covers the staged
    // grams AND, being rebuilt from merged partials, the still-live old
    // generation); layout swaps last (missing beats wrong).
    DedupStore.swapRelations(fs, root, tmp,
      Seq("gramidx", "grams", "gramdf", "layout"))
  }

  /** [[DedupStore.recoverRelations]] over this store's relation set
    * (incl. the swap-staged layout meta).
    */
  def recover(spark: SparkSession, path: String): Unit =
    DedupStore.recoverRelations(
      spark, path, Seq("grams", "gramdf", "gramidx", "layout"))

  /** The stored df-partials relation. A store written before the
    * `gramdf` relation existed is backfilled from `grams` on the fly
    * (one distinct + groupBy pass — the same derivation [[write]]
    * persists), so [[compact]] / [[remove]] / a capped [[searchNew]]
    * never fail on a pre-upgrade store; the next [[compact]] persists
    * the merged relation and retires the backfill.
    */
  private def gramDf(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/gramdf")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(s"$path/gramdf")
    else spark.read.parquet(s"$path/grams")
      .select(col("g"), col("id")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("nd"))
  }

  /** Takedown: rewrite the gram relation WITHOUT the given doc ids
    * (first column of `ids`, castable to long) — [[DedupStore.remove]]'s
    * span sibling. After remove, [[searchNew]] behaves exactly as if the
    * removed docs had never been saved (SpanStoreSpec pins probe
    * equality with a from-scratch store built without them): one
    * anti-join rewrite through the shared crash-safe rename-aside swap,
    * O(store) like a compact — batch takedown ids together. Removing
    * every stored doc leaves an empty store that must be re-[[save]]d.
    */
  def remove(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val gone = ids.select(col(ids.columns.head).cast("long").as("id")).distinct()
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(path, ".remove.tmp")
    fs.delete(tmp, true)
    val live = spark.read.parquet(s"$path/grams")
    // Survivors rewrite in the store's declared layout. The existence
    // index is NOT rewritten: a removed gram's hash lingering there only
    // adds pruning buckets (a superset — always correct); the next
    // [[compact]] rebuilds it exactly.
    val survivors = live.join(gone, Seq("id"), "left_anti")
      .select(col("id"), col("pos"), col("g"))
    DedupStore.stagedWrite(spark, s"$tmp/grams") {
      DedupStore.readLayout(spark, path, "gram_buckets") match {
        case Some(b) =>
          survivors.withColumn("gb", gbOf(col("g"), b))
            .repartition(b, col("gb"))
            .write.partitionBy("gb").parquet(s"$tmp/grams")
        case None => survivors.write.parquet(s"$tmp/grams")
      }
    }
    // df partials: append the removed docs' NEGATED per-gram doc counts
    // (computed from the still-live gram relation), staged together with
    // the filtered grams so the swap keeps the two relations consistent.
    val negDf = live.join(gone, Seq("id"), "left_semi")
      .select(col("g"), col("id")).distinct()
      .groupBy(col("g")).agg((-count(lit(1))).as("nd"))
    DedupStore.stagedWrite(spark, s"$tmp/gramdf") {
      gramDf(spark, path).unionAll(negDf)
        .write.parquet(s"$tmp/gramdf")
    }
    DedupStore.swapRelations(fs, root, tmp, Seq("grams", "gramdf"))
  }

  /** Repeated spans of a NEW batch against the stored corpus AND within
    * the batch itself — [[Dedup.spanDedup]] on (stored ∪ new) restricted
    * to new-touching pairs, without touching the stored corpus beyond
    * one gram equi-join per orientation. Returns the spanDedup contract:
    * (doc_a, doc_b, start_a, start_b, span_len), doc_a < doc_b,
    * 0-based token offsets, span_len ≥ minTokens, ordered. Ids must be
    * globally unique across batches (caller contract, as DedupStore).
    *
    * The three seed arms are disjoint by construction (doc_a < doc_b
    * fixes the orientation of each new-vs-stored pair; batch-vs-batch
    * pairs are id-distinct from both), so their union feeds the shared
    * islands merge exactly as the batch operator's one self-join would.
    *
    * `maxDf` is the stop-gram cap ([[Dedup.spanDedup]]'s skew guard,
    * incremental edition): grams present in more than `maxDf` distinct
    * documents ACROSS THE UNION (stored + batch) are anti-joined out of
    * both seed sides before the equi-join. The union document frequency
    * is the sum of the store's additive `gramdf` partials plus the
    * batch's own per-gram df — never a rescan of the pos-level stored
    * gram relation — so a capped probe equals the capped batch operator
    * on the union restricted to new-touching pairs (SpanStoreSpec pins
    * it). Identity at the default.
    */
  def searchNew(
      spark: SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, maxDf: Int = Int.MaxValue): DataFrame =
    searchNewImpl(spark, path, newDocs, idCol, textCol, minTokens, maxDf,
      alsoAppend = false)

  /** [[searchNew]] + [[append]] fused into ONE pass over the batch —
    * [[DedupStore.searchNewAndAppend]]'s span sibling: the probe's
    * anchor-gram relation (UNCAPPED — the cap is per-probe, the store
    * holds everything) is written after the probe result materializes
    * (eager checkpoint, required so the lazy stored-gram reads don't
    * see the batch's own rows). Saves the batch's second tokenize +
    * window pass. Equality with the two-call spelling is spec-pinned
    * (SpanStoreSpec); the result carries a checkpoint — caller frees.
    */
  def searchNewAndAppend(
      spark: SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, maxDf: Int = Int.MaxValue): DataFrame =
    searchNewImpl(spark, path, newDocs, idCol, textCol, minTokens, maxDf,
      alsoAppend = true)

  private def searchNewImpl(
      spark: SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, maxDf: Int, alsoAppend: Boolean): DataFrame = {
    val newG0 = Dedup.anchorGrams(newDocs, idCol, textCol, minTokens)
      .localCheckpoint(true) // probed twice (store arm + self) + appended
    val layout = DedupStore.readLayout(spark, path, "gram_buckets")
    // v2 pruning: only grams present on BOTH sides can seed a span, and
    // true matches are rare even when the batch's own gram set covers
    // every bucket — so discover the INTERSECTION's buckets through the
    // cheap hash-only existence index and read only those partitions of
    // the pos-level relation. The bucket set is ≤ gram_buckets driver
    // scalars; a full set skips the filter. The discovery pass itself
    // costs an index scan + a driver job, so it only runs once the
    // stored relation is big enough for the pruned read to pay for it
    // (below [[PruneMinStoreBytes]] a straight scan is cheaper — the
    // p22 sf0.1 increment regressed 11.7→15.8 s before this gate).
    // Explicit column projection keeps a meta-less (mid-migration)
    // store reading as legacy.
    val storedAll = layout match {
      case Some(b) if dirBytes(spark, s"$path/grams") >= PruneMinStoreBytes =>
        val hit = spark.read.parquet(s"$path/gramidx")
          .join(newG0.select(xxhash64(col("g")).as("gh")).distinct(),
            Seq("gh"), "left_semi")
          .select(pmod(col("gh"), lit(b.toLong)).cast("int").as("gb"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val raw = spark.read.parquet(s"$path/grams")
        (if (hit.size >= b) raw else raw.filter(col("gb").isin(hit: _*)))
          .select(col("id"), col("pos"), col("g"))
      case _ =>
        spark.read.parquet(s"$path/grams").select(col("id"), col("pos"), col("g"))
    }
    val (newG, stored, heavyOpt) =
      if (maxDf == Int.MaxValue) (newG0, storedAll, None)
      else {
        require(maxDf >= 1, s"maxDf must be >= 1; got $maxDf")
        val batchDf = newG0.select(col("g"), col("id")).distinct()
          .groupBy(col("g")).agg(count(lit(1)).cast("long").as("nd"))
        // Union df = stored partial sums + batch df; the heavy list is
        // df-bounded (≤ total-grams / maxDf rows) and AQE broadcasts
        // both anti-joins. Checkpointed: consumed by both seed sides.
        val heavy = gramDf(spark, path).unionAll(batchDf)
          .groupBy(col("g")).agg(sum(col("nd")).as("nd"))
          .filter(col("nd") > maxDf)
          .select(col("g"))
          .localCheckpoint(true)
        (newG0.join(heavy, Seq("g"), "left_anti"),
          storedAll.join(heavy, Seq("g"), "left_anti"), Some(heavy))
      }
    def arm(a: DataFrame, b: DataFrame): DataFrame =
      a.select(col("id").as("doc_a"), col("pos").as("pa"), col("g"))
        .join(b.select(col("id").as("doc_b"), col("pos").as("pb"),
          col("g").as("g_b")), col("g") === col("g_b"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"))
    // New-vs-stored in ONE equi-join: each matched occurrence pair is
    // oriented by the id comparison instead of a second mirrored arm,
    // HALVING the stored gram scan (identical scans are not reused —
    // only exchanges are).
    val lt = col("id_n") < col("id_s")
    val crossSeeds = newG
      .select(col("id").as("id_n"), col("pos").as("p_n"), col("g"))
      .join(stored.select(col("id").as("id_s"), col("pos").as("p_s"),
        col("g").as("g_b")),
        col("g") === col("g_b") && col("id_n") =!= col("id_s"))
      .select(
        when(lt, col("id_n")).otherwise(col("id_s")).as("doc_a"),
        when(lt, col("id_s")).otherwise(col("id_n")).as("doc_b"),
        when(lt, col("p_n")).otherwise(col("p_s")).as("pa"),
        when(lt, col("p_s")).otherwise(col("p_n")).as("pb"))
    val seeds = crossSeeds.unionAll(arm(newG, newG))
    val spans = Dedup.spansFromSeeds(seeds, minTokens)
    if (!alsoAppend) spans
    else {
      // Same meta-vs-disk agreement check as [[append]]: a flat append
      // into a meta-less bucketed store (crashed migration) would
      // corrupt partition discovery for every later read.
      if (layout.isEmpty)
        require(!DedupStore.hasPartitionDirs(spark, s"$path/grams", "gb"),
          s"$path/grams is gb-bucketed on disk but the layout meta is " +
            "missing (crashed migration?) — run recover() then compact() " +
            "before appending")
      val res = spans.localCheckpoint(true)
      // Index + partials before grams (writeDfAndIndex's order
      // invariant): a torn append leaves the index a superset.
      writeDfAndIndex(newG0, layout, path, "append")
      writeGrams(newG0, layout, path, "append")
      // res' eager checkpoint truncated lineage above the gram
      // relation — free what the caller's sweep can no longer reach.
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(newG0)
      heavyOpt.foreach(
        org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint)
      res
    }
  }
}
