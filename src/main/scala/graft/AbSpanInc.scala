package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: INCREMENTAL vs BATCH span dedup at corpus scale — the number
  * behind [[graft.dedup.SpanStore]]'s reason to exist (the AbDedupInc
  * template, ExactSubstr edition). A pipeline re-running span dedup per
  * crawl increment can either re-run [[graft.dedup.Dedup.spanDedup]]
  * over (corpus ∪ batch) — re-tokenizing and re-windowing the whole
  * corpus into anchor grams every time — or probe the stored gram
  * relation with just the batch's grams. Work differs by
  * O(|corpus| / |batch|); measured here on an AMPLIFIED corpus
  * (×`AB_AMP` replicas with rep-prefixed tokens, so replicas share no
  * grams with each other or the batch while keeping each replica's
  * internal span structure) with the sf-dir documents as the arriving
  * batch.
  *
  * Reported: one-time store build wall, incremental searchNew wall,
  * batch-operator-on-union wall restricted to new-touching pairs, and
  * the span counts (equality is spec-pinned in SpanStoreSpec at
  * sf0.001; the counts here are a sanity line).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 AB_AMP=64 sbt "runMain graft.AbSpanInc"
  */
object AbSpanInc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val amp = sys.env.getOrElse("AB_AMP", "64").toInt
    val L = 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = base
      .crossJoin(spark.range(amp).select(col("id").as("rep")))
      .select((col("doc_id") * amp + col("rep") + 1000000L).as("doc_id"),
        concat_ws(" ", transform(graft.text.TextFns.tokens(col("text")),
          tk => concat(lit("r"), col("rep"), lit("_"), tk))).as("text"))
    val batch = base // arriving increment, original ids < 1000000

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // Every temp store is registered and deleted on the way out (the
    // entropy stores alone are 0.2–1 GB at the 512x amp; repeated
    // harness runs were accumulating gigabytes in /tmp).
    val tempDirs = scala.collection.mutable.ListBuffer.empty[String]
    def tempDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      tempDirs += d
      d
    }
    def rmTree(p: String): Unit = try {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
    } catch { case _: Throwable => () }

    try {

    val dir = tempDir("graft_ab_spaninc")
    val (_, buildWall) = timed {
      graft.dedup.SpanStore.save(corpus, "doc_id", "text", L, s"$dir/ix")
    }
    sweep()
    val (incSpans, incWall) = timed {
      val df = graft.dedup.SpanStore.searchNew(
        spark, s"$dir/ix", batch, "doc_id", "text", L)
      val n = df.count()
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
      n
    }
    sweep()
    val (unionSpans, unionWall) = timed {
      graft.dedup.Dedup.spanDedup(
          corpus.unionAll(batch), "doc_id", "text", L)
        .filter(col("doc_a") < 1000000L || col("doc_b") < 1000000L)
        .count()
    }
    sweep()
    println(f"AB-SPANINC amp=$amp corpus=${amp}x batch=1x " +
      f"build=$buildWall%.1f s incremental=$incWall%.1f s " +
      f"batch_union=$unionWall%.1f s speedup=${unionWall / incWall}%.1f" +
      f"x inc_spans=$incSpans union_new_spans=$unionSpans")

    // COMPACTION leg (the AbDedupInc/AbIvfCompact template): the same
    // corpus arriving as AB_CHUNKS increments fragments the gram
    // relation; probe fragmented, compact, re-probe.
    val chunks = sys.env.getOrElse("AB_CHUNKS", "16").toInt
    val dir2 = tempDir("graft_ab_spanfrag")
    def parquetFiles(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
    }
    val (_, fragBuild) = timed {
      (0 until chunks).foreach { i =>
        val chunk = corpus.filter(pmod(col("doc_id"), lit(chunks)) === i)
        if (i == 0)
          graft.dedup.SpanStore.save(chunk, "doc_id", "text", L, s"$dir2/ix")
        else
          graft.dedup.SpanStore.append(chunk, "doc_id", "text", L, s"$dir2/ix")
      }
    }
    sweep()
    val filesFrag = parquetFiles(s"$dir2/ix/grams")
    val (fragSpans, fragWall) = timed {
      val df = graft.dedup.SpanStore.searchNew(
        spark, s"$dir2/ix", batch, "doc_id", "text", L)
      val n = df.count()
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
      n
    }
    sweep()
    val (_, compactWall) = timed {
      graft.dedup.SpanStore.compact(spark, s"$dir2/ix")
    }
    sweep()
    val filesCompact = parquetFiles(s"$dir2/ix/grams")
    val (compSpans, compWall) = timed {
      val df = graft.dedup.SpanStore.searchNew(
        spark, s"$dir2/ix", batch, "doc_id", "text", L)
      val n = df.count()
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
      n
    }
    require(compSpans == fragSpans && compSpans == incSpans,
      s"probe diverged across layouts: one-save=$incSpans fragmented=$fragSpans compacted=$compSpans")
    println(f"AB-SPANINC-COMPACT chunks=$chunks frag_build=$fragBuild%.1f s " +
      f"files=$filesFrag probe_frag=$fragWall%.1f s " +
      f"compact=$compactWall%.1f s files_after=$filesCompact " +
      f"probe_compacted=$compWall%.1f s probe_onesave=$incWall%.1f s")

    // PRUNE leg: the v2 gram-bucketed layout vs the LEGACY unbucketed
    // one, same one-save corpus, NARROW probes (AB_PROBE_DOCS docs, the
    // maintenance/targeted-probe regime) — the intersection-bucket
    // pruning reads only gb partitions holding a batch-matching gram
    // hash, so the pos-level scan stops growing with the corpus. The
    // broad probe above covers every bucket (pruning adaptively skips
    // itself there; its cost against the corpus is the gramidx scan).
    val probeDocs = sys.env.getOrElse("AB_PROBE_DOCS", "8").toInt
    // plain (uncheckpointed): the inter-leg sweep() unpersists every
    // cached block, and an 8-doc orderBy-limit recompute is free here
    val narrow = batch.orderBy(col("doc_id")).limit(probeDocs)
    // The rep-prefixed corpus shares no grams with the batch; the PRUNE
    // stores add one DONOR doc carrying a 12-token slice of the first
    // narrow doc, so the probe has a real stored span hit and the
    // intersection is a handful of grams (the hit-sparse regime).
    val srcToks = narrow.limit(1)
      .select(graft.text.TextFns.tokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
    val donor = spark.range(1).select(
      lit(2000000L).as("doc_id"),
      lit("zqfila zqfilb zqfilc " + srcToks.take(12).mkString(" ") +
        " zqfild zqfile zqfilf").as("text"))
    val corpusP = corpus.unionAll(donor)
    // Force the pruned path: the amplified local stores sit below the
    // production size gate that skips discovery on small relations.
    graft.dedup.SpanStore.PruneMinStoreBytes = 0L
    val dirL = tempDir("graft_ab_spanlegacy")
    val dirP = tempDir("graft_ab_spanv2")
    graft.dedup.SpanStore.save(corpusP, "doc_id", "text", L, s"$dirL/ix",
      gramBuckets = 0)
    graft.dedup.SpanStore.save(corpusP, "doc_id", "text", L, s"$dirP/ix")
    sweep()
    def narrowProbe(p: String): (Long, Double) = {
      val r = timed {
        val df = graft.dedup.SpanStore.searchNew(
          spark, p, narrow, "doc_id", "text", L)
        val n = df.count()
        org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
        n
      }
      sweep(); r
    }
    // Two interleaved reps per layout, min reported (both sides are
    // JIT-warm from the legs above).
    val reps = Seq(narrowProbe(s"$dirL/ix"), narrowProbe(s"$dirP/ix"),
      narrowProbe(s"$dirL/ix"), narrowProbe(s"$dirP/ix"))
    val legacyWall = math.min(reps(0)._2, reps(2)._2)
    val v2Wall = math.min(reps(1)._2, reps(3)._2)
    require(reps.map(_._1).distinct.size == 1,
      s"narrow probe diverged across layouts: ${reps.map(_._1)}")
    println(f"AB-SPANINC-PRUNE amp=$amp probe_docs=$probeDocs " +
      f"probe_legacy=$legacyWall%.1f s probe_v2=$v2Wall%.1f s " +
      f"speedup=${legacyWall / v2Wall}%.1fx spans=${reps(0)._1}")

    // HIGH-ENTROPY PRUNE leg (r16 verdict #4): the `r<N>_tok` replica
    // tokens above compress ~perfectly (shared suffixes, tiny dictionary
    // pages), so at local sf the v2 probe's gramidx scan costs about
    // what the full gram scan does and the PRUNE leg reads wall-neutral.
    // Real crawl text is high-entropy — rebuild the SAME corpus shape
    // with hashed token surrogates (token → its per-replica-salted
    // xxhash64 hex, so replicas still share no grams with each other or
    // the batch) and re-run the narrow-probe A/B. Dictionary/prefix
    // encoding now buys little, stored bytes-per-row approach the real
    // regime, and the hash-only existence index (one long per distinct
    // gram) is the only corpus-sized relation the pruned probe reads in
    // full — the actual 100 TB argument, as a measured number instead
    // of a structural claim.
    def dirMb(p: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else f.length()
      walk(new java.io.File(p)) / 1e6
    }
    val entCorpus = base
      .crossJoin(spark.range(amp).select(col("id").as("rep")))
      .select((col("doc_id") * amp + col("rep") + 1000000L).as("doc_id"),
        concat_ws(" ", transform(graft.text.TextFns.tokens(col("text")),
          tk => lower(hex(xxhash64(concat(col("rep"), lit("_"), tk))))))
          .as("text"))
      .unionAll(donor) // same raw-token donor: the probe's one stored hit
    val dirLE = tempDir("graft_ab_spanentL")
    val dirPE = tempDir("graft_ab_spanentV")
    graft.dedup.SpanStore.save(entCorpus, "doc_id", "text", L, s"$dirLE/ix",
      gramBuckets = 0)
    graft.dedup.SpanStore.save(entCorpus, "doc_id", "text", L, s"$dirPE/ix")
    sweep()
    val repsE = Seq(narrowProbe(s"$dirLE/ix"), narrowProbe(s"$dirPE/ix"),
      narrowProbe(s"$dirLE/ix"), narrowProbe(s"$dirPE/ix"))
    val legacyWallE = math.min(repsE(0)._2, repsE(2)._2)
    val v2WallE = math.min(repsE(1)._2, repsE(3)._2)
    require(repsE.map(_._1).distinct.size == 1,
      s"entropy narrow probe diverged across layouts: ${repsE.map(_._1)}")
    println(f"AB-SPANINC-PRUNE-ENTROPY amp=$amp probe_docs=$probeDocs " +
      f"grams_mb=${dirMb(s"$dirPE/ix/grams")}%.0f " +
      f"gramidx_mb=${dirMb(s"$dirPE/ix/gramidx")}%.0f " +
      f"probe_legacy=$legacyWallE%.1f s probe_v2=$v2WallE%.1f s " +
      f"speedup=${legacyWallE / v2WallE}%.1fx spans=${repsE(0)._1}")

    } finally tempDirs.foreach(rmTree)
    spark.stop()
  }
}
