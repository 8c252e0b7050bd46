package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: INCREMENTAL vs BATCH near-dup at corpus scale — the number
  * behind [[graft.dedup.DedupStore]]'s reason to exist. A curation
  * pipeline admitting a daily batch can either re-run the batch
  * operator over (corpus ∪ batch) — re-shingling and re-hashing the
  * whole corpus for every increment — or probe the stored band/shingle
  * relations with just the batch. Work differs by O(|corpus| / |batch|);
  * this harness measures it on an AMPLIFIED corpus (×`AB_AMP`
  * replicated doc_ids, default 32) with the sf-dir documents as the
  * arriving batch.
  *
  * Reported: store build wall (one-time, amortized), incremental
  * searchNew wall, batch-operator-on-union wall, and the pair counts
  * (the incremental result is the union result restricted to
  * batch-touching pairs — equality is spec-pinned in DedupStoreSpec at
  * sf0.001; here the counts are printed as a sanity line).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AbDedupInc"
  */
object AbDedupInc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val amp = sys.env.getOrElse("AB_AMP", "32").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (n, bands, rpb, thr) = (3, 16, 4, 0.5)

    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // Corpus: amp replicas with distinct ids AND rep-prefixed tokens, so
    // replicas are NOT near-dups of each other or of the batch (every
    // shingle carries the prefix) while each replica keeps the original
    // corpus's internal near-dup structure. The first spelling used raw
    // replicas: 32x mutual near-dups made the run output-bound (291k
    // pairs) and hid the asymmetry this harness exists to measure —
    // the corpus-sized shingle+hash work the incremental path skips.
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

    val dir = java.nio.file.Files.createTempDirectory("graft_ab_dedupinc").toString
    val (_, buildWall) = timed {
      graft.dedup.DedupStore.save(corpus, "doc_id", "text", n, bands, rpb, s"$dir/ix")
    }
    sweep()
    val (incPairs, incWall) = timed {
      graft.dedup.DedupStore.searchNew(
        spark, s"$dir/ix", batch, "doc_id", "text", n, bands, rpb, thr).count()
    }
    sweep()
    val (unionPairs, unionWall) = timed {
      graft.dedup.Dedup.minhashLshPairs(
        corpus.unionAll(batch), "doc_id", "text", n, bands, rpb, thr).count()
    }
    sweep()
    println(f"AB-DEDUPINC amp=$amp corpus=${amp}x batch=1x " +
      f"build=$buildWall%.1f s incremental=$incWall%.1f s " +
      f"batch_union=$unionWall%.1f s speedup=${unionWall / incWall}%.1f" +
      f"x inc_pairs=$incPairs union_pairs=$unionPairs")

    // COMPACTION leg: the same corpus arriving as AB_CHUNKS increments —
    // every append leaves its own file set in all three relations, so
    // the probe pays a file-count tax that one save never shows (the
    // "residual scan growth" named in the r10 notes). Measure the probe
    // against the fragmented store, compact, re-probe: the delta is what
    // one bounded rewrite buys back, and compact-probe ≈ the single-save
    // probe above is the flatness claim.
    val chunks = sys.env.getOrElse("AB_CHUNKS", "16").toInt
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ab_dedupfrag").toString
    def parquetFiles(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      Seq("bands", "shingles", "counts")
        .map(r => walk(new java.io.File(s"$p/$r"))
          .count(_.getName.endsWith(".parquet"))).sum
    }
    val (_, fragBuild) = timed {
      (0 until chunks).foreach { i =>
        val chunk = corpus.filter(pmod(col("doc_id"), lit(chunks)) === i)
        if (i == 0)
          graft.dedup.DedupStore.save(chunk, "doc_id", "text", n, bands, rpb, s"$dir2/ix")
        else
          graft.dedup.DedupStore.append(chunk, "doc_id", "text", n, bands, rpb, s"$dir2/ix")
      }
    }
    sweep()
    val filesFrag = parquetFiles(s"$dir2/ix")
    val (fragPairs, fragWall) = timed {
      graft.dedup.DedupStore.searchNew(
        spark, s"$dir2/ix", batch, "doc_id", "text", n, bands, rpb, thr).count()
    }
    sweep()
    val (_, compactWall) = timed {
      graft.dedup.DedupStore.compact(spark, s"$dir2/ix")
    }
    sweep()
    val filesCompact = parquetFiles(s"$dir2/ix")
    val (compPairs, compWall) = timed {
      graft.dedup.DedupStore.searchNew(
        spark, s"$dir2/ix", batch, "doc_id", "text", n, bands, rpb, thr).count()
    }
    require(compPairs == fragPairs && compPairs == incPairs,
      s"probe diverged across layouts: one-save=$incPairs fragmented=$fragPairs compacted=$compPairs")
    println(f"AB-DEDUPINC-COMPACT chunks=$chunks frag_build=$fragBuild%.1f s " +
      f"files=$filesFrag probe_frag=$fragWall%.1f s " +
      f"compact=$compactWall%.1f s files_after=$filesCompact " +
      f"probe_compacted=$compWall%.1f s probe_onesave=$incWall%.1f s")

    // PRUNE leg: the v2 id-bucketed layout vs the LEGACY unbucketed one,
    // same one-save corpus, NARROW probes (AB_PROBE_DOCS docs — the
    // hit-sparse regime where id-bucket pruning exists: a handful of
    // candidate ids land in a handful of idb buckets, so the refine's
    // shingle/count FILE reads follow the hit count, not the corpus;
    // broad batches saturate every bucket and adaptively skip the
    // filter, paying only the bounded bucket-collect).
    val probeDocs = sys.env.getOrElse("AB_PROBE_DOCS", "8").toInt
    // plain (uncheckpointed): the inter-leg sweep() unpersists every
    // cached block, and an 8-doc orderBy-limit recompute is free here
    val narrow = batch.orderBy(col("doc_id")).limit(probeDocs)
    // The rep-prefixed corpus shares nothing with the batch, so the
    // PRUNE stores add unprefixed TWINS (ids shifted) — each narrow doc
    // has a real stored near-dup and the refine has stored ids to
    // restrict to. Both layouts get the same corpus.
    val corpusP = corpus.unionAll(base.select(
      (col("doc_id") + 2000000L).as("doc_id"), col("text")))
    // Force the pruned path: the amplified local stores sit below the
    // production size gate that skips discovery on small relations.
    graft.dedup.SpanStore.PruneMinStoreBytes = 0L
    val dirL = java.nio.file.Files.createTempDirectory("graft_ab_deduplegacy").toString
    val dirP = java.nio.file.Files.createTempDirectory("graft_ab_dedupv2").toString
    graft.dedup.DedupStore.save(corpusP, "doc_id", "text", n, bands, rpb,
      s"$dirL/ix", idBuckets = 0)
    graft.dedup.DedupStore.save(corpusP, "doc_id", "text", n, bands, rpb,
      s"$dirP/ix")
    sweep()
    // Two interleaved reps per layout (both JIT-warm from the legs
    // above), min reported — the session-cold first probe is not a fair
    // baseline for either side.
    def probeOf(p: String): (Long, Double) = {
      val r = timed {
        graft.dedup.DedupStore.searchNew(
          spark, p, narrow, "doc_id", "text", n, bands, rpb, thr).count()
      }
      sweep(); r
    }
    val reps = Seq(probeOf(s"$dirL/ix"), probeOf(s"$dirP/ix"),
      probeOf(s"$dirL/ix"), probeOf(s"$dirP/ix"))
    val legacyWall = math.min(reps(0)._2, reps(2)._2)
    val v2Wall = math.min(reps(1)._2, reps(3)._2)
    require(reps.map(_._1).distinct.size == 1,
      s"probe diverged across layouts: ${reps.map(_._1)}")
    println(f"AB-DEDUPINC-PRUNE amp=$amp probe_docs=$probeDocs " +
      f"probe_legacy=$legacyWall%.1f s probe_v2=$v2Wall%.1f s " +
      f"speedup=${legacyWall / v2Wall}%.1fx pairs=${reps(0)._1}")
    spark.stop()
  }
}
