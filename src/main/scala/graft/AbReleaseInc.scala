package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: INCREMENTAL vs BATCH curation release at corpus scale — the
  * number behind [[graft.release.ReleaseStore]] (the AbDedupInc /
  * AbSpanInc template applied to the COMPOSED p22 pipeline). A crawl
  * pipeline can either re-run the whole batch chain (classifier train →
  * near-dup LSH self-join → CC → span dedup → split) over
  * (corpus ∪ batch) per arriving batch, or carry the four stores and
  * pay one [[graft.release.ReleaseStore.increment]]. Work differs by
  * O(|corpus| / |batch|) in the scan-bound stages.
  *
  * Corpus: sf-dir documents ×`AB_AMP` replicas with rep-prefixed
  * CONTENT tokens — stopwords stay verbatim so the weak-label
  * distribution (and hence the classifier gate) keeps its real shape,
  * while replicas share no content shingles/grams with each other or
  * the batch. Batch ids sit above all corpus ids (the store's monotone
  * contract).
  *
  * Reported: one-time store build wall, incremental release wall,
  * batch-chain-on-union wall, speedup, and released-row counts (the
  * exact increment == union equality is spec-pinned in
  * ReleaseStoreSpec at sf0.001; counts here are a sanity line).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 AB_AMP=16 sbt "runMain graft.AbReleaseInc"
  */
object AbReleaseInc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val amp = sys.env.getOrElse("AB_AMP", "16").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val p = graft.release.ReleaseParams()
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val sw = graft.text.TextFns.Stopwords
    val corpus = base
      .crossJoin(spark.range(amp).select(col("id").as("rep")))
      .select((col("doc_id") * amp + col("rep")).as("doc_id"),
        concat_ws(" ", transform(graft.text.TextFns.tokens(col("text")),
          tk => when(tk.isin(sw: _*), tk)
            .otherwise(concat(lit("r"), col("rep"), lit("_"), tk)))).as("text"))
    val batch = base
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))

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

    val dir = java.nio.file.Files.createTempDirectory("graft_ab_relinc").toString
    val (_, buildWall) = timed {
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
        graft.release.ReleaseStore.init(
          spark, corpus, "doc_id", "text", p, s"$dir/st"))
    }
    sweep()
    val (incRows, incWall) = timed {
      val rel = graft.release.ReleaseStore.increment(
        spark, batch, "doc_id", "text", p, s"$dir/st")
      val n = rel.count()
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(rel)
      n
    }
    sweep()
    val (unionRows, unionWall) = timed {
      val rel = graft.release.ReleaseStore.batchRelease(
        corpus.unionAll(batch), "doc_id", "text", p)
      val n = rel.filter(col("doc_id") >= 10000000L).count()
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(rel)
      n
    }
    sweep()
    println(f"AB-RELEASEINC amp=$amp corpus=${amp}x batch=1x " +
      f"build=$buildWall%.1f s incremental=$incWall%.1f s " +
      f"batch_union=$unionWall%.1f s speedup=${unionWall / incWall}%.1f" +
      f"x inc_released=$incRows union_new_released=$unionRows")

    // COMPACTION leg (the AbDedupInc/AbSpanInc/AbIvfCompact template,
    // composed edition): the corpus arriving as AB_CHUNKS real
    // increments fragments all five relations AND accumulates
    // superseded cluster generations; probe fragmented, compact,
    // re-probe. Chunks are id-range slices so the store's monotone-id
    // contract holds across increments.
    val chunks = sys.env.getOrElse("AB_CHUNKS", "8").toInt
    if (chunks > 1) {
      val dir2 = java.nio.file.Files.createTempDirectory("graft_ab_relfrag").toString
      val maxId = 500L * amp
      val (_, fragBuild) = timed {
        (0 until chunks).foreach { i =>
          val lo = maxId * i / chunks
          val hi = if (i == chunks - 1) maxId else maxId * (i + 1) / chunks
          val chunk = corpus.filter(col("doc_id") >= lo && col("doc_id") < hi)
          if (i == 0)
            org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
              graft.release.ReleaseStore.init(
                spark, chunk, "doc_id", "text", p, s"$dir2/st"))
          else
            org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
              graft.release.ReleaseStore.increment(
                spark, chunk, "doc_id", "text", p, s"$dir2/st"))
          sweep()
        }
      }
      def probeOnce(): (Set[(Long, String)], Double) = {
        // Probe on a COPY: increments append, and the compacted re-probe
        // must see the same store the fragmented probe saw.
        val probeDir = java.nio.file.Files.createTempDirectory("graft_ab_relprobe")
        def copy(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(src).iterator().asScala.foreach { q =>
            val t = dst.resolve(src.relativize(q))
            if (java.nio.file.Files.isDirectory(q))
              java.nio.file.Files.createDirectories(t)
            else { java.nio.file.Files.copy(q, t); () }
          }
        }
        copy(java.nio.file.Paths.get(s"$dir2/st"), probeDir.resolve("st"))
        val r = timed {
          val rel = graft.release.ReleaseStore.increment(
            spark, batch, "doc_id", "text", p, probeDir.resolve("st").toString)
          val rows = rel.select(col("doc_id"), col("split")).collect()
            .map(x => (x.getLong(0), x.getString(1))).toSet
          org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(rel)
          rows
        }
        sweep()
        r
      }
      val (fragRows, fragWall) = probeOnce()
      val (_, compactWall) = timed {
        graft.release.ReleaseStore.compact(spark, s"$dir2/st")
      }
      sweep()
      val (compRows, compWall) = probeOnce()
      require(compRows == fragRows,
        s"increment diverged across layouts: fragmented=${fragRows.size} compacted=${compRows.size}")
      println(f"AB-RELEASEINC-COMPACT amp=$amp chunks=$chunks " +
        f"frag_build=$fragBuild%.1f s probe_frag=$fragWall%.1f s " +
        f"compact=$compactWall%.1f s probe_compacted=$compWall%.1f s " +
        f"probe_onesave=$incWall%.1f s released=${fragRows.size}")

      // RECONCILE leg (the reconcile-cadence cost curve, measured): an
      // arriving batch of LONGER near-dups of stored docs dethrones
      // their canonicals (released-but-no-longer-canonical — the state
      // reconcile exists to retire), then the sweep is priced twice on
      // the same store: once with a real retired set (pays the
      // store-sized released rewrite + span/IVF removes) and once
      // idempotently right after (retired empty — the election-only
      // pass, the cost of a scheduled run that finds nothing). Compare
      // both against the same store's compact above: the cadence
      // guidance says reconcile-with-retirements is compaction-class
      // while a no-op check is cheap enough to schedule eagerly.
      val dethroners = corpus.filter(col("doc_id") < 64L)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          // 3 extra stopword tokens: Jaccard stays above the near-dup
          // threshold (shingle sets nearly identical), n_tok grows, and
          // the stopword-heavy suffix keeps the weak-label gate open.
          concat(col("text"), lit(" the and of")).as("text"))
      val (_, dethroneWall) = timed {
        org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(
          graft.release.ReleaseStore.increment(
            spark, dethroners, "doc_id", "text", p, s"$dir2/st"))
      }
      sweep()
      def reconcileOnce(): (Long, Double) = {
        val r = timed {
          val retired = graft.release.ReleaseStore.reconcile(spark, s"$dir2/st")
          val n = retired.count()
          org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(retired)
          n
        }
        sweep(); r
      }
      val (retired1, recWall) = reconcileOnce()
      val (retired2, recNoopWall) = reconcileOnce()
      require(retired2 == 0L,
        s"idempotent reconcile retired $retired2 docs; convergence broken")
      println(f"AB-RELEASEINC-RECONCILE amp=$amp dethrone_batch=64 " +
        f"dethrone_inc=$dethroneWall%.1f s reconcile=$recWall%.1f s " +
        f"retired=$retired1 reconcile_noop=$recNoopWall%.1f s " +
        f"compact_same_store=$compactWall%.1f s")

      // SCOPED-RECONCILE lifecycle leg (r17 verdict #6): the steady-state
      // per-batch cost as ONE number — a dethroning increment followed
      // immediately by the reconcile SCOPED to exactly the clusters the
      // increment touched (its released rows' rep_ids), the
      // "increment + same-window maintenance" schedule the cadence
      // guidance recommends for closing dethroning spikes without
      // waiting for the compact window. The election pass is
      // batch-sized (touched clusters only); the rewrites stay
      // store-sized when anything retires — so the delta over the bare
      // increment is the real marginal price of eager maintenance.
      val dethroners2 = corpus.filter(col("doc_id") >= 64L && col("doc_id") < 128L)
        .select((col("doc_id") + 30000000L).as("doc_id"),
          concat(col("text"), lit(" the and of")).as("text"))
      val (scopedRetired, lifecycleWall) = timed {
        val rel = graft.release.ReleaseStore.increment(
          spark, dethroners2, "doc_id", "text", p, s"$dir2/st")
        val touched = rel.select(col("rep_id"))
        val retired = graft.release.ReleaseStore.reconcile(
          spark, s"$dir2/st", clusterIds = Some(touched))
        val n = retired.count()
        org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(retired)
        org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(rel)
        n
      }
      sweep()
      require(scopedRetired > 0L,
        "scoped reconcile retired nothing — the dethroning batch did not dethrone")
      println(f"AB-RELEASEINC-RECONCILE-SCOPED amp=$amp dethrone_batch=64 " +
        f"increment_plus_scoped_reconcile=$lifecycleWall%.1f s " +
        f"retired=$scopedRetired dethrone_inc_alone=$dethroneWall%.1f s " +
        f"full_reconcile=$recWall%.1f s noop=$recNoopWall%.1f s")
    }
    spark.stop()
  }
}
