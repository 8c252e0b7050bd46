package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: plain inverted-index Jaccard join (d2) vs prefix-filtered
  * AllPairs/PPJoin (d16) vs DF-capped index (jaccardPairsCapped) under
  * SHINGLE-FREQUENCY SKEW — the regime prefix filtering exists for.
  *
  * The synthetic sf corpora have near-uniform shingle document frequency,
  * so at sf0.1 the prefix path LOSES (QBench min: d2 1.58 s vs d16
  * 6.31 s — the DF join + per-doc rank windows cost more than they
  * save). This probe appends one shared boilerplate paragraph to a
  * fraction of the corpus, which is what real crawl data looks like
  * (shared headers/footers/license blocks), and re-measures. A shingle
  * shared by k docs costs the plain index k(k−1)/2 candidate rows; the
  * prefix index drops boilerplate shingles from every document's prefix
  * (highest DF = last in the global order), so its candidate join stays
  * driven by rare shingles.
  *
  * Shipped results (sf0.1 replicated 4× = 20k docs, footer on 50%,
  * local[32], min of 3, fresh session):
  *
  *   t=0.8:  d16 prefix  7.4 s | plain 35.0 s | capped64 119.8 s
  *           (all 27,641 rows — 4.7× / 16× for the prefix path)
  *   t=0.3:  d16 prefix 60.9 s | plain 31.7 s | capped64  83.8 s,
  *           and capped64 returned 34,098 of 34,102 rows — LOSSY.
  *
  * Two lessons, recorded in the [[dedup.Dedup.jaccardPairsPrefix]]
  * scaladoc: prefix pruning power is (1−t), so the method pays off only
  * at high thresholds (its design point — near-dup detection), and the
  * DF cap's missed pairs are real even on synthetic data. The d16 query
  * entry therefore runs at t = 0.8; d2 keeps t = 0.3 as the bounded-
  * corpus similarity-mining spelling.
  */
object AbPrefixSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val frac = args.headOption.map(_.toDouble).getOrElse(0.3)
    // Corpus-size knob: replicate the doc table `rep`× (replica tag mixed
    // into doc_id AND prepended to the text so replicas are near- not
    // exact-duplicates — J≈0.9 to their siblings, like crawl re-fetches).
    val rep = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val t = args.drop(2).headOption.map(_.toDouble).getOrElse(0.8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 8 tokens → 6 trigram shingles: small vs the 10–100-token docs, so
    // two unrelated boilerplated docs stay BELOW the 0.3 threshold — the
    // candidates the boilerplate generates are spurious, which is the
    // crawl-data regime (shared footers on otherwise-unrelated pages).
    val boiler = "all rights reserved terms of service apply here"
    // Deterministic "skew": append the boilerplate to a stable hash-chosen
    // fraction of docs (no RNG — reruns measure the same corpus).
    val base = Tables.documents(spark, sfDir)
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    val replicated =
      if (rep <= 1) base
      else base.crossJoin(
          spark.range(rep).select(col("id").as("replica")))
        .select(
          (col("doc_id") + col("replica") * lit(maxId)).as("doc_id"),
          concat_ws(" ", concat(lit("rep"), col("replica")), col("text")).as("text"))
    val docs = replicated
      .withColumn("text",
        when(pmod(xxhash64(col("doc_id")), lit(1000)) < lit((frac * 1000).toInt),
          concat_ws(" ", col("text"), lit(boiler)))
          .otherwise(col("text")))
      .localCheckpoint(true)
    println(s"corpus: ${docs.count()} docs, boilerplate fraction $frac, threshold $t")
    import graft.dedup.Dedup
    val legs: Seq[(String, () => Long)] = Seq(
      ("d16_prefix" -> (() =>
        Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, t).count())),
      ("d2_capped64" -> (() =>
        Dedup.jaccardPairsCapped(docs, "doc_id", "text", 3, t, 64).count())),
      ("d2_plain" -> (() =>
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, t).count()))
    )
    legs.foreach { case (name, run) =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = run()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"AB-SKEW $name%-12s min=${ts.map(_._1).min}%.2f s  rows=${ts.head._2}")
    }
    spark.stop()
  }
}
