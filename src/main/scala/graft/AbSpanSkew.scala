package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: the span family's stop-gram cap (`maxDf`) on a BOILERPLATE-HEAVY
  * corpus — the skew profile the cap exists for. Every document gets the
  * same unprefixed boilerplate run appended (a site template / license
  * header in the wild), so each of its anchor grams appears in ALL
  * `500·AB_AMP` documents and the uncapped seed equi-join pays
  * (500·AMP)² pairs PER GRAM POSITION — the quadratic hot key no AQE
  * skew split can excise, only bound. The cap anti-joins those grams out
  * up front (df-bounded heavy list, broadcast), leaving the organic
  * intra-replica spans untouched.
  *
  * Two legs: the batch operator (capped vs uncapped `spanDedup` walls +
  * span counts) and the incremental probe (capped vs uncapped
  * `SpanStore.searchNew` against a stored corpus — the path the
  * `gramdf` partials exist for; the capped probe's heavy list is the
  * stored partial sums + the batch df, never a stored rescan).
  * Cap SEMANTICS (spans split at capped anchors, ≥L runs, vanish only
  * when every anchor capped; capped probe == capped batch on union) are
  * property-pinned in DedupProperties — this harness prices them.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 AB_AMP=4 AB_MAXDF=16 \
  *     sbt "runMain graft.AbSpanSkew"
  */
object AbSpanSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val amp = sys.env.getOrElse("AB_AMP", "4").toInt
    val maxDf = sys.env.getOrElse("AB_MAXDF", "16").toInt
    val L = 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = (0 until 30).map(i => s"boiler$i").mkString(" ")
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = base
      .crossJoin(spark.range(amp).select(col("id").as("rep")))
      .select((col("doc_id") * amp + col("rep")).as("doc_id"),
        concat(concat_ws(" ", transform(graft.text.TextFns.tokens(col("text")),
          tk => concat(lit("r"), col("rep"), lit("_"), tk))),
          lit(" " + boiler)).as("text"))
    val batch = base
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" " + boiler)).as("text"))

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

    // Batch operator legs.
    val (cappedSpans, cappedWall) = timed {
      graft.dedup.Dedup.spanDedup(corpus, "doc_id", "text", L, maxDf).count()
    }
    sweep()
    val (uncappedSpans, uncappedWall) = timed {
      graft.dedup.Dedup.spanDedup(corpus, "doc_id", "text", L).count()
    }
    sweep()
    println(f"AB-SPANSKEW batch amp=$amp docs=${500 * amp} maxDf=$maxDf " +
      f"capped=$cappedWall%.1f s ($cappedSpans spans) " +
      f"uncapped=$uncappedWall%.1f s ($uncappedSpans spans) " +
      f"speedup=${uncappedWall / cappedWall}%.1fx")

    // Incremental probe legs against a stored corpus.
    val dir = java.nio.file.Files.createTempDirectory("graft_ab_spanskew").toString
    val (_, buildWall) = timed {
      graft.dedup.SpanStore.save(corpus, "doc_id", "text", L, s"$dir/ix")
    }
    sweep()
    def probe(cap: Int): (Long, Double) = {
      val r = timed {
        val df = graft.dedup.SpanStore.searchNew(
          spark, s"$dir/ix", batch, "doc_id", "text", L, cap)
        val n = df.count()
        org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
        n
      }
      sweep()
      r
    }
    val (cappedProbeSpans, cappedProbeWall) = probe(maxDf)
    val (uncappedProbeSpans, uncappedProbeWall) = probe(Int.MaxValue)
    println(f"AB-SPANSKEW probe amp=$amp build=$buildWall%.1f s maxDf=$maxDf " +
      f"capped=$cappedProbeWall%.1f s ($cappedProbeSpans spans) " +
      f"uncapped=$uncappedProbeWall%.1f s ($uncappedProbeSpans spans) " +
      f"speedup=${uncappedProbeWall / cappedProbeWall}%.1fx")
    spark.stop()
  }
}
