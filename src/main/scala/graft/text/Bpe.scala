package graft.text

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — learn the
  * top-N byte-pair merges from a corpus, and segment with them.
  *
  * The classic formulation trains on the WORD-FREQUENCY dictionary, not
  * the raw text: one corpus scan builds (word, freq), and every merge
  * round then runs over the vocabulary-sized relation — the corpus is
  * never rescanned. At 100 TB that separation is the whole ballgame: the
  * scan is a map-side-combinable word count, and N merge rounds touch
  * only |vocab| rows each (pair-count aggregate + one regexp projection).
  * The per-round argmax pair is a driver-side scalar — same cost class as
  * the PageRank loop's convergence check.
  *
  * Merge application uses lookaround-anchored regex on a space-separated,
  * space-PADDED symbol string: `(?<= )l r(?= )` — the boundaries are not
  * consumed, so Java's left-to-right non-overlapping replaceAll merges
  * `a a a a` into `aa aa` exactly like the reference greedy BPE (a
  * boundary-consuming pattern would eat the separator and skip every
  * other occurrence). Symbols are regex-quoted, so the scheme is safe for
  * arbitrary byte content.
  *
  * No SQL oracle (DuckDB's RE2 has no lookarounds, and an unrolled
  * N-round CTE would be engine-fragile); instead BpeSpec pins the ENTIRE
  * merge sequence and final segmentation against a naive sequential
  * reference that manipulates symbol lists directly — distributed
  * regex-path ≡ single-threaded list-path, the [[graft.graph.Scc]] /
  * LpaReference property pattern.
  */
object Bpe {

  /** One learned merge. */
  case class Merge(step: Long, left: String, right: String, merged: String,
      weight: Long)

  /** Train `numMerges` merges; returns (merges in order, final vocabulary
    * segmentation (word, sym, freq) with `sym` the space-separated symbol
    * string). Stops early when no adjacent pair remains.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[Merge], DataFrame) = {
    require(numMerges >= 1 && numMerges <= 64,
      s"numMerges drives a driver-side loop; got $numMerges")
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // Space-padded symbol string: ' c h a r s '.
    var cur = words.select(
        col("word"),
        concat(lit(" "),
          concat_ws(" ", split(col("word"), "(?!^)")), lit(" ")).as("sym"),
        col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer[Merge]()
    var done = false
    for (step <- 1 to numMerges if !done) {
      val arr = split(trim(col("sym")), " ")
      val top = cur
        .select(col("freq"), arr.as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(0), size(col("a")) - 2),
          j => struct(element_at(col("a"), j + 1).as("l"),
            element_at(col("a"), j + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, w) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        val merged = l + r
        merges += Merge(step.toLong, l, r, merged, w)
        val pat = "(?<= )" + Pattern.quote(l) + " " + Pattern.quote(r) + "(?= )"
        val next = cur.select(
            col("word"),
            regexp_replace(col("sym"), pat,
              Matcher.quoteReplacement(merged)).as("sym"),
            col("freq"))
          .localCheckpoint(true)
        freeLocalCheckpoint(cur)
        cur = next
      }
    }
    (merges.toList, cur)
  }

  /** Merge list as a DataFrame (step, left, right, merged, weight). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.map(m => Row(m.step, m.left, m.right, m.merged, m.weight)), 1),
      StructType(Seq(
        StructField("step", LongType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("weight", LongType, nullable = false))))

  /** Per-document BPE token counts under a trained vocabulary: each doc's
    * words join the (broadcast, vocabulary-sized) segmentation map — the
    * corpus scans once; no per-doc merge replay. In-corpus training means
    * no OOV here; a production tokenizer would byte-fallback unknown
    * words (segment to characters), which is exactly what an outer join
    * + char-count default would add.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val seg = vocab.select(col("word"),
      size(split(trim(col("sym")), " ")).cast("long").as("n_sym"))
    docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(seg), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
      .orderBy(col(idCol))
  }
}
