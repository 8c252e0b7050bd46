package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** BPE tokenizer training (Sennrich et al. 2016) — learn the top-N
  * byte-pair merges from a corpus, and segment with them.
  *
  * The classic formulation trains on the WORD-FREQUENCY dictionary, not
  * the raw text: ONE distributed corpus scan builds (word, freq) — a
  * map-side-combinable count, the only part that touches corpus-sized
  * data — and the dictionary it produces is vocabulary-sized (≪ corpus;
  * natural-language vocabularies level off in the millions of types
  * regardless of corpus size, Heaps' law). That dictionary is collected
  * once and the merge loop runs DRIVER-LOCAL with incremental pair-count
  * maintenance and a lazily-invalidated max-heap — the subword-nmt
  * scheme — so 30k merges cost 30k heap pops over an in-memory dict, not
  * 30k Spark jobs. (An earlier formulation here ran each merge round as
  * a distributed pair-count + regexp rewrite; at production merge counts
  * that is a driver-side bottleneck by construction — one cluster
  * round-trip per merge — which is why it was capped at 64 merges.
  * Collect-once removes the cap: the r8 verdict ask.)
  *
  * Scale split, explicitly: corpus-sized work (the word count, and
  * [[tokenCounts]] apply) is distributed; vocabulary-sized work (the
  * merge loop) is driver-local. At 100 TB the corpus scan dominates and
  * parallelizes; the collected dictionary is the same size it would be
  * at 1 GB.
  *
  * Argmax tie-break is (weight desc, left asc, right asc) with strings
  * compared in CODE-POINT order — identical to Spark's UTF8String binary
  * ordering (UTF-8 bytewise), which the previous distributed
  * `orderBy(desc(w), l, r)` used — so the learned merge sequence is
  * bit-identical to the old path. Java's `String.compareTo` is UTF-16
  * code-unit order and diverges on supplementary characters; the
  * explicit comparator removes that trap.
  *
  * No SQL oracle (an N-round merge CTE would be engine-fragile); instead
  * BpeSpec pins the ENTIRE merge sequence and final segmentation against
  * a naive sequential reference that recounts all pairs every round —
  * incremental-update path ≡ recount path, the [[graft.graph.Scc]] /
  * LpaReference property pattern, including a ≥1000-merge run.
  */
object Bpe {

  /** One learned merge. */
  case class Merge(step: Long, left: String, right: String, merged: String,
      weight: Long)

  /** Code-point lexicographic compare — equals UTF-8 bytewise order
    * (Spark's UTF8String binary collation). Negative iff a < b.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Heap entries ordered (weight desc, left asc, right asc); entries are
    * lazily invalidated — an entry is live only while its recorded weight
    * matches the pair's current count.
    */
  private final case class Cand(w: Long, l: String, r: String)
  private val candOrdering: Ordering[Cand] = new Ordering[Cand] {
    // scala.collection.mutable.PriorityQueue pops the LARGEST element,
    // so "x is better" must mean compare(x, y) > 0.
    def compare(x: Cand, y: Cand): Int = {
      if (x.w != y.w) return java.lang.Long.compare(x.w, y.w)
      val cl = cpCompare(y.l, x.l) // smaller left wins
      if (cl != 0) cl else cpCompare(y.r, x.r)
    }
  }

  /** Train `numMerges` merges; returns (merges in order, final vocabulary
    * segmentation (word, sym, freq) with `sym` the space-separated,
    * space-padded symbol string — the format [[tokenCounts]] consumes).
    * Stops early when no adjacent pair remains.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be positive; got $numMerges")
    val spark = docs.sparkSession
    // The ONLY corpus-sized stage: a map-side-combinable word count.
    val dict: Array[(String, Long)] = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    // Driver-local state: per-word symbol arrays, pair counts, a pair →
    // word-index occurrence map, and the lazy max-heap of candidates.
    val syms: Array[Array[String]] =
      dict.map { case (w, _) => w.codePoints().toArray.map(
        cp => new String(Character.toChars(cp))) }
    val freqs: Array[Long] = dict.map(_._2)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    val heap = mutable.PriorityQueue.empty[Cand](candOrdering)

    def bump(p: (String, String), delta: Long, wordIdx: Int): Unit = {
      val nw = pairCount.getOrElse(p, 0L) + delta
      if (nw <= 0L) { pairCount.remove(p); () }
      else {
        pairCount(p) = nw
        if (delta > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wordIdx
        // Every count change needs a fresh heap entry: stale entries are
        // discarded on pop, so the CURRENT weight must be represented.
        heap.enqueue(Cand(nw, p._1, p._2))
      }
    }

    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) { bump((s(j), s(j + 1)), freqs(i), i); j += 1 }
      i += 1
    }

    /** Greedy left-to-right non-overlapping merge of (l,r)→m in one
      * word — the same semantics as a lookaround-anchored regex
      * `(?<= )l r(?= )` replaceAll: `a a a a` → `aa aa`.
      */
    def applyMerge(s: Array[String], l: String, r: String, m: String)
        : Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var k = 0
      while (k < s.length) {
        if (k < s.length - 1 && s(k) == l && s(k + 1) == r) {
          out += m; k += 2
        } else { out += s(k); k += 1 }
      }
      out.toArray
    }

    val merges = mutable.ListBuffer.empty[Merge]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      // Pop until a live entry (recorded weight == current count).
      var top: Option[Cand] = None
      while (top.isEmpty && heap.nonEmpty) {
        val c = heap.dequeue()
        if (pairCount.get((c.l, c.r)).contains(c.w)) top = Some(c)
      }
      top match {
        case None => exhausted = true
        case Some(Cand(w, l, r)) =>
          val m = l + r
          merges += Merge(step.toLong, l, r, m, w)
          val occ = pairWords.remove((l, r)).getOrElse(mutable.Set.empty)
          occ.foreach { idx =>
            val before = syms(idx)
            // Occurrence sets are not maintained on decrement, so verify.
            var hit = false
            var k = 0
            while (!hit && k < before.length - 1) {
              hit = before(k) == l && before(k + 1) == r; k += 1
            }
            if (hit) {
              val after = applyMerge(before, l, r, m)
              syms(idx) = after
              // Count delta as multiset(after pairs) − multiset(before
              // pairs): handles adjacent/overlapping occurrences (e.g.
              // `a a a`) without positional bookkeeping.
              val delta = mutable.HashMap.empty[(String, String), Long]
              var x = 0
              while (x < before.length - 1) {
                val p = (before(x), before(x + 1))
                delta(p) = delta.getOrElse(p, 0L) - freqs(idx); x += 1
              }
              x = 0
              while (x < after.length - 1) {
                val p = (after(x), after(x + 1))
                delta(p) = delta.getOrElse(p, 0L) + freqs(idx); x += 1
              }
              delta.foreach { case (p, d) => if (d != 0L) bump(p, d, idx) }
            }
          }
          pairCount.remove((l, r))
          step += 1
      }
    }

    val vocabRows = dict.indices.map { k =>
      Row(dict(k)._1, syms(k).mkString(" ", " ", " "), freqs(k))
    }
    val vocabDf = spark.createDataFrame(
      spark.sparkContext.parallelize(vocabRows,
        math.max(1, math.min(32, vocabRows.size / 4096 + 1))),
      StructType(Seq(
        StructField("word", StringType, nullable = false),
        StructField("sym", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
    (merges.toList, vocabDf)
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
    * corpus scans once; no per-doc merge replay. Out-of-vocabulary words
    * (text not seen at training time) CHARACTER-FALLBACK instead of
    * silently dropping: the LEFT outer join defaults a missing `n_sym` to
    * the word's code-point count — exactly the token count a tokenizer
    * that segments unknown words to single characters (the BPE base
    * alphabet, before any merge applies) would produce. Spark's `length`
    * counts code points, matching training's `codePoints()` split.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val seg = vocab.select(col("word"),
      size(split(trim(col("sym")), " ")).cast("long").as("n_sym"))
    docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(seg), Seq("word"), "left")
      .withColumn("n_sym",
        coalesce(col("n_sym"), length(col("word")).cast("long")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
      .orderBy(col(idCol))
  }
}
