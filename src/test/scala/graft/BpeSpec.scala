package graft

import graft.text.Bpe

/** graft.text.Bpe: the distributed regex-path trainer must equal a naive
  * sequential list-path reference on the full merge sequence AND the
  * final segmentation — the strongest check available where no SQL
  * oracle can exist (RE2 has no lookarounds).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: symbol lists, greedy left-to-right merge application,
    * argmax pair by (weight desc, left asc, right asc).
    */
  private def naiveTrain(wordFreq: Map[String, Long], numMerges: Int)
      : (List[(String, String, String, Long)], Map[String, List[String]]) = {
    def applyMerge(s: List[String], l: String, r: String): List[String] =
      s match {
        case a :: b :: rest if a == l && b == r =>
          (l + r) :: applyMerge(rest, l, r)
        case a :: rest => a :: applyMerge(rest, l, r)
        case Nil => Nil
      }
    var vocab: Map[String, List[String]] =
      wordFreq.map { case (w, _) => w -> w.toList.map(_.toString) }
    val merges = scala.collection.mutable.ListBuffer[(String, String, String, Long)]()
    var done = false
    for (_ <- 1 to numMerges if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((w, syms) <- vocab; pair <- syms.sliding(2) if pair.length == 2)
        counts((pair.head, pair(1))) += wordFreq(w)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), wgt) = counts.toSeq
          .sortBy { case ((l, r), w) => (-w, l, r) }.head
        merges += ((l, r, l + r, wgt))
        vocab = vocab.map { case (w, s) => w -> applyMerge(s, l, r) }
      }
    }
    (merges.toList, vocab)
  }

  private def distTrain(texts: Seq[String], numMerges: Int) = {
    val (merges, vocabDf) = Bpe.train(texts.toDF("text"), "text", numMerges)
    val vocab = vocabDf.collect()
      .map(r => r.getString(0) -> r.getString(1).trim.split(" ").toList).toMap
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(vocabDf)
    (merges.map(m => (m.left, m.right, m.merged, m.weight)), vocab)
  }

  private def freqOf(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("repeated-symbol runs merge greedily left-to-right (aaaa -> aa aa)") {
    val texts = Seq("aaaa aaaa ab")
    val (merges, vocab) = distTrain(texts, 2)
    assert(merges.head._1 == "a" && merges.head._2 == "a")
    // After merge 1, 'aaaa' must be [aa, aa] — a boundary-consuming
    // replace would leave [aa, a, a].
    val (_, naiveVocab) = naiveTrain(freqOf(texts), 1)
    val (_, v1) = distTrain(texts, 1)
    assert(v1("aaaa") == List("aa", "aa"))
    assert(v1 == naiveVocab)
  }

  test("merge sequence and segmentation equal the naive reference on the corpus") {
    val texts = Tables.documents(spark, Sf001)
      .select("text").limit(120).collect().map(_.getString(0)).toSeq
    val (merges, vocab) = distTrain(texts, 12)
    val (nMerges, nVocab) = naiveTrain(freqOf(texts), 12)
    assert(merges == nMerges, s"merge sequences diverge:\n$merges\nvs\n$nMerges")
    assert(vocab == nVocab)
  }

  test("1000+ merges equal the naive reference (un-capped driver-local loop)") {
    // The r8 tree capped numMerges at 64 (one distributed pair-count +
    // regexp rewrite per merge); the collect-once trainer must track the
    // recount-everything reference through a production-scale merge
    // budget. The testdata corpus has only 31 distinct words (BPE
    // exhausts at 89 merges — covered by the corpus test above), so this
    // generates a deterministic 2000-type vocabulary with skewed
    // frequencies: enough pair mass that all 1000 merges actually fire,
    // exercising thousands of incremental pair-count updates, heap
    // invalidations, and tie-breaks.
    val rnd = new scala.util.Random(42)
    val types = (0 until 2000).map { _ =>
      val len = 4 + rnd.nextInt(9)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    val wordStream = types.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(1 + i % 17)(w)
    }
    val texts = wordStream.grouped(50).map(_.mkString(" ")).toSeq
    val (merges, vocab) = distTrain(texts, 1000)
    val (nMerges, nVocab) = naiveTrain(freqOf(texts), 1000)
    assert(merges.length == 1000, s"merge budget not exercised: ${merges.length}")
    assert(merges == nMerges,
      s"merge sequences diverge at ${merges.zip(nMerges).indexWhere(p => p._1 != p._2)}")
    assert(vocab == nVocab)
  }

  test("tokenCounts: per-doc totals follow the segmentation map") {
    val docs = Seq((1L, "ab ab cd"), (2L, "cd")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.train(docs, "text", 1) // merges the top pair only
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(vocab)
    // Top pair is (a,b) w=2 vs (c,d) w=2 — tie broken by left asc: (a,b).
    // So 'ab' → [ab] (1 symbol), 'cd' → [c, d] (2 symbols).
    assert(counts == List((1L, 3L, 4L), (2L, 1L, 2L)))
  }

  test("tokenCounts: out-of-vocabulary words character-fallback, not vanish") {
    val trainDocs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.train(trainDocs, "text", 1)
    // Apply to a corpus containing words never seen at training time.
    val applyDocs = Seq(
      (1L, "ab zzz"),       // 'zzz' is OOV → 3 chars
      (2L, "unseen")        // fully OOV doc → 6 chars
    ).toDF("doc_id", "text")
    val counts = Bpe.tokenCounts(applyDocs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(vocab)
    // doc 1: 'ab' → [ab] (merged, 1 sym) + 'zzz' → [z,z,z] = 2 words, 4 toks.
    // doc 2: 'unseen' → 6 single-char tokens; the word COUNTS (n_words=1)
    // — the inner-join spelling dropped it from both columns.
    assert(counts == List((1L, 2L, 4L), (2L, 1L, 6L)))
  }
}
