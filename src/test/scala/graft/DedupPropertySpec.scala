package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SpanStore}

/** ScalaCheck properties for the round-13 dedup additions: on random
  * corpora, each distributed formulation must agree exactly with a naive
  * in-memory reference of its semantics.
  */
object DedupProperties extends Properties("Dedup") {
  private lazy val spark = TestSpark.spark
  import Prop.forAll

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Random 16-bit fingerprint sets with planted near-collisions (a
    * uniform draw over 2^16 rarely lands within Hamming 4, so half the
    * ids perturb an earlier fingerprint by ≤4 random bit flips).
    */
  private val genFps: Gen[List[(Long, Long)]] = for {
    m <- Gen.choose(2, 30)
    base <- Gen.listOfN(m, Gen.choose(0L, 65535L))
    flips <- Gen.listOfN(m, Gen.choose(0, 4))
    bits <- Gen.listOfN(m, Gen.listOfN(4, Gen.choose(0, 15)))
  } yield {
    val fps = base.zipWithIndex.map { case (b, i) =>
      if (i % 2 == 0 || i == 0) b
      else bits(i).take(flips(i)).foldLeft(base(i - 1))((f, j) => f ^ (1L << j))
    }
    fps.zipWithIndex.map { case (f, i) => (i.toLong, f) }
  }

  property("d24 mask-expansion truth == naive all-pairs Hamming <= 4") =
    forAll(genFps) { rows =>
      import spark.implicits._
      // The d24 truth side: bounded 2517-mask XOR fan + fp equi-join.
      val fps = rows.toDF("id", "fp")
      val masks = spark.range(65536).filter(expr("bit_count(id) <= 4"))
        .select(col("id").as("m"))
      val got = fps.select(col("id").as("doc_a"), col("fp").as("fp_a"))
        .crossJoin(broadcast(masks))
        .select(col("doc_a"), expr("fp_a ^ m").as("fp_bv"),
          expr("cast(bit_count(m) as bigint)").as("hamming"))
        .join(fps.select(col("id").as("doc_b"), col("fp").as("fp_b")),
          col("fp_bv") === col("fp_b") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, fa) <- rows
        (ib, fb) <- rows
        if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 4
      } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb).toLong)).toSet
      Prop(got == want) :| s"got=${got.size} want=${want.size}"
    }

  /** Random small corpora over a 6-word vocabulary so cross-document
    * repeated spans (≥ 6 tokens) actually occur: each doc is a random
    * token sequence, and half the docs splice a run copied from an
    * earlier doc.
    */
  private val genDocs: Gen[List[(Long, String)]] = for {
    m <- Gen.choose(2, 8)
    lens <- Gen.listOfN(m, Gen.choose(6, 20))
    toks <- Gen.sequence[List[List[String]], List[String]](
      lens.map(n => Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))))
    splice <- Gen.listOfN(m, Gen.choose(0, 1))
  } yield {
    val texts = toks.zipWithIndex.map { case (ts, i) =>
      if (i > 0 && splice(i) == 1) {
        val prev = toks(i - 1)
        (ts.take(3) ++ prev.take(math.min(8, prev.size)) ++ ts.drop(3))
          .mkString(" ")
      } else ts.mkString(" ")
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  property("SpanStore.searchNew == batch spanDedup on the union, new-touching slice") =
    forAll(genDocs, Gen.choose(1, 3)) { (rows, splitAt) =>
      import spark.implicits._
      val cut = math.min(splitAt.toLong, rows.size.toLong - 1)
      val docs = rows.toDF("doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_prop_span").toString
      SpanStore.save(docs.filter(col("doc_id") < cut),
        "doc_id", "text", minTokens = 6, s"$dir/ix")
      val probe = SpanStore.searchNew(spark, s"$dir/ix",
        docs.filter(col("doc_id") >= cut), "doc_id", "text", minTokens = 6)
      val got = probe
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(probe)
      val full: Set[(Long, Long, Long, Long, Long)] =
        Dedup.spanDedup(docs, "doc_id", "text", minTokens = 6)
          .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = full.filter(t => t._1 >= cut || t._2 >= cut)
      Prop(got == want) :| s"cut=$cut got=${got.size} want=${want.size}"
    }

  /** Corpora with a PLANTED boilerplate run: out-of-vocabulary tokens
    * spliced into most docs, so its anchor grams have document
    * frequency ≥ the planted count and a small `maxDf` provably bites,
    * while the 6-word base vocabulary still generates organic shared
    * spans the cap must leave alone.
    */
  private val genDocsBoiler: Gen[List[(Long, String)]] = for {
    m <- Gen.choose(3, 8)
    lens <- Gen.listOfN(m, Gen.choose(6, 16))
    toks <- Gen.sequence[List[List[String]], List[String]](
      lens.map(n => Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))))
    plant <- Gen.listOfN(m, Gen.choose(0, 2))
  } yield {
    val boiler = List("xx", "yy", "zz", "xx", "yy", "zz", "xx")
    val texts = toks.zipWithIndex.map { case (ts, i) =>
      if (plant(i) > 0) (ts.take(2) ++ boiler ++ ts.drop(2)).mkString(" ")
      else ts.mkString(" ")
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  /** Naive in-memory reference of the CAPPED span semantics (the
    * [[Dedup.capGramsByDf]] scaladoc's contract, executed literally):
    * tokenize, window into L-token anchor grams, drop grams in more
    * than maxDf distinct docs, positional-equality seeds, then maximal
    * consecutive-anchor runs per (pair, diagonal) — so a span SPLITS at
    * capped anchors into runs each still ≥ L tokens, and vanishes only
    * when every anchor inside it is capped.
    */
  private def refCappedSpans(
      rows: List[(Long, String)], L: Int, maxDf: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val toks = rows.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toVector }
    val grams = for {
      (id, ts) <- toks
      p <- 0 to ts.size - L
    } yield (id, p.toLong, ts.slice(p, p + L).mkString(" "))
    val df = grams.map(g => (g._3, g._1)).distinct
      .groupBy(_._1).view.mapValues(_.size).toMap
    val kept = grams.filter(g => df(g._3) <= maxDf)
    val byGram = kept.groupBy(_._3)
    val seeds = for {
      (_, gs) <- byGram.toList
      (a, pa, _) <- gs
      (b, pb, _) <- gs
      if a < b
    } yield (a, b, pa, pb)
    seeds.groupBy(s => (s._1, s._2, s._3 - s._4)).toList.flatMap {
      case ((a, b, diag), ss) =>
        val pas = ss.map(_._3).distinct.sorted
        val runs = pas.foldLeft(List.empty[List[Long]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        runs.map { run =>
          val sa = run.last // runs accumulate reversed
          (a, b, sa, sa - diag, run.head - sa + L)
        }
    }.toSet
  }

  property("capped spanDedup == naive capped reference (split at capped anchors, >= L runs, vanish only when all anchors capped); identity at a non-binding cap") =
    forAll(genDocsBoiler, Gen.choose(1, 3)) { (rows, maxDf) =>
      import spark.implicits._
      val docs = rows.toDF("doc_id", "text")
      val got = Dedup.spanDedup(docs, "doc_id", "text", minTokens = 6,
          maxDf = maxDf)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = refCappedSpans(rows, L = 6, maxDf = maxDf)
      // Validate the reference itself against the oracled uncapped
      // operator: at a cap no gram reaches, both must equal uncapped.
      val uncapped = Dedup.spanDedup(docs, "doc_id", "text", minTokens = 6)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val loose = Dedup.spanDedup(docs, "doc_id", "text", minTokens = 6,
          maxDf = rows.size)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      (Prop(got == want) :| s"capped maxDf=$maxDf got=${got.size} want=${want.size}") &&
        (Prop(refCappedSpans(rows, 6, rows.size) == uncapped) :| "reference != uncapped at non-binding cap") &&
        (Prop(loose == uncapped) :| "operator not identity at non-binding cap") &&
        (Prop(got.forall(_._5 >= 6)) :| "capped span shorter than L survived")
    }

  property("capped SpanStore.searchNew == capped batch spanDedup on the union, new-touching slice") =
    forAll(genDocsBoiler, Gen.choose(1L, 3L), Gen.choose(1, 3)) {
      (rows, splitAt, maxDf) =>
        import spark.implicits._
        val cut = math.min(splitAt, rows.size.toLong - 1)
        val docs = rows.toDF("doc_id", "text")
        val dir = java.nio.file.Files
          .createTempDirectory("graft_prop_spancap").toString
        SpanStore.save(docs.filter(col("doc_id") < cut),
          "doc_id", "text", minTokens = 6, s"$dir/ix")
        val probe = SpanStore.searchNew(spark, s"$dir/ix",
          docs.filter(col("doc_id") >= cut), "doc_id", "text",
          minTokens = 6, maxDf = maxDf)
        val got = probe.as[(Long, Long, Long, Long, Long)].collect().toSet
        org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(probe)
        val full = Dedup.spanDedup(docs, "doc_id", "text", minTokens = 6,
            maxDf = maxDf)
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        val want = full.filter(t => t._1 >= cut || t._2 >= cut)
        Prop(got == want) :| s"cut=$cut maxDf=$maxDf got=${got.size} want=${want.size}"
    }
}
