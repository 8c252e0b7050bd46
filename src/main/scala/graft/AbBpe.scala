package graft

import org.apache.spark.sql.SparkSession

/** BPE training scale probe: wall for `Bpe.train` at a production-ish
  * merge budget on the full sf-dir corpus — the number behind the claim
  * that un-capping the merge loop (r8 verdict ask #3) left training
  * seconds-bounded. The corpus-sized stage is the one distributed word
  * count; the merge loop is driver-local over the collected
  * vocabulary-sized dictionary, so its cost scales with |vocab| and
  * numMerges, not corpus bytes.
  *
  *   BPE_MERGES=1000 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.AbBpe"
  */
object AbBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val merges = sys.env.getOrElse("BPE_MERGES", "1000").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    (1 to 2).foreach { run =>
      val t0 = System.nanoTime()
      val (ms, vocab) = graft.text.Bpe.train(docs, "text", merges)
      val nVocab = vocab.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"ABBPE run=$run merges=${ms.length} vocab=$nVocab wall=$wall%.2f s " +
        s"(requested $merges, sf=$sfDir)")
    }
    // The testdata corpus has only 31 word types (merges exhaust at 89),
    // so the merge loop's own cost curve needs a synthetic vocabulary:
    // BPE_SYNTH_TYPES word types, skewed frequencies, trained to the full
    // requested merge budget — the driver-local cost a 30k-merge
    // production vocabulary would pay.
    val synthTypes = sys.env.getOrElse("BPE_SYNTH_TYPES", "0").toInt
    if (synthTypes > 0) {
      val rnd = new scala.util.Random(42)
      val types = (0 until synthTypes).map { _ =>
        val len = 4 + rnd.nextInt(9)
        (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }.distinct
      val texts = types.zipWithIndex
        .flatMap { case (w, i) => Seq.fill(1 + i % 17)(w) }
        .grouped(50).map(_.mkString(" ")).toSeq
      import spark.implicits._
      val synthDocs = texts.toDF("text")
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val (ms, vocab) = graft.text.Bpe.train(synthDocs, "text", merges)
        val nVocab = vocab.count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"ABBPE synth run=$run merges=${ms.length} vocab=$nVocab " +
          f"wall=$wall%.2f s (requested $merges, types=${types.length})")
      }
    }
    spark.stop()
  }
}
