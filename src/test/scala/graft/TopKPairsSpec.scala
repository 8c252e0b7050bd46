package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TopKPairsAgg, TopKPairsBuffer}

/** The bounded top-k pair aggregate that replaced the all-pairs
  * `row_number` window in every ANN rank stage: ordering/tie-break parity
  * with the window spelling, exact-duplicate dedup (the multi-assignment
  * IVF case), and merge correctness across arbitrary buffer splits.
  */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      rows: Seq[(Long, Long, Double)], k: Int): Seq[(Long, Long, Int, Double)] =
    rows.distinct.groupBy(_._1).toSeq.flatMap { case (q, g) =>
      g.sortBy { case (_, id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((_, id, s), i) => (q, id, i + 1, s) }
    }.sortBy(r => (r._1, r._3))

  test("aggregate == row_number window on random pairs with ties and duplicates") {
    val rnd = new scala.util.Random(11)
    // Scores drawn from a tiny grid force ties; duplicated rows simulate
    // a multi-assigned candidate met through two shared cells.
    val base = (1 to 400).map { _ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, rnd.nextInt(7) / 10.0)
    }
    val rows = (base ++ base.take(120)).distinctBy(r => (r._1, r._2)).map {
      case (q, id, s) => (q, id, s)
    }
    val dups = rows ++ rows.filter(_._3 >= 0.4) // bit-identical repeats
    val df = dups.toDF("query_id", "cand_id", "cosine")
    val got = df.groupBy(col("query_id"))
      .agg(TopKPairsAgg.topkPairs(col("cand_id"), col("cosine"), 5).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("query_id"), col("e.cand_id"), (col("i") + 1).as("rnk"),
        col("e.score"))
      .orderBy(col("query_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == reference(rows, 5))
  }

  test("buffer: bounded size, rank order, duplicate rejection, merge parity") {
    val rnd = new scala.util.Random(23)
    val items = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(9) / 10.0))
    val one = new TopKPairsBuffer(7)
    items.foreach { case (id, s) => one.add(id, s) }
    // Same stream split at arbitrary points and merged must agree.
    val (a, b) = items.splitAt(97)
    val ba = new TopKPairsBuffer(7); a.foreach { case (id, s) => ba.add(id, s) }
    val bb = new TopKPairsBuffer(7); b.foreach { case (id, s) => bb.add(id, s) }
    ba.merge(bb)
    def dump(buf: TopKPairsBuffer) =
      (0 until buf.size).map(i => (buf.scores(i), buf.ids(i)))
    assert(dump(one) == dump(ba))
    assert(one.size <= 7)
    val exp = items.distinct.sortBy { case (id, s) => (-s, id) }.take(7)
      .map { case (id, s) => (s, id) }
    assert(dump(one) == exp)
  }

  test("buffer: NaN scores rank largest (window parity) and keep the invariant") {
    // A zero-norm vector yields cosine = NaN. The replaced row_number
    // window (Spark double ordering) sorts NaN ABOVE +Inf; the buffer
    // must match under its total order, keep the array sorted, and still
    // dedup bit-identical (NaN, id) repeats.
    val nan = Double.NaN
    val items = Seq(
      (5L, 0.9), (2L, nan), (9L, 0.3), (2L, nan), // duplicate NaN pair
      (7L, nan), (1L, 0.9), (3L, Double.PositiveInfinity))
    val buf = new TopKPairsBuffer(5)
    items.foreach { case (id, s) => buf.add(id, s) }
    val got = (0 until buf.size).map(i => (buf.ids(i), buf.scores(i)))
    // Expected: NaN pairs first (id asc), then +Inf, then finite desc.
    val exp = Seq((2L, nan), (7L, nan), (3L, Double.PositiveInfinity),
      (1L, 0.9), (5L, 0.9))
    assert(got.map(_._1) == exp.map(_._1))
    assert(got.zip(exp).forall { case ((_, a), (_, b)) =>
      java.lang.Double.compare(a, b) == 0
    })
    // Split/merge parity holds with NaN in both halves.
    val (a, b) = items.splitAt(3)
    val ba = new TopKPairsBuffer(5); a.foreach { case (id, s) => ba.add(id, s) }
    val bb = new TopKPairsBuffer(5); b.foreach { case (id, s) => bb.add(id, s) }
    ba.merge(bb)
    val merged = (0 until ba.size).map(i => (ba.ids(i), ba.scores(i)))
    assert(merged.map(_._1) == got.map(_._1))
  }
}
