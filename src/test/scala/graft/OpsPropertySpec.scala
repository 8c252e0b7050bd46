package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, RangeJoin}

/** ScalaCheck properties for the composed join operators: on random keyed
  * time-series, each must agree row-for-row with a naive in-memory
  * reference implementation of its semantics.
  */
object OpsProperties extends Properties("Ops") {
  private lazy val spark = TestSpark.spark
  import Prop.forAll

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  // (key, id, t) with duplicate times possible and ids unique.
  private val genRows: Gen[List[(String, Long, Long)]] = for {
    m <- Gen.choose(1, 40)
    rows <- Gen.listOfN(m, for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 60L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (k, i.toLong + 1, t) }

  property("RangeJoin.bandPairs == naive band predicate") =
    forAll(genRows, Gen.choose(1L, 25L)) { (rows, band) =>
      import spark.implicits._
      val df = rows.toDF("k", "id", "t")
      val l = df.select(col("k"), col("id").as("ida"), col("t").as("ta"))
      val r = df.select(col("k"), col("id").as("idb"), col("t").as("tb"))
      val got = RangeJoin.bandPairs(l, r, "k", "ta", "tb", band)
        .select("ida", "idb").as[(Long, Long)].collect().toSet
      val want = (for {
        (ka, ida, ta) <- rows
        (kb, idb, tb) <- rows
        if ka == kb && tb > ta && tb <= ta + band
      } yield (ida, idb)).toSet
      got == want
    }

  // right rows: (k, t, v) with v unique per row.
  private val genRight: Gen[List[(String, Long, Long)]] = for {
    m <- Gen.choose(0, 20)
    rows <- Gen.listOfN(m, for {
      k <- Gen.oneOf("a", "b")
      t <- Gen.choose(0L, 60L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) }

  private val genLeft: Gen[List[(String, Long, Long)]] = for {
    m <- Gen.choose(1, 20)
    rows <- Gen.listOfN(m, for {
      k <- Gen.oneOf("a", "b")
      t <- Gen.choose(0L, 60L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (k, i.toLong + 1, t) }

  private def naiveAsOf(
      left: List[(String, Long, Long)], // (k, id, t)
      right: List[(String, Long, Long)], // (k, t, v)
      forward: Boolean,
      tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (k, id, t) =>
      val cands = right.filter { case (rk, rt, _) =>
        rk == k && (if (forward) rt >= t else rt <= t) &&
          tol.forall(x => (if (forward) rt - t else t - rt) <= x)
      }
      val best = if (cands.isEmpty) None
      else {
        // nearest t first; among equal t the largest v wins
        val nearest = if (forward) cands.map(_._2).min else cands.map(_._2).max
        Some(cands.filter(_._2 == nearest).map(_._3).max)
      }
      id -> best
    }.toMap

  property("AsOfJoin == naive nearest lookup (both directions, ± tolerance)") =
    forAll(genLeft, genRight, Gen.oneOf(true, false),
      Gen.option(Gen.choose(0L, 30L))) { (lrows, rrows, forward, tol) =>
      import spark.implicits._
      val left = lrows.toDF("k", "id", "t")
      val right = rrows.toDF("k", "t", "v")
      val dir = if (forward) AsOfJoin.Forward else AsOfJoin.Backward
      val got = AsOfJoin.asOf(left, right, dir, tol)
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      got == naiveAsOf(lrows, rrows, forward, tol)
    }
}
