package graft

import org.apache.spark.sql.functions._

/** Approximate-distinct sketch accuracy vs exact counts. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per supplier on sf0.001") {
    val li = Tables.lineitem(spark, Sf001)
    val joined = li.groupBy(col("l_suppkey"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
    val bad = joined
      .filter(abs(col("approx") - col("exact")) > col("exact") * 0.05 + lit(2))
      .count()
    assert(bad == 0, s"$bad suppliers outside 5% relative error")
  }

  test("misra-gries deserializes v1 (writeUTF) checkpoint bytes") {
    import java.io._
    import org.apache.spark.sql.graft.{MgBuffer, MisraGriesAgg}
    // Hand-craft the pre-versioning wire format a restarted streaming
    // query would hold in its state store.
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(8) // k — first byte 0, distinguishing v1 from the 0xFF marker
    out.writeInt(2)
    out.writeUTF("alpha"); out.writeLong(3L)
    out.writeUTF("beta"); out.writeLong(1L)
    out.flush()
    val agg = org.apache.spark.sql.graft.MisraGriesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val buf = agg.deserialize(bytes.toByteArray)
    assert(buf.k == 8 && buf.counts.toMap == Map("alpha" -> 3L, "beta" -> 1L))
    // And the new format round-trips, including a >64KB term writeUTF
    // could not have carried.
    val big = "t" * 70000
    val b2 = new MgBuffer(4); b2.add(big); b2.add("s")
    val rt = agg.deserialize(agg.serialize(b2))
    assert(rt.counts.toMap == Map(big -> 1L, "s" -> 1L))
  }

  test("KLL quantile sketch: rank error within bound, merge path exercised") {
    import spark.implicits._
    import org.apache.spark.sql.graft.KllQuantilesAgg
    // Deterministic skewed values (i*i scrambles ranks vs partition order);
    // 16 partitions force the map-side-partial + merge path.
    val n = 20000
    val vals = (1 to n).map(i => ((i.toLong * i) % 9973).toDouble)
    val df = vals.toDF("v").repartition(16)
    val ranks = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = df.agg(KllQuantilesAgg.kllQuantiles(col("v"), ranks).as("q"))
      .head().getAs[scala.collection.Seq[Double]](0)
    val sorted = vals.sorted
    ranks.zip(got).foreach { case (r, est) =>
      // KLL guarantees the returned value's TRUE rank is within eps of the
      // requested rank (eps ≈ 1.65%/99% conf at k=200; assert a 3% cushion).
      val trueRank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(trueRank - r) <= 0.03,
        s"rank($est) = $trueRank, requested $r")
    }
  }

  test("KLL sketch on empty input yields NaNs, not a crash") {
    import spark.implicits._
    import org.apache.spark.sql.graft.KllQuantilesAgg
    val got = Seq.empty[Double].toDF("v")
      .agg(KllQuantilesAgg.kllQuantiles(col("v"), Seq(0.5)).as("q"))
      .head().getAs[scala.collection.Seq[Double]](0)
    assert(got.length == 1 && got.head.isNaN)
  }

  test("count-min sketch: heavy-hitter token estimates bound exact counts") {
    import graft.text.TextFns
    // One constant-size mergeable sketch summarizes the whole token stream
    // (the 100 TB path for frequency stats); estimates never undercount
    // and overcount by at most eps·N with the configured confidence.
    val toks = Tables.documents(spark, Sf001)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
    val total = toks.count()
    val sketchBytes = toks
      .agg(count_min_sketch(col("token"), lit(0.001), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))

    val top = toks.groupBy("token").count()
      .orderBy(col("count").desc, col("token")).limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    top.foreach { case (tok, exact) =>
      val est = cms.estimateCount(tok)
      assert(est >= exact, s"CMS undercounted '$tok': $est < $exact")
      assert(est <= exact + (0.001 * total).toLong + 1,
        s"CMS overcount for '$tok' beyond eps*N: $est vs $exact (N=$total)")
    }
  }

  test("builtin HLL sketches: exact in set regime, bounded in estimation regime, union = global") {
    // Exact (coupon/set) regime — the property a22's oracle relies on.
    val small = spark.range(2000).select((col("id") % 5).as("g"), col("id"))
    val perSmall = small.groupBy(col("g"))
      .agg(hll_sketch_agg(col("id"), lit(14)).as("sk"), countDistinct(col("id")).as("n"))
    perSmall.select(hll_sketch_estimate(col("sk")).as("e"), col("n")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // Estimation regime: 500k distincts at lgK=12 → RSE ≈ 1.04/√4096 ≈
    // 1.6%; assert a loose 5% envelope. Partitioned build + union must
    // agree with the one-shot global sketch (merge soundness).
    val big = spark.range(500000).select((col("id") % 8).as("g"), col("id"))
    val unioned = big.groupBy(col("g"))
      .agg(hll_sketch_agg(col("id"), lit(12)).as("sk"))
      .select(hll_union_agg(col("sk")).as("u"))
      .select(hll_sketch_estimate(col("u"))).head().getLong(0)
    val oneShot = big.agg(hll_sketch_estimate(hll_sketch_agg(col("id"), lit(12))))
      .head().getLong(0)
    assert(unioned == oneShot, s"union-of-parts $unioned != one-shot $oneShot")
    assert(math.abs(unioned - 500000.0) / 500000.0 < 0.05,
      s"estimation-regime error too large: $unioned vs 500000")
  }

  test("stored KLL: merge-of-binaries = one-shot sketch, rank error bounded at 200k") {
    import org.apache.spark.sql.graft.KllStoreFns._
    // Estimation regime: 200k values in 8 shards, stored per-shard
    // binaries merged afterwards must give the SAME sketch as one global
    // build (KLL merge is deterministic given identical inputs per
    // shard), and the merged median's true rank must sit inside the
    // k=200 error envelope (~2.9% at 99%; assert 5%).
    val vals = spark.range(200000)
      .select((col("id") % 8).as("g"), col("id").cast("double").as("v"))
    val merged = vals.groupBy(col("g")).agg(kllSketch(col("v")).as("sk"))
      .agg(kllMerge(col("sk")).as("u"))
      .select(kllValue(col("u"), lit(0.5))).head().getDouble(0)
    assert(math.abs(merged - 100000.0) / 200000.0 < 0.05,
      s"merged median rank error too large: $merged")
    // Exact regime parity with the evaluate-now aggregate.
    val small = spark.range(100).select(col("id").cast("double").as("v"))
    val viaStore = small.agg(kllSketch(col("v")).as("sk"))
      .select(kllValue(col("sk"), lit(0.5))).head().getDouble(0)
    val viaDirect = small
      .agg(org.apache.spark.sql.graft.KllQuantilesAgg.kllQuantiles(
        col("v"), Seq(0.5)).as("q"))
      .head().getSeq[Double](0).head
    assert(viaStore == viaDirect,
      s"stored path $viaStore != direct path $viaDirect")
  }

  test("cms_estimate expression matches driver-side readFrom on both key types") {
    import org.apache.spark.sql.graft.CmsFns.cmsEstimate
    // Long keys: the expression must probe the same addLong path the
    // aggregate used; string keys the UTF-8 path. Compare the Column-API
    // estimator row-for-row against the JVM readFrom estimates that the
    // existing count-min test already validated against exact counts.
    val li = Tables.lineitem(spark, Sf001)
    val sketchBytes = li
      .agg(count_min_sketch(col("l_suppkey"), lit(0.001), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val viaExpr = li.groupBy(col("l_suppkey")).count()
      .crossJoin(broadcast(li.agg(
        count_min_sketch(col("l_suppkey"), lit(0.001), lit(0.99), lit(42)).as("cms"))))
      .select(col("l_suppkey"), cmsEstimate(col("cms"), col("l_suppkey")).as("est"),
        col("count"))
      .collect()
    assert(viaExpr.nonEmpty)
    viaExpr.foreach { r =>
      val (k, est, exact) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(est == cms.estimateCount(k),
        s"expr/readFrom divergence for key $k: $est vs ${cms.estimateCount(k)}")
      assert(est >= exact, s"CMS undercounted $k: $est < $exact")
    }
    // String path: build over strings, probe with strings.
    val sdf = spark.createDataFrame(Seq(Tuple1("x"), Tuple1("x"), Tuple1("y")))
      .toDF("t")
    val got = sdf.crossJoin(
        sdf.agg(count_min_sketch(col("t"), lit(0.01), lit(0.99), lit(1)).as("cms")))
      .select(col("t"), cmsEstimate(col("cms"), col("t")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 2L, "y" -> 1L), got.toString)
  }

  test("misra-gries: MG guarantee holds under eviction and merge pressure") {
    import org.apache.spark.sql.graft.MisraGriesAgg
    import spark.implicits._
    // 5000 rows over ~200 distinct keys with a Zipf-ish skew, k = 8 —
    // far past eviction, and the 8-partition layout forces summary merges.
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(5000)(s"k${math.min(rnd.nextInt(200), rnd.nextInt(200))}")
    val df = keys.toDF("key").repartition(8)
    val k = 8
    val n = keys.size.toLong
    val apx = df.agg(MisraGriesAgg.heavyHitters(col("key"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.apx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(apx.size <= k)
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (k + 1)
    // Every surviving estimate underestimates, by at most n/(k+1).
    apx.foreach { case (key, a) =>
      val f = exact.getOrElse(key, 0L)
      assert(a <= f, s"MG overcounted '$key': $a > $f")
      assert(f - a <= bound, s"MG error for '$key' beyond n/(k+1): $f - $a > $bound")
    }
    // Every true heavy hitter (f > n/(k+1)) is present.
    exact.filter(_._2 > bound).keys.foreach { key =>
      assert(apx.contains(key), s"true heavy hitter '$key' missing from summary")
    }
  }

  test("misra-gries: exact when cardinality stays under k") {
    import org.apache.spark.sql.graft.MisraGriesAgg
    import spark.implicits._
    val df = (1 to 1000).map(i => s"k${i % 10}").toDF("key").repartition(6)
    val apx = df.agg(MisraGriesAgg.heavyHitters(col("key"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.apx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(apx == (0 to 9).map(i => s"k$i" -> 100L).toMap)
  }

  test("theta sketch: exact below nominal entries, merge-invariant, bounded above") {
    import org.apache.spark.sql.graft.ThetaSketchAgg._
    import spark.implicits._
    // Exact regime: 1000 distincts < 4096 nominal (default lgK=12) — the
    // estimate IS the cardinality, independent of partitioning (the merge
    // path composes partial unions; exactness must survive it).
    val df = (1 to 1000).toDF("v")
    assert(df.agg(thetaEstimate(thetaSketch(col("v"))))
      .head.getDouble(0) == 1000.0)
    assert(df.repartition(8).agg(thetaEstimate(thetaSketch(col("v"))))
      .head.getDouble(0) == 1000.0)
    // Estimation regime: lgK=9 (512 retained) over 50k distincts. RSE ≈
    // 1/√512 ≈ 4.4%; 5σ bound keeps the assertion deterministic-enough
    // for the fixed hash family while still catching a broken update path
    // (which typically misses by orders of magnitude, not percent).
    val e = (1 to 50000).toDF("v").repartition(8)
      .agg(thetaEstimate(thetaSketch(col("v"), 9))).head.getDouble(0)
    assert(math.abs(e - 50000.0) / 50000.0 < 0.22, s"estimation-mode estimate $e")
  }

  test("theta set ops: exact regime equals true set algebra across types") {
    import org.apache.spark.sql.graft.ThetaSketchAgg._
    import spark.implicits._
    // A = {1..1000}, B = {500..1500}: |A∩B| = 501, |A∖B| = 499,
    // |A∪B| = 1500 — all below nominal entries, so equality is exact.
    val a = (1 to 1000).toDF("v").agg(thetaSketch(col("v")).as("sa"))
    val b = (500 to 1500).toDF("v").agg(thetaSketch(col("v")).as("sb"))
    val r = a.crossJoin(b).select(
      thetaIntersectEst(col("sa"), col("sb")).as("i"),
      thetaAnotBEst(col("sa"), col("sb")).as("d"),
      thetaUnionEst(col("sa"), col("sb")).as("u")).head
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2)) ==
      ((501.0, 499.0, 1500.0)))
    // String keys hash through the same sketch (the update-path overload).
    val sa = Seq("x", "y", "z").toDF("s").agg(thetaSketch(col("s")).as("t"))
    assert(sa.select(thetaEstimate(col("t"))).head.getDouble(0) == 3.0)
  }
}
