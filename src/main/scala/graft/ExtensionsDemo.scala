package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.GraftExtensions

/** Drives the SparkSessionExtensions deployment path end-to-end: builds a
  * session with `GraftExtensions` injected and runs both native functions
  * through plain SQL. `sbt "runMain graft.ExtensionsDemo"`.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-demo")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d, 3.0d)) AS c")
      .collect().head.getDouble(0)
    println(f"cosine_sim(v, v) = $cos%.6f (expect 1.000000)")

    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    val row = spark.sql(
      """SELECT hll_distinct(l_partkey) AS approx,
        |       COUNT(DISTINCT l_partkey) AS exact
        |FROM lineitem""".stripMargin).collect().head
    val (approx, exact) = (row.getLong(0), row.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    println(f"hll_distinct=$approx exact=$exact relative_error=$err%.4f")
    require(err < 0.05, s"HLL error $err out of spec")

    // Plain fractional literals (array<decimal>) — the natural SQL
    // spelling must work, not just the 0.5D double form.
    val kll = spark.sql(
      """SELECT kll_quantiles(l_extendedprice, array(0.5), 200) AS q,
        |       percentile(l_extendedprice, 0.5) AS exact
        |FROM lineitem""".stripMargin).collect().head
    val (kllMed, exactMed) = (kll.getSeq[Double](0).head, kll.getDouble(1))
    println(f"kll median=$kllMed%.2f exact=$exactMed%.2f")
    require(math.abs(kllMed - exactMed) / exactMed < 0.10,
      s"KLL median $kllMed too far from exact $exactMed")

    // bloom_agg / bloom_contains round-trip: every present key must probe
    // true (no false negatives); a disjoint key range should mostly miss.
    val bloomRow = spark.sql(
      """WITH b AS (SELECT bloom_agg(l_partkey, 10000, 65536) AS bf
        |           FROM lineitem)
        |SELECT
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT bloom_contains((SELECT bf FROM b), l_partkey)) AS false_negs,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE bloom_contains((SELECT bf FROM b), l_partkey + 1000000)) AS fp_hits,
        |  (SELECT COUNT(*) FROM lineitem) AS n""".stripMargin).collect().head
    println(s"bloom false_negs=${bloomRow.getLong(0)} " +
      s"fp_hits=${bloomRow.getLong(1)}/${bloomRow.getLong(2)}")
    require(bloomRow.getLong(0) == 0L, "bloom filter produced false negatives")
    require(bloomRow.getLong(1) < bloomRow.getLong(2) / 2,
      "bloom FP rate out of spec for 64Ki bits / 2k keys")

    // Theta set algebra over two independently built sketches (exact
    // regime at this scale): overlap of the part sets shipped by two
    // supplier halves.
    val theta = spark.sql(
      """WITH a AS (SELECT theta_sketch(l_partkey, 16) AS s FROM lineitem
        |           WHERE l_suppkey % 2 = 0),
        |b AS (SELECT theta_sketch(l_partkey, 16) AS s FROM lineitem
        |      WHERE l_suppkey % 2 = 1),
        |x AS (SELECT COUNT(DISTINCT l_partkey) AS n FROM lineitem)
        |SELECT round(theta_union_est(a.s, b.s)) AS apx_union, x.n AS exact_union,
        |  round(theta_intersect_est(a.s, b.s)) AS apx_both
        |FROM a, b, x""".stripMargin).collect().head
    println(s"theta union=${theta.getDouble(0)} exact=${theta.getLong(1)} " +
      s"intersect=${theta.getDouble(2)}")
    require(theta.getDouble(0) == theta.getLong(1).toDouble,
      "theta union not exact below nominal entries")

    // Count-min point queries over a stored sketch: every supplier's
    // estimate must bound its exact line count from above.
    val cms = spark.sql(
      """WITH s AS (SELECT count_min_sketch(l_suppkey, 0.001d, 0.99d, 42)
        |           AS cms FROM lineitem),
        |t AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
        |SELECT SUM(CASE WHEN cms_estimate(s.cms, t.l_suppkey) < t.n
        |           THEN 1 ELSE 0 END) AS undercounts, COUNT(*) AS keys
        |FROM t, s""".stripMargin).collect().head
    println(s"cms undercounts=${cms.getLong(0)}/${cms.getLong(1)} keys")
    require(cms.getLong(0) == 0L, "count-min sketch undercounted a key")

    // Stored-KLL rollup: per-priority quantile sketches merged to a
    // global median without rescanning orders.
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("orders")
    val kllStored = spark.sql(
      """SELECT kll_value(kll_merge(sk), 0.5d) AS med
        |FROM (SELECT o_orderpriority, kll_sketch(o_totalprice) AS sk
        |      FROM orders GROUP BY 1)""".stripMargin).collect().head
    println(s"kll merged median totalprice=${kllStored.getDouble(0)}")
    require(!kllStored.getDouble(0).isNaN, "kll merged median is NaN")
    spark.stop()
  }
}
