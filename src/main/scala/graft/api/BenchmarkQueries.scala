package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Classic decision-support shapes (TPC-H Q1/Q3/Q6 analogues on the
  * TPC-H-ish testdata) — the standard relational benchmark surface a
  * drop-in analytics engine is expected to run, and the canonical
  * plan-shape demonstrations:
  *
  *  - q1: full-scan groupBy with 8 simultaneous aggregates — partial
  *    (map-side) aggregation does almost all the work; the shuffle carries
  *    4 groups.
  *  - q3: selective dim filter → fact join → agg → rounded top-10
  *    (TakeOrderedAndProject); the filtered customer side broadcasts when
  *    it fits (optimizer's size call, not a hint — see the q3 comment).
  *  - q6: pure scan-filter-sum — predicate pushdown + column pruning means
  *    the scan reads 4 of 11 columns and skips row groups by shipdate.
  *
  * Dates are TIMESTAMP in the parquet; literals are cast UTC timestamps on
  * both sides, and q3's date output goes through `date_format` (string) to
  * stay engine-portable.
  */
object BenchmarkQueries {
  type Q = (SparkSession, String) => DataFrame

  private def ts(s: String) = lit(s).cast("timestamp")

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> ((s, d) => lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q3_shipping_priority" -> ((s, d) => {
      // NO broadcast() hint on customer: a 1/5-selectivity dimension is
      // size-dependent — tiny here, NOT broadcastable at 100 TB. Catalyst
      // (autoBroadcastJoinThreshold) + AQE pick broadcast when it fits and
      // degrade to shuffle when it doesn't; forcing the hint would pin the
      // plan to the small-scale choice. (PlanShapeSpec still asserts the
      // broadcast materializes at test scale — via the optimizer, not us.)
      val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = orders(s, d).filter(col("o_orderdate") < ts("1996-03-15"))
      val li = lineitem(s, d).filter(col("l_shipdate") > ts("1996-03-15"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(
          col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("order_date"), col("l_orderkey"))
        .limit(10)
    }),

    "q6_forecast_revenue" -> ((s, d) => lineitem(s, d)
      .filter(
        col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))),

    // Q5 analogue (local-supplier revenue by nation): the canonical
    // snowflake join chain — fact → filtered orders → customer →
    // supplier (with the c_nationkey = s_nationkey "local" constraint) →
    // nation → region. The two geo dimensions are EXPLICITLY broadcast
    // (always tiny: 25/5 rows at any corpus scale, unlike the
    // size-dependent customer side q3 leaves to the optimizer); the big
    // sides hash-join on their keys and Catalyst orders the chain.
    "q5_local_supplier" -> ((s, d) => {
      val ord = orders(s, d).filter(
        col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      lineitem(s, d)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        // Same decimal-sum hardening as q10: thousands of double terms per
        // nation can straddle a half-cent boundary under different
        // summation orders; per-term DECIMAL makes the sum associative.
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")), 2).cast("double")
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q4 analogue (priority checking): orders in one quarter with at
    // least one big-lot line, counted by priority — the correlated-EXISTS
    // shape, planned as a left-semi hash join (the fact side is reduced
    // to distinct orderkeys by the semi join itself, no pre-distinct).
    "q4_order_priority" -> ((s, d) => {
      val ord = orders(s, d).filter(
        col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
      ord.join(
          lineitem(s, d).filter(col("l_quantity") >= 45).select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q10 analogue (returned-item revenue): selective flag filter on the
    // fact, order/customer join chain, nation decoration, top-20 — the
    // "worst customers" report. Nation broadcasts (25 rows at any scale);
    // the revenue agg feeds TakeOrderedAndProject, never a global sort.
    "q10_returned_items" -> ((s, d) => {
      val ord = orders(s, d).filter(
        col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
      lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("n_name"))
        // Decimal-summed revenue: this aggregate landed on a 2-dp rounding
        // boundary (…3.595) where double summation ORDER decides the
        // rounded cent; per-term cast to DECIMAL(18,6) makes the sum exact
        // and associative, so Spark's partial-agg order and DuckDB's scan
        // order can't disagree.
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")), 2).cast("double")
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q14 analogue (promo revenue share): conditional aggregate ratio over
    // the part join — one month of fact rows, two sums in one pass.
    "q14_promo_share" -> ((s, d) => {
      // Decimal-summed numerator/denominator (order-independent), ratio
      // taken in double after both sums are exact.
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")
      lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-03-01") && col("l_shipdate") < ts("1996-04-01"))
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0.0).cast("decimal(18,6)"))).cast("double")
            / sum(rev).cast("double"),
          4).as("promo_pct"))
    }),

    // Q17 analogue (small-quantity revenue): the correlated-SCALAR-
    // subquery shape — lines below 50% of their part's average quantity.
    // Decorrelated the way Catalyst does it: the per-part average is one
    // map-side-combinable aggregate joined back to the fact (broadcast
    // when it fits — it is |parts|-sized, not fact-sized).
    "q17_small_quantity" -> ((s, d) => {
      val avgQty = lineitem(s, d)
        .groupBy(col("l_partkey").as("ap"))
        .agg(avg(col("l_quantity")).as("aq"))
      lineitem(s, d)
        .join(avgQty, col("l_partkey") === col("ap"))
        .filter(col("l_quantity") < col("aq") * 0.5)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,6)")), 2)
          .cast("double").as("small_lot_revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Q18 analogue (large-volume orders): the HAVING-subquery shape. The
    // fact self-aggregation is one map-side-combinable shuffle; its
    // >threshold tail is tiny (~1% of orders), so under AQE it BROADCASTS
    // into the orders join — the IN-subquery collapses to a broadcast hash
    // join instead of a second fact shuffle. l_quantity is integral, so
    // the rounded-total threshold compare is exact in both engines.
    "q18_large_orders" -> ((s, d) => {
      val big = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 250)
      orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(
          col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          round(col("o_totalprice"), 2).as("total_price"),
          col("total_qty"))
        .orderBy(col("total_price").desc, col("o_orderkey"))
        .limit(100)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  o_orderpriority,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-03-15'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY l_orderkey, order_date, o_orderpriority
        |ORDER BY revenue DESC, order_date, l_orderkey
        |LIMIT 10""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q14_promo_share" ->
      """SELECT ROUND(100.0 *
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |        ELSE CAST(0.0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
        |  4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    // l_quantity is integral ⇒ the per-part average is exact in both
    // engines and the boundary compare cannot flip on summation order.
    "q17_small_quantity" ->
      """WITH aq AS (
        |  SELECT l_partkey AS ap, AVG(l_quantity) AS aq
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
        |    AS small_lot_revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN aq ON l_partkey = ap
        |WHERE l_quantity < aq * 0.5""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING ROUND(SUM(l_quantity), 2) > 250)
        |SELECT c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  ROUND(o_totalprice, 2) AS total_price, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_price DESC, o_orderkey
        |LIMIT 100""".stripMargin
  )
}
