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
    spark.stop()
  }
}
