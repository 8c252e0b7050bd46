package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

/** Salted join equivalence: identical rows to the plain join on a skewed
  * key distribution (one key holding 90% of the rows).
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under skew") {
    val big = ((1 to 9000).map(i => (1L, s"hot$i")) ++
      (1 to 1000).map(i => ((i % 50 + 2).toLong, s"cold$i")))
      .toDF("k", "payload")
    val small = (1L to 52L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = big.join(small, big("k") === small("k"))
      .select(big("k"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", factor = 8)
      .select(big("k"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 10000)
  }
}
