package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bandPairs matches the naive non-equi join row-for-row") {
    val rows = Seq(
      // (key, id, t) — includes band-edge (exactly +band), tie (same t),
      // cross-bin matches, and a key with no partner.
      ("u1", 1L, 0L), ("u1", 2L, 50L), ("u1", 3L, 100L), ("u1", 4L, 161L),
      ("u2", 5L, 90L), ("u2", 6L, 190L), ("u2", 7L, 190L),
      ("u3", 8L, 7L))
    val df = rows.toDF("k", "id", "t")
    val l = df.select(col("k"), col("id").as("ida"), col("t").as("ta"))
    val r = df.select(col("k"), col("id").as("idb"), col("t").as("tb"))
    val band = 100L

    val got = RangeJoin.bandPairs(l, r, "k", "ta", "tb", band)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val want = l.join(r, l("k") === r("k") && r("tb") > l("ta") && r("tb") <= l("ta") + band)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.contains((1L, 3L))) // edge: exactly +band included
  }

  test("band edges: strictly-after lower bound, inclusive upper bound") {
    val l = Seq(("k", 1L, 0L)).toDF("k", "ida", "ta")
    val r = Seq(("k", 2L, 0L), ("k", 3L, 1L), ("k", 4L, 100L), ("k", 5L, 101L))
      .toDF("k", "idb", "tb")
    val got = RangeJoin.bandPairs(l, r, "k", "ta", "tb", 100L)
      .select("idb").as[Long].collect().toSet
    assert(got === Set(3L, 4L)) // 0 excluded (not strictly after), 101 excluded (> +band)
  }
}
