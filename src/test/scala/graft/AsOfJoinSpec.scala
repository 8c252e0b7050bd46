package graft

import graft.ops.AsOfJoin

/** As-of join semantics on hand-built fixtures: inclusive at equal time,
  * max-value tie-break, null when nothing precedes.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latest preceding value per key, inclusive, tie-broken, null-safe") {
    // key 1: lookups at t=10 (v=100) and t=20 (v=200, and a duplicate-t
    //        v=201 that must win the tie)
    // key 2: lookup only at t=50
    val right = Seq(
      (1L, 10L, 100L), (1L, 20L, 200L), (1L, 20L, 201L), (2L, 50L, 500L)
    ).toDF("k", "t", "v")
    val left = Seq(
      (1L, 5L, 1L),   // before any lookup → null
      (1L, 10L, 2L),  // exactly at t=10 → inclusive → 100
      (1L, 15L, 3L),  // between → 100
      (1L, 20L, 4L),  // at the duplicate t → larger v wins → 201
      (1L, 99L, 5L),  // after everything → 201
      (2L, 49L, 6L),  // before key-2's only lookup → null
      (2L, 51L, 7L),  // after → 500
      (3L, 10L, 8L)   // key with no lookups at all → null
    ).toDF("k", "t", "id")

    val got = AsOfJoin.asOf(left, right)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> None, 2L -> Some(100L), 3L -> Some(100L), 4L -> Some(201L),
      5L -> Some(201L), 6L -> None, 7L -> Some(500L), 8L -> None))
  }
}
