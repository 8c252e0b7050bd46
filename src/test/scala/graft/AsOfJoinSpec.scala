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

  test("forward direction: earliest at-or-after value, inclusive, tie-broken") {
    val right = Seq(
      (1L, 10L, 100L), (1L, 20L, 200L), (1L, 20L, 201L), (2L, 50L, 500L)
    ).toDF("k", "t", "v")
    val left = Seq(
      (1L, 5L, 1L),   // next is t=10 → 100
      (1L, 10L, 2L),  // exactly at → inclusive → 100
      (1L, 15L, 3L),  // next is the duplicate t=20 → larger v wins → 201
      (1L, 21L, 4L),  // nothing after → null
      (2L, 51L, 5L),  // after key-2's only row → null
      (3L, 10L, 6L)   // key unseen on right → null
    ).toDF("k", "t", "id")
    val got = AsOfJoin.asOf(left, right, direction = AsOfJoin.Forward)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> Some(100L), 2L -> Some(100L), 3L -> Some(201L),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("tolerance nulls out matches beyond the horizon, both directions") {
    val right = Seq((1L, 100L, 7L)).toDF("k", "t", "v")
    val left = Seq(
      (1L, 105L, 1L), // backward dist 5 ≤ 10 → 7
      (1L, 120L, 2L), // backward dist 20 > 10 → null
      (1L, 95L, 3L),  // forward dist 5 ≤ 10 → 7
      (1L, 80L, 4L)   // forward dist 20 > 10 → null
    ).toDF("k", "t", "id")
    def res(dir: AsOfJoin.Direction) =
      AsOfJoin.asOf(left, right, dir, tolerance = Some(10L)).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
    val back = res(AsOfJoin.Backward)
    assert(back(1L) == Some(7L) && back(2L) == None)
    val fwd = res(AsOfJoin.Forward)
    assert(fwd(3L) == Some(7L) && fwd(4L) == None)
  }
}
