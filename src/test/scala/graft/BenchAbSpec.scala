package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the auto-A/B clearing rules ([[Bench.abCleared]]) — the predicate
  * the bench SUMMARY's "exonerated" count is derived from, and therefore
  * the round-over-round perf protocol itself. Two rules:
  *
  *  - wall: isolated fresh-JVM min ≤ 1.5× the prior floor → session noise.
  *  - micro-leg cpu (r18): for prev < 0.5 s (under the fresh JVM's own
  *    scheduling+JIT floor, so the wall comparison is meaningless),
  *    isolated total cpu ≤ prev wall → work unchanged. A real k× work
  *    regression grows cpu with wall and must STILL flag.
  */
class BenchAbSpec extends AnyFunSuite {

  test("wall rule: isolated min within 1.5x prev exonerates") {
    assert(Bench.abWallCleared(2.0, Seq(4.1, 2.9, 3.0)))
    assert(!Bench.abWallCleared(2.0, Seq(4.1, 3.2)))
    assert(!Bench.abWallCleared(2.0, Nil)) // failed child: never cleared
  }

  test("cpu rule clears the a23-shaped micro-leg (warm prev below the " +
    "fresh-JVM floor, cpu shows work unchanged)") {
    // The actual r18 closing-run-4 numbers: prev 0.26 s, iso walls
    // 4.0/1.4/1.1 (all > 1.5x prev — wall can never clear), cpu min 0.07.
    val walls = Seq(4.04, 1.36, 1.12)
    val cpus = Seq(0.68, 0.08, 0.07)
    assert(!Bench.abWallCleared(0.26, walls))
    assert(Bench.abCpuCleared(0.26, walls, cpus))
    assert(Bench.abCleared(0.26, walls, cpus))
  }

  test("cpu rule still flags a genuine micro-leg work regression") {
    // Same shape, but the work really grew ~4x: cpu floor now above the
    // old 0.26 s wall — neither rule clears it.
    val walls = Seq(4.1, 1.5, 1.3)
    val cpus = Seq(1.4, 1.1, 1.05)
    assert(!Bench.abCleared(0.26, walls, cpus))
  }

  test("cpu rule is restricted to sub-0.5s prev floors") {
    // A 2 s leg whose isolated wall tripled must NOT be cleared by a
    // low cpu reading (an I/O- or shuffle-bound leg can regress in wall
    // with little cpu); only the wall rule may clear it.
    assert(!Bench.abCleared(2.0, Seq(6.5, 6.8), Seq(0.4, 0.3)))
  }

  test("cpu rule needs cpu samples and a measured wall") {
    assert(!Bench.abCpuCleared(0.26, Seq(1.2), Nil))
    assert(!Bench.abCpuCleared(0.26, Nil, Seq(0.1)))
  }
}
