package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench dirty-detector's decision logic, tested with PLANTED
  * windows — including the exact r13 driver-window scenario where a
  * co-tenant CPU load inflated q_quality_clf 10x while every
  * probe-visible instrument read clean. */
class BenchGuardSpec extends AnyFunSuite {

  private val cores = 32

  test("r13 blind spot: a synthetic co-tenant load that shows NO steal, " +
      "NO probe-bracket disturbance and NO machine-vs-process divergence " +
      "still trips the committed-clean-floor trigger") {
    // q_quality_clf's r13 driver window verbatim: walls 33.1/20.5/25.1 s
    // against a 1.958 s committed clean floor; steal 0, other-process
    // CPU far under the 15%-of-machine bar (the co-tenant pressure was
    // cache/scheduling, not attributable CPU), bracket at the session
    // floor (probes ran BETWEEN queries and saw nothing)
    val reasons = BenchGuard.verdict(
      qStealPct = 0.0,
      wallsAndOtherCores = Seq((33.1, 0.4), (20.5, 0.3), (25.1, 0.5)),
      nCores = cores,
      bracket = Some(1.0), floorPar = 1.0,
      minWall = 20.5,
      cleanFloor = Some(1.958))
    assert(reasons === Seq("floor"),
      s"the r13 scenario must trip exactly the floor trigger: $reasons")
  }

  test("floor trigger boundaries: ratio bound, absolute slack, and " +
      "no-floor queries") {
    def floorOnly(minWall: Double, floor: Option[Double]) =
      BenchGuard.verdict(0.0, Seq((minWall, 0.0)), cores, None, 1.0,
        minWall, floor)
    // within 2.5x: clean (the uniform 1.2-1.5x window inflation the
    // r13 verdict attributed to noise must NOT flap the flag)
    assert(floorOnly(2.4, Some(1.0)).isEmpty)
    // beyond 2.5x with absolute excess: dirty
    assert(floorOnly(2.6, Some(1.0)) === Seq("floor"))
    // beyond 2.5x but under the 0.3 s absolute slack (a 57 ms query
    // reading 150 ms): clean — scheduler jitter, not a signal
    assert(floorOnly(0.15, Some(0.057)).isEmpty)
    // no committed floor (new query): the trigger simply doesn't exist
    assert(floorOnly(100.0, None).isEmpty)
  }

  test("the three r13-era instruments still fire independently") {
    // hypervisor steal
    assert(BenchGuard.verdict(4.5, Seq((1.0, 0.0)), cores, None, 1.0,
      1.0, None) === Seq("steal"))
    // other-process CPU above 15% of the machine on a >=0.5 s wall
    assert(BenchGuard.verdict(0.0, Seq((2.0, 0.16 * cores)), cores,
      None, 1.0, 2.0, None) === Seq("other_cpu"))
    // ...but NOT on a sub-half-second wall (jiffy quantization)
    assert(BenchGuard.verdict(0.0, Seq((0.4, 0.5 * cores)), cores,
      None, 1.0, 0.4, None).isEmpty)
    // probe bracket above 1.5x the session floor
    assert(BenchGuard.verdict(0.0, Seq((1.0, 0.0)), cores, Some(1.6),
      1.0, 1.0, None) === Seq("bracket"))
    // a fully dirty window reports every tripped instrument
    assert(BenchGuard.verdict(4.5, Seq((33.1, 0.2 * cores)), cores,
      Some(2.0), 1.0, 33.1, Some(2.0)) ===
      Seq("steal", "other_cpu", "bracket", "floor"))
  }

  test("correlated-contention escalation: after 3 session dirty flags " +
      "the floor trigger drops to 1.8x — the r14 q_iceberg_changelog " +
      "window (2.13x, unflagged then) must flag") {
    // the r14 driver window verbatim: min wall 1.362 s vs the 0.547 s
    // committed floor (2.49x — under the 2.5x base trigger), in a
    // session that had already flagged q_range_join, q_dsir and
    // q_dedup_minhash dirty
    def window(sessionDirty: Int) = BenchGuard.verdict(
      qStealPct = 0.0,
      wallsAndOtherCores = Seq((1.362, 0.3), (1.5, 0.2)),
      nCores = cores,
      bracket = Some(1.0), floorPar = 1.0,
      minWall = 1.362,
      cleanFloor = Some(0.547),
      sessionDirtyCount = sessionDirty)
    // a quiet session keeps the designed 2.5x margin (presumed innocent)
    assert(window(0).isEmpty)
    assert(window(2).isEmpty)
    // a session that already flagged >=3 windows escalates and catches it
    assert(window(3) === Seq("floor"))
    // the absolute slack still applies under escalation: a 0.1 s query
    // reading 0.19 s (1.9x) stays clean even in a dirty session
    assert(BenchGuard.verdict(0.0, Seq((0.19, 0.0)), cores, None, 1.0,
      0.19, Some(0.1), sessionDirtyCount = 5).isEmpty)
    // and genuinely clean queries stay clean under escalation (1.5x)
    assert(BenchGuard.verdict(0.0, Seq((0.82, 0.0)), cores, None, 1.0,
      0.82, Some(0.547), sessionDirtyCount = 5).isEmpty)
  }

  test("committed floors cover every sf0.1 headline and sf1 tier query " +
      "that has a clean record, and all floors are positive") {
    (BenchGuard.cleanFloorSf01.values ++ BenchGuard.cleanFloorSf1.values)
      .foreach(f => assert(f > 0.0))
    // the sf1 tier keys are a subset of the sf0.1 ones (same queries,
    // 10x corpus)
    BenchGuard.cleanFloorSf1.keySet.foreach(k =>
      assert(BenchGuard.cleanFloorSf01.contains(k), k))
  }

  test("every committed floor key resolves to a real SparkEntry query — " +
      "a renamed gate would silently lose its floor trigger") {
    (BenchGuard.cleanFloorSf01.keySet ++ BenchGuard.cleanFloorSf1.keySet)
      .foreach(k => assert(SparkEntry.queries.contains(k),
        s"floor key $k is not a SparkEntry query"))
  }
}
