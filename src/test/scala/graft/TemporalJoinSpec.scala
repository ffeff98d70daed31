package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** AS-OF and point-in-interval RANGE join semantics on hand-built
  * fixtures: inclusive bounds, tolerance nulling, unmatched rows,
  * bin-boundary points, pair multiplicity. */
class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest at-or-before match per key, left-outer, inclusive") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 100L, ts("2024-01-01 10:05:00"), "b"),
      (3L, 100L, ts("2024-01-01 09:00:00"), "c"), // before every right row
      (4L, 200L, ts("2024-01-01 12:00:00"), "d"), // key with no right rows
      (5L, 300L, ts("2024-01-01 12:00:00"), "e")  // exact-time match
    ).toDF("id", "k", "t", "tag")
    val right = Seq(
      (100L, ts("2024-01-01 09:30:00"), 1.0),
      (100L, ts("2024-01-01 10:00:00"), 2.0), // == left id 1's time
      (100L, ts("2024-01-01 10:04:00"), 3.0),
      (300L, ts("2024-01-01 12:00:00"), 9.0)
    ).toDF("k", "t", "v")
    val got = TemporalJoins.asofJoin(left, right, "k", "k", "t", "t", Seq("v"))
      .select(col("id"), col("prev_v")).as[(Long, Option[Double])]
      .collect().toMap
    assert(got(1L).contains(2.0))  // inclusive: same-instant right row wins
    assert(got(2L).contains(3.0))  // latest of the three, not the first
    assert(got(3L).isEmpty)        // nothing at or before
    assert(got(4L).isEmpty)        // key absent on the right
    assert(got(5L).contains(9.0))
    assert(got.size == 5)          // left-outer: every left row survives
  }

  test("asofJoin tolerance: stale matches null out, fresh ones survive") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 23:00:00"))).toDF("id", "k", "t")
    val right = Seq((1L, ts("2024-01-01 09:59:00"), 5.0)).toDF("k", "t", "v")
    val got = TemporalJoins.asofJoin(left, right, "k", "k", "t", "t",
        Seq("v"), tolerance = Some(3600.0))
      .select(col("id"), col("prev_v")).as[(Long, Option[Double])]
      .collect().toMap
    assert(got(1L).contains(5.0))  // 60 s old, inside tolerance
    assert(got(2L).isEmpty)        // 13 h old, nulled
  }

  test("asofJoinForward: earliest at-or-after match, inclusive, tolerance") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 10:04:30")),
      (3L, 100L, ts("2024-01-01 11:00:00")), // after every right row
      (4L, 300L, ts("2024-01-01 12:00:00"))  // exact-time match
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1.0), // == left id 1's time
      (100L, ts("2024-01-01 10:04:00"), 2.0),
      (100L, ts("2024-01-01 10:05:00"), 3.0),
      (300L, ts("2024-01-01 12:00:00"), 9.0)
    ).toDF("k", "t", "v")
    val got = TemporalJoins.asofJoinForward(left, right, "k", "k", "t", "t",
        Seq("v")).select(col("id"), col("next_v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(1.0))  // inclusive: same-instant right row
    assert(got(2L).contains(3.0))  // earliest AFTER 10:04:30, not 2.0
    assert(got(3L).isEmpty)        // nothing at or after
    assert(got(4L).contains(9.0))
    assert(got.size == 4)
    // tolerance: the 10:05 click is 30 s ahead of id 2 — a 10 s
    // tolerance nulls it, id 1's same-instant match survives
    val tol = TemporalJoins.asofJoinForward(left, right, "k", "k", "t", "t",
        Seq("v"), tolerance = Some(10.0))
      .select(col("id"), col("next_v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(tol(1L).contains(1.0) && tol(2L).isEmpty)
  }

  test("asofJoinNearest: closer side wins, ties break backward, one-sided falls through") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")), // back 60s away, fwd 30s → fwd
      (2L, 1L, ts("2024-01-01 10:01:00")), // back 30s, fwd 90s → back
      (3L, 1L, ts("2024-01-01 10:01:30")), // tie 60s/60s → backward
      (4L, 2L, ts("2024-01-01 09:00:00")), // only a forward candidate
      (5L, 3L, ts("2024-01-01 09:00:00"))  // no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:59:00"), 1.0),
      (1L, ts("2024-01-01 10:00:30"), 2.0),
      (1L, ts("2024-01-01 10:02:30"), 3.0),
      (2L, ts("2024-01-01 09:30:00"), 8.0)
    ).toDF("k", "t", "v")
    val got = TemporalJoins.asofJoinNearest(left, right, "k", "k", "t", "t",
        Seq("v")).select(col("id"), col("near_v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(2.0))
    assert(got(2L).contains(2.0))
    assert(got(3L).contains(2.0))  // 10:00:30 and 10:02:30 both 60 s away
    assert(got(4L).contains(8.0))
    assert(got(5L).isEmpty)
    assert(got.size == 5)
  }

  test("asof joins: NULL left times and NULL keys never match") {
    val left = Seq(
      (1L, Option(100L), Option(ts("2024-01-01 10:00:00")), "a"),
      (2L, Option(100L), Option.empty[Timestamp], "b"), // null time
      (3L, Option.empty[Long], Option(ts("2024-01-01 10:00:00")), "c") // null key
    ).toDF("id", "k", "t", "tag")
    val right = Seq(
      (Option(100L), ts("2024-01-01 09:30:00"), 1.0),
      (Option(100L), ts("2024-01-01 11:00:00"), 2.0),
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 7.0) // null-key right
    ).toDF("k", "t", "v")
    val back = TemporalJoins.asofJoin(left, right, "k", "k", "t", "t", Seq("v"))
      .select(col("id"), col("prev_v")).as[(Long, Option[Double])]
      .collect().toMap
    assert(back(1L).contains(1.0))
    assert(back(2L).isEmpty, "null left time matched backward")
    assert(back(3L).isEmpty, "null key matched null key backward")
    val fwd = TemporalJoins.asofJoinForward(left, right, "k", "k", "t", "t", Seq("v"))
      .select(col("id"), col("next_v")).as[(Long, Option[Double])]
      .collect().toMap
    assert(fwd(1L).contains(2.0))
    // the forward frame is (current, unboundedFollowing): a null time
    // sorted FIRST and used to swallow the group's earliest right row
    assert(fwd(2L).isEmpty, "null left time matched forward")
    assert(fwd(3L).isEmpty, "null key matched null key forward")
  }

  test("rangeJoin refuses a mixed-class END column") {
    val pts = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val ivs = Seq((1L, ts("2024-01-01 09:00:00"), 123456789L))
      .toDF("k", "st", "en") // timestamp start, integral end
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoin(pts, ivs, "k", "k", "t", "st", "en", 60000000L)
    }
  }

  test("rangeJoin: inclusive bounds, bin-spanning intervals, multiplicity") {
    // bins of 60 s; intervals deliberately cross bin edges
    val points = Seq(
      (1L, 7L, ts("2024-01-01 10:00:30")),  // inside iv A only
      (2L, 7L, ts("2024-01-01 10:02:00")),  // == iv A end (inclusive) and inside iv B
      (3L, 7L, ts("2024-01-01 10:00:00")),  // == iv A start (inclusive)
      (4L, 7L, ts("2024-01-01 10:59:00")),  // inside nothing
      (5L, 8L, ts("2024-01-01 10:00:30"))   // right time, wrong key
    ).toDF("pid", "k", "t")
    val ivs = Seq(
      (10L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:02:00")), // A
      (20L, 7L, ts("2024-01-01 10:01:30"), ts("2024-01-01 10:03:00"))  // B
    ).toDF("ivid", "ik", "s", "e")
    // timestamp columns bin in MICROSECONDS: 60 s bins = 60e6 µs
    val got = TemporalJoins.rangeJoin(points, ivs, "k", "ik", "t", "s", "e",
        binSize = 60L * 1000000L)
      .select(col("pid"), col("ivid")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 10L)))
  }
}
