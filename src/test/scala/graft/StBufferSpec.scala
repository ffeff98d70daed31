package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** st_buffer (reference contrib/udfs/.../gis/STBuffer.java) — the
  * convex slice of Minkowski buffering, exact-by-construction. */
class StBufferSpec extends AnyFunSuite {
  import TestSpark._
  import graft.functions.GisFunctions.{stArea, stGeomFromText}

  private def buffer(wkt: String, d: Double, segs: Option[Int] = None)
      : Option[(Double, Int, Set[(Double, Double)])] = {
    import spark.implicits._
    val g = segs match {
      case Some(n) => call_function("st_buffer",
        stGeomFromText(col("a")), col("d"), lit(n))
      case None => call_function("st_buffer",
        stGeomFromText(col("a")), col("d"))
    }
    val r = Seq((wkt, d)).toDF("a", "d")
      .select(g.as("g"))
      .select(col("g"), stArea(col("g")).as("area"),
        size(col("g")("xs")).as("nv"),
        zip_with(col("g")("xs"), col("g")("ys"),
          (x, y) => struct(x.as("x"), y.as("y"))).as("pts"))
      .collect()(0)
    if (r.isNullAt(0)) None
    else Some((r.getDouble(1), r.getInt(2),
      r.getSeq[org.apache.spark.sql.Row](3)
        .map(p => (p.getDouble(0), p.getDouble(1))).toSet))
  }

  private def rect(x1: Int, y1: Int, x2: Int, y2: Int): String =
    s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))"

  // closed-form area of the N-segment disc polygon of radius d
  private def discArea(d: Double, n: Int): Double =
    n / 2.0 * d * d * math.sin(2 * math.Pi / n)

  test("POINT buffer = regular N-gon: vertex count, exact closed-form " +
      "area, envelope extremes exactly on the axes") {
    val Some((area, nv, pts)) = buffer("POINT (10 20)", 3.0)
    assert(nv == 32)
    assert(math.abs(area - discArea(3.0, 32)) < 1e-9, area)
    // angle-0 / 90 / 180 / 270 vertices are exact
    for (p <- Seq((13.0, 20.0), (10.0, 23.0), (7.0, 20.0), (10.0, 17.0)))
      assert(pts.contains(p), s"missing $p")
    assert(math.abs(pts.map(_._1).max - 13.0) < 1e-12)
    assert(math.abs(pts.map(_._2).min - 17.0) < 1e-12)
    // segments override: 8-gon
    val Some((a8, nv8, _)) = buffer("POINT (0 0)", 1.0, Some(8))
    assert(nv8 == 8 && math.abs(a8 - discArea(1.0, 8)) < 1e-12)
  }

  test("convex POLYGON positive buffer: rounded rectangle — area = " +
      "wh + 2(w+h)d + disc-gon, corner arcs land exactly on the axis " +
      "normals, vertex count = 4 corners x (N/4+1) arc points") {
    val d = 2.0
    val Some((area, nv, pts)) = buffer(rect(0, 0, 4, 3), d)
    val expect = 4.0 * 3 + 2 * (4 + 3) * d + discArea(d, 32)
    assert(math.abs(area - expect) < 1e-9, s"$area vs $expect")
    assert(nv == 4 * (32 / 4 + 1), nv)
    // arc endpoints are exact: the four envelope extremes
    for (p <- Seq((-2.0, 0.0), (0.0, -2.0), (6.0, 3.0), (4.0, 5.0)))
      assert(pts.contains(p), s"missing $p")
    assert(pts.map(_._1).min == -2.0 && pts.map(_._1).max == 6.0)
    assert(pts.map(_._2).min == -2.0 && pts.map(_._2).max == 5.0)
  }

  test("2-point LINESTRING buffer = capsule: area 2Ld + disc-gon; " +
      "degenerate zero-length segment buffers like a point") {
    val Some((area, _, _)) = buffer("LINESTRING (0 0, 5 0)", 1.5)
    assert(math.abs(area - (2 * 5 * 1.5 + discArea(1.5, 32))) < 1e-9)
    // diagonal segment: same closed form (rotation invariance)
    val Some((a2, _, _)) = buffer("LINESTRING (0 0, 3 4)", 1.0)
    assert(math.abs(a2 - (2 * 5 * 1.0 + discArea(1.0, 32))) < 1e-9)
    val Some((a3, nv3, _)) = buffer("LINESTRING (2 2, 2 2)", 1.0)
    assert(nv3 == 32 && math.abs(a3 - discArea(1.0, 32)) < 1e-9)
  }

  test("negative buffer (erosion) of a convex polygon is the exact " +
      "inset; erosion past the inradius is EMPTY (NULL); d = 0 is " +
      "identity") {
    val Some((area, nv, pts)) = buffer(rect(0, 0, 10, 6), -2.0)
    assert(nv == 4 && math.abs(area - 6 * 2) < 1e-9)
    assert(pts == Set((2.0, 2.0), (8.0, 2.0), (8.0, 4.0), (2.0, 4.0)))
    assert(buffer(rect(0, 0, 10, 6), -3.0).isEmpty)  // inradius = 3
    assert(buffer(rect(0, 0, 10, 6), -7.0).isEmpty)
    val Some((a0, nv0, _)) = buffer(rect(0, 0, 4, 4), 0.0)
    assert(nv0 == 4 && math.abs(a0 - 16.0) < 1e-12)
    // non-axis-aligned erosion: right triangle inset stays exact-area
    val Some((at, _, _)) =
      buffer("POLYGON ((0 0, 8 0, 0 6, 0 0))", -1.0)
    // inset of a triangle is a similar triangle shrunk by d/inradius:
    // r = area/s = 24/12 = 2, scale = (r-1)/r = 1/2, area = 24/4
    assert(math.abs(at - 6.0) < 1e-9, at)
  }

  test("refusals and empties: concave polygon, >2-point polyline, " +
      "non-multiple-of-4 segments, point/line with d <= 0, NULL " +
      "propagation") {
    def refuses(wkt: String, d: Double, msg: String,
                segs: Option[Int] = None): Unit = {
      val e = intercept[Exception] { buffer(wkt, d, segs) }
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    refuses("POLYGON ((0 0, 4 0, 4 4, 2 1, 0 4, 0 0))", 1.0, "concave")
    refuses("LINESTRING (0 0, 1 0, 2 5)", 1.0, "exactly 2 points")
    refuses("POINT (0 0)", 1.0, "multiple of 4", Some(10))
    assert(buffer("POINT (0 0)", 0.0).isEmpty)
    assert(buffer("POINT (0 0)", -1.0).isEmpty)
    assert(buffer("LINESTRING (0 0, 1 1)", -0.5).isEmpty)
    import spark.implicits._
    val r = Seq(("POINT (0 0)", Option.empty[Double]))
      .toDF("a", "d")
      .select(call_function("st_buffer",
        stGeomFromText(col("a")), col("d")).isNull.as("n"))
      .collect()(0)
    assert(r.getBoolean(0)) // NULL distance -> NULL (NULL_IF_NULL)
  }
}
