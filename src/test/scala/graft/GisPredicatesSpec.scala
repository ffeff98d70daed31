package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GisFunctions._

/** DE-9IM predicate pack over the planar core (GisPredicates.scala):
  * hand-built cases beyond the gate's axis-aligned family — diamonds,
  * point/line/polygon mixes, boundary contacts, containment, and the
  * ring-rotation/reversal equality rules. */
class GisPredicatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pred(name: String, aWkt: String, bWkt: String): Boolean = {
    import spark.implicits._
    Seq((aWkt, bWkt)).toDF("a", "b")
      .select(call_function(name,
        stGeomFromText(col("a")), stGeomFromText(col("b"))).as("v"))
      .collect()(0).getBoolean(0)
  }

  private val diamond = "POLYGON ((2 0, 0 2, -2 0, 0 -2, 2 0))"
  private val square = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"

  test("st_intersects / st_disjoint across type pairs") {
    assert(pred("st_intersects", "POINT (1 0)", diamond)) // interior
    assert(pred("st_intersects", "POINT (2 0)", diamond)) // vertex
    assert(!pred("st_intersects", "POINT (3 3)", diamond))
    assert(pred("st_disjoint", "POINT (3 3)", diamond))
    assert(pred("st_intersects", "LINESTRING (-3 0, 3 0)", diamond)) // through
    assert(pred("st_intersects", "LINESTRING (2 0, 4 4)", diamond)) // vertex only
    assert(!pred("st_intersects", "LINESTRING (3 0, 5 0)", diamond))
    // diamond inscribed in the square: contained, shares boundary points
    assert(pred("st_intersects", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", square))
    // fully inside, no edge contact — containment without edge crossing
    assert(pred("st_intersects", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", square))
    assert(pred("st_intersects", square,
      "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")) // other orientation
  }

  test("st_equals: rotation and reversal invariant for rings, direction for lines") {
    assert(pred("st_equals", diamond, "POLYGON ((0 2, -2 0, 0 -2, 2 0, 0 2))"))
    assert(pred("st_equals", diamond, "POLYGON ((2 0, 0 -2, -2 0, 0 2, 2 0))"))
    assert(!pred("st_equals", diamond, square))
    assert(pred("st_equals", "LINESTRING (0 0, 1 1, 2 0)",
      "LINESTRING (2 0, 1 1, 0 0)")) // reversed
    assert(!pred("st_equals", "LINESTRING (0 0, 2 0)", "LINESTRING (0 0, 3 0)"))
    assert(pred("st_equals", "POINT (1 2)", "POINT (1 2)"))
    assert(!pred("st_equals", "POINT (1 2)", "POINT (1 3)"))
    assert(!pred("st_equals", "POINT (1 2)", diamond)) // cross-type
  }

  test("st_touches: boundary contact without interior contact") {
    // point at a polygon vertex / on an edge: boundary -> touches
    assert(pred("st_touches", "POINT (2 0)", diamond))
    assert(pred("st_touches", "POINT (1 1)", diamond)) // on edge x+y=2
    assert(!pred("st_touches", "POINT (0 0)", diamond)) // interior
    // point at a line ENDPOINT touches; on the line interior it does not
    assert(pred("st_touches", "POINT (0 0)", "LINESTRING (0 0, 2 2)"))
    assert(!pred("st_touches", "POINT (1 1)", "LINESTRING (0 0, 2 2)"))
    assert(!pred("st_touches", "POINT (1 1)", "POINT (1 1)")) // empty boundaries
    // L-shaped line contact at an endpoint vs a crossing
    assert(pred("st_touches", "LINESTRING (0 0, 2 0)", "LINESTRING (2 0, 2 2)"))
    assert(!pred("st_touches", "LINESTRING (0 0, 2 0)", "LINESTRING (1 -1, 1 1)"))
    // line along a diamond edge from vertex to vertex: boundary only
    assert(pred("st_touches", "LINESTRING (2 0, 0 2)", diamond))
    // chord through the interior is not a touch
    assert(!pred("st_touches", "LINESTRING (-1 0, 1 0)", diamond))
    // two diamonds sharing one vertex
    assert(pred("st_touches", diamond, "POLYGON ((4 0, 2 2, 2 0, 4 0))"))
    // identical rings: interiors meet, never touches
    assert(!pred("st_touches", diamond,
      "POLYGON ((0 2, -2 0, 0 -2, 2 0, 0 2))"))
  }

  test("st_crosses: dim-0 interior meeting for lines, through-and-out for areas") {
    assert(pred("st_crosses", "LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)"))
    // endpoint contact is a touch, not a cross
    assert(!pred("st_crosses", "LINESTRING (0 0, 2 0)", "LINESTRING (2 0, 2 2)"))
    // collinear overlap is dim-1: overlaps, not crosses
    assert(!pred("st_crosses", "LINESTRING (0 0, 3 0)", "LINESTRING (1 0, 4 0)"))
    // line passes through the diamond and out the other side
    assert(pred("st_crosses", "LINESTRING (-3 0, 3 0)", diamond))
    assert(pred("st_crosses", diamond, "LINESTRING (-3 0, 3 0)")) // symmetric
    // chord that stays inside (enters but never exits): not a cross
    assert(!pred("st_crosses", "LINESTRING (-1 0, 1 0)", diamond))
    // along the boundary: never enters the interior
    assert(!pred("st_crosses", "LINESTRING (2 0, 0 2)", diamond))
    // points and area/area pairs never cross
    assert(!pred("st_crosses", "POINT (0 0)", diamond))
    assert(!pred("st_crosses", diamond, square))
  }

  test("st_overlaps: same-dimension partial overlap only") {
    // two diamonds offset by 2: lens-shaped overlap
    assert(pred("st_overlaps", diamond, "POLYGON ((4 0, 2 2, 0 0, 2 -2, 4 0))"))
    assert(!pred("st_overlaps", diamond, diamond)) // equal -> not overlaps
    // containment -> not overlaps (either direction)
    assert(!pred("st_overlaps", square, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"))
    assert(!pred("st_overlaps", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", square))
    // vertex-touching diamonds: boundary contact only
    assert(!pred("st_overlaps", diamond, "POLYGON ((4 0, 2 2, 2 0, 4 0))"))
    // collinear partial line overlap
    assert(pred("st_overlaps", "LINESTRING (0 0, 3 0)", "LINESTRING (1 0, 4 0)"))
    assert(!pred("st_overlaps", "LINESTRING (0 0, 3 0)", "LINESTRING (1 0, 2 0)"))
    assert(!pred("st_overlaps", "LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)"))
    // different dimensions never overlap
    assert(!pred("st_overlaps", "LINESTRING (-3 0, 3 0)", diamond))
    assert(!pred("st_overlaps", "POINT (0 0)", "POINT (0 0)"))
  }

  test("crossing AT an intermediate vertex, redundant vertices, repeated points") {
    // crossing lands exactly on a vertex of the second line: still a cross
    assert(pred("st_crosses", "LINESTRING (0 0, 2 0)",
      "LINESTRING (1 -1, 1 0, 1 1)"))
    // V-contact at an intermediate vertex: interiors meet at dim 0
    assert(pred("st_crosses", "LINESTRING (0 0, 2 0)",
      "LINESTRING (1 -1, 1 0, 0 -1)"))
    assert(!pred("st_touches", "LINESTRING (0 0, 2 0)",
      "LINESTRING (1 -1, 1 0, 1 1)"))
    // vertex-touch then run ALONG the line: dim-1 overlap, not a cross
    assert(!pred("st_crosses", "LINESTRING (0 0, 2 0)",
      "LINESTRING (1 -1, 1 0, 2 0)"))
    // point-set equality survives redundant collinear vertices
    assert(pred("st_equals", "LINESTRING (0 0, 2 0)",
      "LINESTRING (0 0, 1 0, 2 0)"))
    assert(pred("st_equals", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((0 0, 2 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(!pred("st_equals", "LINESTRING (0 0, 2 0)",
      "LINESTRING (0 0, 1 1, 2 0)")) // non-collinear midpoint differs
    // a repeated vertex (zero-length segment) must not fabricate contact
    assert(!pred("st_intersects", "LINESTRING (0 0, 0 1, 0 1)",
      "LINESTRING (0 5, 0 9)"))
    assert(pred("st_disjoint", "LINESTRING (0 0, 0 1, 0 1)",
      "LINESTRING (0 5, 0 9)"))
  }

  private def relateOf(aWkt: String, bWkt: String): String = {
    import spark.implicits._
    Seq((aWkt, bWkt)).toDF("a", "b")
      .select(call_function("st_relate",
        stGeomFromText(col("a")), stGeomFromText(col("b"))).as("m"))
      .collect()(0).getString(0)
  }

  private def relatePat(aWkt: String, bWkt: String, p: String): Boolean = {
    import spark.implicits._
    Seq((aWkt, bWkt)).toDF("a", "b")
      .select(call_function("st_relate",
        stGeomFromText(col("a")), stGeomFromText(col("b")), lit(p)).as("m"))
      .collect()(0).getBoolean(0)
  }

  test("st_relate: textbook DE-9IM matrices") {
    // equal polygons
    assert(relateOf(diamond, diamond) == "2FFF1FFF2")
    // A strictly inside B: the WITHIN matrix
    assert(relateOf("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", square)
      == "2FF1FF212")
    // edge-touching squares: the textbook FF2F11212
    assert(relateOf("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))") == "FF2F11212")
    // line crossing a polygon: in, across the boundary twice, out
    assert(relateOf("LINESTRING (-3 0, 3 0)", diamond) == "101FF0212")
    // disjoint polygons
    assert(relateOf(diamond, "POLYGON ((10 0, 12 0, 12 2, 10 2, 10 0))")
      == "FF2FF1212")
    // crossing lines: dim-0 interior meet
    assert(relateOf("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)")
      == "0F1FF0102")
    // point in polygon interior (exterior row carries the polygon)
    assert(relateOf("POINT (0 0)", diamond) == "0FFFFF212")
    // point on polygon boundary
    assert(relateOf("POINT (2 0)", diamond) == "F0FFFF212")
  }

  test("st_relate pattern identities agree with the direct predicates") {
    // the published DE-9IM pattern definitions of the named predicates,
    // evaluated over every ordered fixture pair — the matrix and the
    // predicate implementations cannot drift apart without failing this
    val fixtures = Seq(
      "POINT (0 0)", "POINT (2 0)", "POINT (9 9)",
      "LINESTRING (-3 0, 3 0)", "LINESTRING (2 0, 0 2)",
      "LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)",
      "LINESTRING (0 0, 3 0)", "LINESTRING (1 0, 4 0)",
      diamond, square,
      "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
      "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))",
      "POLYGON ((4 0, 2 2, 0 0, 2 -2, 4 0))",
      "POLYGON ((10 0, 12 0, 12 2, 10 2, 10 0))")
    for (a <- fixtures; b <- fixtures) {
      val ctx = s"a=$a b=$b"
      assert(pred("st_intersects", a, b) == !relatePat(a, b, "FF*FF****"), ctx)
      assert(pred("st_disjoint", a, b) == relatePat(a, b, "FF*FF****"), ctx)
      assert(pred("st_equals", a, b) == relatePat(a, b, "T*F**FFF*"), ctx)
      val touchPat = relatePat(a, b, "FT*******") ||
        relatePat(a, b, "F**T*****") || relatePat(a, b, "F***T****")
      assert(pred("st_touches", a, b) == touchPat, s"touches $ctx")
    }
  }

  test("predicates refuse wrong-typed lookalike structs") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1).toDF("x").select(call_function("st_intersects",
        expr("named_struct('gtype', 'POINT', 'xs', array(1), 'ys', array(2))"),
        expr("named_struct('gtype', 'POINT', 'xs', array(1), 'ys', array(2))")))
        .collect()
    }
    assert(e.getMessage.contains("array<double>") ||
      e.getMessage.contains("geometry structs"))
  }

  test("predicates refuse non-geometry inputs") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1).toDF("x")
        .select(call_function("st_crosses", col("x"), col("x"))).collect()
    }
    assert(e.getMessage.contains("geometry structs") ||
      e.getMessage.contains("st_crosses"))
  }

  test("st_geomfromtext(wkt, srid): srid carried, predicates compose") {
    import spark.implicits._
    val df = Seq(("POINT (1 0)", diamond)).toDF("a", "b")
    val r = df.select(
        stSrid(stGeomFromTextSrid(col("a"), lit(3857))).as("srid"),
        // mixed srid / no-srid args: the predicate reads gtype/xs/ys
        call_function("st_intersects",
          stGeomFromTextSrid(col("a"), lit(4326)),
          stGeomFromText(col("b"))).as("hit"),
        call_function("st_relate",
          stGeomFromTextSrid(col("a"), lit(4326)),
          stGeomFromTextSrid(col("b"), lit(4326))).as("m"))
      .collect()(0)
    assert(r.getInt(0) == 3857)
    assert(r.getBoolean(1))
    assert(r.getString(2).length == 9)
  }

  test("st_asjson renders Esri JSON (point/paths/rings, wkid)") {
    import spark.implicits._
    val df = Seq((
      "POINT (1.5 -2.5)", "LINESTRING (0 0, 1 1)",
      "POLYGON ((0 0, 2 0, 2 2, 0 0))")).toDF("p", "l", "g")
    val r = df.select(
        stAsJson(stGeomFromText(col("p"))).as("pj"),
        stAsJson(stGeomFromText(col("l"))).as("lj"),
        stAsJson(stGeomFromTextSrid(col("g"), lit(3857)),
          stSrid(stGeomFromTextSrid(col("g"), lit(3857)))).as("gj"))
      .collect()(0)
    assert(r.getString(0) ==
      """{"x":1.5,"y":-2.5,"spatialReference":{"wkid":4326}}""")
    assert(r.getString(1) ==
      """{"paths":[[[0.0,0.0],[1.0,1.0]]],"spatialReference":{"wkid":4326}}""")
    assert(r.getString(2) ==
      """{"rings":[[[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,0.0]]],"spatialReference":{"wkid":3857}}""")
  }

  test("open polygon rings render CLOSED in GeoJSON and Esri JSON") {
    import spark.implicits._
    val open = "POLYGON ((0 0, 2 0, 2 2))" // no closing vertex
    val r = Seq(open).toDF("w").select(
        stAsGeoJSON(stGeomFromText(col("w"))).as("gj"),
        stAsJson(stGeomFromText(col("w"))).as("ej"))
      .collect()(0)
    assert(r.getString(0) ==
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,0.0]]]}""")
    assert(r.getString(1) ==
      """{"rings":[[[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,0.0]]],"spatialReference":{"wkid":4326}}""")
  }

  test("st_transform stays a documented refusal OUTSIDE the closed-form " +
      "pairs (4326<->3857, 4326<->UTM)") {
    val e = intercept[UnsupportedOperationException] {
      stTransform(lit(1), 4326, 27700) // OSGB needs a datum shift
    }
    assert(e.getMessage.contains("projection"))
  }

  // ---- constructive geometry, CONVEX slice (ConvexClip.scala) ------

  /** Run one clip; None = SQL NULL (empty geometry), Some((area,
    * vertex count, vertex set)) otherwise. */
  private def clip(name: String, aWkt: String, bWkt: String)
      : Option[(Double, Int, Set[(Double, Double)])] = {
    import spark.implicits._
    val r = Seq((aWkt, bWkt)).toDF("a", "b")
      .select(call_function(name,
        stGeomFromText(col("a")), stGeomFromText(col("b"))).as("g"))
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

  private def clipRefuses(name: String, aWkt: String, bWkt: String,
                          msgPart: String): Unit = {
    val e = intercept[Exception] { clip(name, aWkt, bWkt) }
    assert(e.getMessage.contains(msgPart), s"$name: ${e.getMessage}")
  }

  private def rect(x1: Int, y1: Int, x2: Int, y2: Int): String =
    s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))"

  test("clip: proper rect overlap — bite shape, exact rings and areas") {
    val a = rect(0, 0, 4, 4)          // area 16
    val b = rect(2, 1, 6, 3)          // area 8; bites A's right edge
    val Some((ia, _, _)) = clip("st_intersection", a, b)
    assert(math.abs(ia - 4.0) < 1e-9) // [2,4]x[1,3]
    val Some((ua, unv, upts)) = clip("st_union", a, b)
    assert(math.abs(ua - 20.0) < 1e-9 && unv == 8)
    assert(upts == Set((0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (6.0, 1.0),
      (6.0, 3.0), (4.0, 3.0), (4.0, 4.0), (0.0, 4.0)))
    val Some((da, dnv, dpts)) = clip("st_difference", a, b)
    assert(math.abs(da - 12.0) < 1e-9 && dnv == 8)
    assert(dpts == Set((0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (2.0, 1.0),
      (2.0, 3.0), (4.0, 3.0), (4.0, 4.0), (0.0, 4.0)))
    // B \ A: the part of B sticking out of A — [4,6]x[1,3]
    val Some((ra, _, rpts)) = clip("st_difference", b, a)
    assert(math.abs(ra - 4.0) < 1e-9)
    assert(rpts == Set((4.0, 1.0), (6.0, 1.0), (6.0, 3.0), (4.0, 3.0)))
  }

  test("clip: oblique pair — diamond over square, 8 crossings") {
    val sq = rect(0, 0, 4, 4)                               // area 16
    val dia = "POLYGON ((5 2, 2 5, -1 2, 2 -1, 5 2))"       // area 18
    val Some((ia, _, _)) = clip("st_intersection", sq, dia)
    assert(math.abs(ia - 14.0) < 1e-9) // square minus 4 half-unit corners
    val Some((ua, unv, _)) = clip("st_union", sq, dia)
    assert(math.abs(ua - 20.0) < 1e-9 && unv == 16)
    assert(math.abs(clip("st_union", dia, sq).get._1 - 20.0) < 1e-9)
    // each difference is FOUR disjoint corner spikes -> loud refusal
    clipRefuses("st_difference", sq, dia, "MULTIPOLYGON")
    clipRefuses("st_difference", dia, sq, "MULTIPOLYGON")
  }

  test("clip: degenerate touch — edge and corner contact") {
    val a = rect(0, 0, 4, 4)
    val edgeB = rect(4, 0, 8, 4)   // shares the full edge x=4
    val cornerB = rect(4, 4, 6, 6) // touches at one corner
    assert(clip("st_intersection", a, edgeB).isEmpty)   // zero area -> empty
    assert(clip("st_intersection", a, cornerB).isEmpty)
    clipRefuses("st_union", a, edgeB, "touch-only")
    clipRefuses("st_union", a, cornerB, "touch-only")
    // difference with touch-only B: A unchanged
    assert(math.abs(clip("st_difference", a, edgeB).get._1 - 16.0) < 1e-9)
    assert(math.abs(clip("st_difference", a, cornerB).get._1 - 16.0) < 1e-9)
  }

  test("clip: empty intersection (disjoint) and containment") {
    val a = rect(0, 0, 4, 4)
    val far = rect(10, 10, 12, 12)
    val small = rect(1, 1, 3, 3)
    assert(clip("st_intersection", a, far).isEmpty)
    clipRefuses("st_union", a, far, "disjoint")
    assert(math.abs(clip("st_difference", a, far).get._1 - 16.0) < 1e-9)
    // small inside a: intersection = small, union = a, small \ a = empty
    assert(math.abs(clip("st_intersection", a, small).get._1 - 4.0) < 1e-9)
    assert(math.abs(clip("st_union", a, small).get._1 - 16.0) < 1e-9)
    assert(math.abs(clip("st_union", small, a).get._1 - 16.0) < 1e-9)
    assert(clip("st_difference", small, a).isEmpty)
    // a \ small would have a HOLE -> loud refusal
    clipRefuses("st_difference", a, small, "HOLE")
    // identical polygons: intersection/union = self, difference = empty
    assert(math.abs(clip("st_union", a, a).get._1 - 16.0) < 1e-9)
    assert(clip("st_difference", a, a).isEmpty)
  }

  test("clip: NULL operand is EMPTY geometry — identity, not propagation") {
    import spark.implicits._
    // ∅ arrives at runtime from a disjoint inner intersection; the
    // outer ops must apply the identities (union(a,∅)=a, a\∅=a, ∅\b=∅,
    // a∩∅=∅), NOT default null-propagation (which would lose a)
    val a = rect(0, 0, 4, 4)
    val far = rect(10, 10, 12, 12)
    val r = Seq((a, far)).toDF("a", "b")
      .select(stGeomFromText(col("a")).as("ga"),
        call_function("st_intersection",
          stGeomFromText(col("a")), stGeomFromText(col("b"))).as("empty"))
      .select(
        stArea(call_function("st_union", col("ga"), col("empty"))).as("u"),
        stArea(call_function("st_union", col("empty"), col("ga"))).as("u2"),
        stArea(call_function("st_difference", col("ga"), col("empty"))).as("d"),
        call_function("st_difference", col("empty"), col("ga")).isNull.as("dn"),
        call_function("st_intersection", col("ga"), col("empty")).isNull.as("in_"))
      .collect()(0)
    assert(r.getDouble(0) == 16.0 && r.getDouble(1) == 16.0 &&
      r.getDouble(2) == 16.0 && r.getBoolean(3) && r.getBoolean(4))
  }

  test("clip: small features far from the origin (UTM-scale coordinates)") {
    // quadratic tolerance: sub-meter features at ~1e7 offsets must still
    // classify exactly (a linear eps would absorb every cross product)
    val x0 = 10000000; val y0 = 5000000
    def r(dx1: Int, dy1: Int, dx2: Int, dy2: Int): String =
      rect(x0 + dx1, y0 + dy1, x0 + dx2, y0 + dy2)
    val a = r(0, 0, 4, 4)
    val b = r(2, 1, 6, 3)
    val far = r(100, 100, 104, 104)
    assert(clip("st_intersection", a, far).isEmpty)
    assert(math.abs(clip("st_intersection", a, b).get._1 - 4.0) < 1e-6)
    assert(math.abs(clip("st_union", a, b).get._1 - 20.0) < 1e-6)
    assert(math.abs(clip("st_difference", a, b).get._1 - 12.0) < 1e-6)
  }

  test("clip: split difference and concave inputs refuse") {
    val a = rect(0, 0, 4, 4)
    val band = rect(-1, 1, 5, 3) // spans A horizontally
    clipRefuses("st_difference", a, band, "MULTIPOLYGON")
    // union through the band IS single-ring (a plus shape) — walk works
    val Some((ua, unv, _)) = clip("st_union", a, band)
    assert(math.abs(ua - (16.0 + 12.0 - 8.0)) < 1e-9 && unv == 12)
    val concave = "POLYGON ((0 0, 4 0, 4 4, 2 1, 0 4, 0 0))"
    // st_intersection now ACCEPTS one concave simple side (round 16):
    // the arrow lies inside the window, so the clip returns it whole
    val Some((arrowArea, _, _)) = clip("st_intersection", concave, a)
    assert(math.abs(arrowArea - 10.0) < 1e-9, arrowArea.toString)
    // st_union now accepts concave sides for OVERLAPPING pairs (round
    // 20) — but this arrow shares the window's corners, a boundary
    // contact the fragment walk refuses up front
    clipRefuses("st_union", a, concave, "share a vertex")
    // difference stays convex-only
    clipRefuses("st_difference", a, concave, "concave")
    // vertex-grazing contact on the walk path refuses rather than
    // constructing a possibly-wrong ring (diamond vertex ON square edge)
    clipRefuses("st_union", rect(0, 0, 4, 4),
      "POLYGON ((2 0, 0 2, -2 0, 0 -2, 2 0))", "tangential")
    // non-polygon inputs refuse
    clipRefuses("st_intersection", "POINT (1 1)", rect(0, 0, 2, 2), "POLYGON")
  }

  // ---- hardening-review regressions ---------------------------------

  test("closed LINESTRING has EMPTY boundary (OGC Mod-2 rule)") {
    val closed = "LINESTRING (0 0, 1 0, 1 1, 0 0)"
    // the closure point is INTERIOR: point contact there is not touches
    assert(pred("st_intersects", "POINT (0 0)", closed))
    assert(!pred("st_touches", "POINT (0 0)", closed))
    // and a line through it meets the closed line's INTERIOR at dim 0
    assert(pred("st_crosses", "LINESTRING (-0.5 0.5, 0.5 -0.5)", closed))
    // open line: endpoints stay boundary
    assert(pred("st_touches", "POINT (0 0)", "LINESTRING (0 0, 1 0, 1 1)"))
  }

  test("doubly-closed polygon ring registers no phantom contact") {
    val dbl = "POLYGON ((0 0, 1 0, 1 1, 0 0, 0 0))"
    assert(!pred("st_intersects", dbl, "LINESTRING (0 5, 0 7)"),
      "zero-length wrap edge must not contact a distant segment")
    assert(pred("st_disjoint", dbl, "LINESTRING (0 5, 0 7)"))
    assert(pred("st_intersects", dbl, "POINT (0.7 0.2)"))
  }

  test("st_astext closes polygon rings (valid WKT out)") {
    import spark.implicits._
    val out = Seq(("POLYGON ((0 0, 1 0, 1 1))",
        "POLYGON ((0 0, 1 0, 1 1, 0 0))", "LINESTRING (0 0, 1 0)"))
      .toDF("open", "closed", "line")
      .select(stAsText(stGeomFromText(col("open"))).as("o"),
        stAsText(stGeomFromText(col("closed"))).as("c"),
        stAsText(stGeomFromText(col("line"))).as("l"))
      .collect()(0)
    assert(out.getString(0) == "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0))")
    assert(out.getString(1) == "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0))")
    assert(out.getString(2) == "LINESTRING (0.0 0.0, 1.0 0.0)")
  }

  test("st_geomfromtext refuses Z/M forms and malformed coordinates") {
    import spark.implicits._
    def bad(w: String, part: String): Unit = {
      val e = intercept[Exception] {
        Seq(w).toDF("w").select(stGeomFromText(col("w")).as("g"))
          .select(col("g")("xs")).collect()
      }
      assert(e.getMessage.contains(part), s"$w: ${e.getMessage}")
    }
    bad("POINT Z (1 2 3)", "st_geomfromtext")
    bad("POINT ZM (1 2 3 4)", "st_geomfromtext")
    bad("POINT (foo bar)", "malformed")
    bad("POINT (5)", "malformed")
    bad("LINESTRING (1 2, 3)", "malformed")
  }

  test("st_distance_km near-antipodal stays finite (no NaN past asin)") {
    import spark.implicits._
    val d = Seq((0.0, 10.0, 180.0, -10.0)).toDF("alon", "alat", "blon", "blat")
      .select(stDistanceKm(col("alon"), col("alat"),
        col("blon"), col("blat")).as("d"))
      .collect()(0).getDouble(0)
    assert(!d.isNaN, "antipodal distance came back NaN")
    assert(d > 19900 && d < 20100, s"got $d")
  }

  test("clip refuses zero-area (collinear) rings; concave error names the reflex vertex") {
    clipRefuses("st_intersection", "POLYGON ((0 0, 2 0, 1 0))",
      rect(-1, -1, 3, 3), "zero area")
    clipRefuses("st_union", rect(-1, -1, 3, 3),
      "POLYGON ((0 0, 2 0, 1 0))", "zero area")
    // concave at vertex 2 of (0 0, 4 0, 2 1, 4 4, 0 4) — the message
    // must name the reflex corner, not one past it (difference path;
    // intersection clips concave sides and union fragment-walks them)
    val e = intercept[Exception] {
      clip("st_difference", rect(0, 0, 4, 4),
        "POLYGON ((0 0, 4 0, 2 1, 4 4, 0 4))")
    }
    assert(e.getMessage.contains("concave at vertex 2"), e.getMessage)
  }

  test("CONCAVE union (edge-fragment walk): overlapping L-shape and " +
      "rectangle merge into one ring; containment, commutation, and " +
      "the refusal bounds (hole, touch-only, vertex crossing, " +
      "collinear span)") {
    // L-shape: bottom arm 8x2 + vertical arm 2(wide)x4(tall above arm)
    // area = 16 + 2*4 = 24, concave at (2, 2)
    val ell = "POLYGON ((0 0, 8 0, 8 2, 2 2, 2 6, 0 6, 0 0))"
    // rectangle overlapping the vertical arm, protruding right:
    // x in [1, 9], y in [3, 4]; overlap with the arm = 1x1
    val r = "POLYGON ((1 3, 9 3, 9 4, 1 4, 1 3))"
    // union area = 24 + 8 - 1 = 31; envelope x [0,9], y [0,6]
    val Some((area, nv, pts)) = clip("st_union", ell, r)
    assert(math.abs(area - 31.0) < 1e-9, area.toString)
    assert(nv === 10, pts.toString) // the notch survives as vertices
    val Some((area2, _, _)) = clip("st_union", r, ell)
    assert(math.abs(area2 - 31.0) < 1e-9) // commutes
    // concave-side containment: a small box inside the L's bottom arm
    val inner = "POLYGON ((3 0.5, 5 0.5, 5 1.5, 3 1.5, 3 0.5))"
    assert(math.abs(clip("st_union", ell, inner).get._1 - 24.0) < 1e-9)
    assert(math.abs(clip("st_union", inner, ell).get._1 - 24.0) < 1e-9)
    // a C-shape closed off by a rectangle spanning the mouth encloses
    // a HOLE — must refuse, never drop the hole
    val c = "POLYGON ((0 0, 6 0, 6 1, 1 1, 1 5, 6 5, 6 6, 0 6, 0 0))"
    clipRefuses("st_union", c, "POLYGON ((5 -0.5, 7 -0.5, 7 6.5, 5 6.5, 5 -0.5))",
      "HOLE")
    // disjoint concave pair routes to the multi refusal
    clipRefuses("st_union", ell, rect(20, 20, 22, 22), "st_union_multi")
    // touch-only: a rectangle sharing the L's right edge refuses at
    // the shared corners; shifted off the corners, its corners sit ON
    // the L's edge and the vertex-tangency check catches the same
    // boundary-merging contact (the collinear-span branch is
    // defense-in-depth behind these two)
    clipRefuses("st_union", ell, rect(8, 0, 10, 2), "share a vertex")
    clipRefuses("st_union", ell,
      "POLYGON ((8 0.5, 10 0.5, 10 1.5, 8 1.5, 8 0.5))", "vertex")
    // crossing AT a vertex: diamond apex exactly on the L's top arm
    // boundary point (2, 6) — tangential contact refuses; the diamond
    // is convex but the L routes the pair to the fragment walk
    clipRefuses("st_union", ell,
      "POLYGON ((2 4, 4 6, 2 8, 0 6, 2 4))", "vertex")
    // BOTH sides concave (the fragment walk never needed a convex
    // window, unlike the intersection path): the L union a staircase
    // overlapping its bottom arm. Staircase (3,-1)(7,-1)(7,3)(5,3)
    // (5,1)(3,1), concave at (5,1) = lower slab x[3,7]y[-1,1] (8) +
    // upper slab x[5,7]y[1,3] (4) = 12; overlap with the L =
    // x[3,7]y[0,1] (4) + x[5,7]y[1,2] (2) = 6; all four crossings
    // proper -> union area 24 + 12 - 6 = 30
    val stair = "POLYGON ((3 -1, 7 -1, 7 3, 5 3, 5 1, 3 1, 3 -1))"
    val Some((bcArea, _, _)) = clip("st_union", ell, stair)
    assert(math.abs(bcArea - 30.0) < 1e-9, bcArea.toString)
    assert(math.abs(clip("st_union", stair, ell).get._1 - 30.0) < 1e-9)
  }

  test("CONCAVE intersection: ear-clip + per-triangle clip + stitch — " +
      "partial windows, commutation, empty, and the refusal bounds") {
    // L-shape: outer [0,6]x[0,6] minus notch [3,3]-[6,6] => area 27
    val ell = "POLYGON ((0 0, 6 0, 6 3, 3 3, 3 6, 0 6, 0 0))"
    // window over the reflex corner: inter = [1,5]x[1,5]∩L
    //   outer∩W = 16, notch∩W = [3,5]x[3,5] = 4 → 12
    val Some((a1, _, _)) = clip("st_intersection", ell, rect(1, 1, 5, 5))
    assert(math.abs(a1 - 12.0) < 1e-9, a1.toString)
    // commutes: concave side on the right
    val Some((a2, _, _)) = clip("st_intersection", rect(1, 1, 5, 5), ell)
    assert(math.abs(a2 - 12.0) < 1e-9, a2.toString)
    // window containing the whole L returns the L's area
    val Some((a3, _, _)) = clip("st_intersection", ell, rect(-1, -1, 7, 7))
    assert(math.abs(a3 - 27.0) < 1e-9, a3.toString)
    // window inside one arm: plain rectangle out
    val Some((a4, _, _)) = clip("st_intersection", ell, rect(1, 4, 2, 5))
    assert(math.abs(a4 - 1.0) < 1e-9, a4.toString)
    // disjoint window: empty
    assert(clip("st_intersection", ell, rect(10, 10, 12, 12)).isEmpty)
    // both-concave is SUPPORTED since round 21 (simpleIntersection) —
    // but THIS pair shares vertex (0,0), a degenerate boundary contact
    // the edge-fragment walk refuses; self-intersecting refuses
    val u = "POLYGON ((0 0, 6 0, 6 4, 4 4, 4 1, 2 1, 2 4, 0 4, 0 0))"
    clipRefuses("st_intersection", ell, u, "share a vertex")
    // the same U translated off the shared vertex intersects cleanly —
    // exact rectangle arithmetic: U = prongs [0.5,2.5]/[4.5,6.5] x
    // [0.25,4.25] + base [2.5,4.5]x[0.25,1.25]; vs L ([0,6]x[0,3] +
    // [0,3]x[3,6]): 2*2.75 + 2*1.25 + 1.5*2.75 + 2*1 = 14.125
    val u2 = "POLYGON ((0.5 0.25, 6.5 0.25, 6.5 4.25, 4.5 4.25, " +
      "4.5 1.25, 2.5 1.25, 2.5 4.25, 0.5 4.25, 0.5 0.25))"
    val got = clip("st_intersection", ell, u2)
    assert(got.isDefined && math.abs(got.get._1 - 14.125) < 1e-9,
      s"translated both-concave pair: $got")
    clipRefuses("st_intersection", "POLYGON ((0 0, 4 1, 4 0, 0 3))",
      rect(0, 0, 9, 9), "self-intersecting")
  }

  test("MULTI-piece concave intersection: a U-shape clipped by a band " +
      "returns an honest MULTIPOLYGON — st_area sums parts, envelope " +
      "and st_numgeometries consume it, the three renderers emit real " +
      "multi text, predicates and clip inputs refuse it loudly") {
    import spark.implicits._
    // U above y=2 is two 2x2 prongs: [0,2]x[2,4] and [4,6]x[2,4]
    val u = "POLYGON ((0 0, 6 0, 6 4, 4 4, 4 1, 2 1, 2 4, 0 4, 0 0))"
    val df = Seq((u, rect(-1, 2, 7, 5))).toDF("a", "b")
      .select(call_function("st_intersection",
        stGeomFromText(col("a")), stGeomFromText(col("b"))).as("g"))
    val r = df.select(col("g")("gtype"), stArea(col("g")),
      stNumGeometries(col("g")), stXMin(col("g")), stXMax(col("g")),
      stYMin(col("g")), stYMax(col("g"))).collect()(0)
    assert(r.getString(0) === "MULTIPOLYGON")
    assert(math.abs(r.getDouble(1) - 8.0) < 1e-9, r.getDouble(1).toString)
    assert(r.getInt(2) === 2)
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 6.0)
    assert(r.getDouble(5) === 2.0 && r.getDouble(6) === 4.0)
    // three-prong comb: an E-shape clipped by the same band
    val comb = "POLYGON ((0 0, 10 0, 10 4, 8 4, 8 1, 6 1, 6 4, 4 4, " +
      "4 1, 2 1, 2 4, 0 4, 0 0))"
    val r3 = Seq((comb, rect(-1, 2, 11, 5))).toDF("a", "b")
      .select(call_function("st_intersection",
        stGeomFromText(col("a")), stGeomFromText(col("b"))).as("g"))
      .select(stArea(col("g")), stNumGeometries(col("g"))).collect()(0)
    assert(math.abs(r3.getDouble(0) - 12.0) < 1e-9)
    assert(r3.getInt(1) === 3)
    // renderers emit real MULTIPOLYGON text: WKT with closed rings,
    // RFC 7946 MultiPolygon, Esri multi-ring polygon
    val Seq(wkt, gj, ej) = df.select(stAsText(col("g")),
      stAsGeoJSON(col("g")), stAsJson(col("g"))).collect()(0)
      .toSeq.map(_.asInstanceOf[String])
    assert(wkt.startsWith("MULTIPOLYGON (((") && wkt.endsWith(")))"), wkt)
    assert("\\)\\), \\(\\(".r.findAllIn(wkt).size === 1, wkt) // 2 rings
    val verts = "[-0-9.]+ [-0-9.]+".r.findAllIn(
      wkt.replace("MULTIPOLYGON", "")).toSeq
    assert(verts.size === 10, wkt) // two closed rectangles, 5 each
    assert(verts.toSet === Set("0.0 2.0", "2.0 2.0", "2.0 4.0",
      "0.0 4.0", "4.0 2.0", "6.0 2.0", "6.0 4.0", "4.0 4.0"), wkt)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val gjn = om.readTree(gj)
    assert(gjn.get("type").asText === "MultiPolygon", gj)
    assert(gjn.get("coordinates").size === 2, gj)
    (0 until 2).foreach { i =>
      val poly = gjn.get("coordinates").get(i)
      assert(poly.size === 1, gj)     // one ring per part
      assert(poly.get(0).size === 5, gj) // closed rectangle
      assert(poly.get(0).get(0) === poly.get(0).get(4), gj) // closure
    }
    val ejn = om.readTree(ej)
    assert(ejn.get("rings").size === 2, ej)
    assert(ejn.get("spatialReference").get("wkid").asInt === 4326, ej)
    // predicates refuse rather than treating sentinels as vertices
    val e2 = intercept[Exception] {
      df.select(call_function("st_intersects", col("g"),
        stGeomFromText(lit(rect(0, 0, 9, 9))))).collect()
    }
    assert(TestSpark.causeChain(e2).contains("decomposed"),
      TestSpark.causeChain(e2))
    // and clip ops refuse MULTIPOLYGON inputs (composability bound)
    val e3 = intercept[Exception] {
      df.select(call_function("st_intersection", col("g"),
        stGeomFromText(lit(rect(0, 0, 9, 9))))).collect()
    }
    assert(TestSpark.causeChain(e3).contains("MULTIPOLYGON"),
      TestSpark.causeChain(e3))
  }

  test("st_union_multi disjointness verifies by SWEEP: 20,000 spread " +
      "parts aggregate (the old pairwise bound refused at 4,096) and " +
      "a touching pair still refuses through the sweep") {
    import spark.implicits._
    def rectWkt(x: Long): String = {
      val x1 = x * 3
      s"POLYGON (($x1 0, ${x1 + 2} 0, ${x1 + 2} 1, $x1 1, $x1 0))"
    }
    val many = spark.range(20000)
      .select(stGeomFromText(expr(
        """concat('POLYGON ((', id*3, ' 0, ', id*3+2, ' 0, ',
           id*3+2, ' 1, ', id*3, ' 1, ', id*3, ' 0))')""")).as("g"))
    val u = many.agg(call_function("st_union_multi",
      collect_list(col("g"))).as("u"))
      .select(stNumGeometries(col("u")), round(stArea(col("u")), 6))
      .collect()(0)
    assert(u.getInt(0) === 20000)
    assert(math.abs(u.getDouble(1) - 40000.0) < 1e-6)
    // the sweep still finds a touching pair buried mid-set
    val touch = Seq(rectWkt(0), rectWkt(1),
      "POLYGON ((5 1, 7 1, 7 2, 5 2, 5 1))", // shares edge y=1 with rect(1)
      rectWkt(3)).toDF("w").select(stGeomFromText(col("w")).as("g"))
    val e = intercept[Exception] {
      touch.agg(call_function("st_union_multi",
        collect_list(col("g")))).collect()
    }
    assert(TestSpark.causeChain(e).contains("touch or overlap"),
      TestSpark.causeChain(e))
  }

  test("CONCAVE union fuzz: 300 seeded L-shape x rectangle pairs — " +
      "every SUCCESS matches the inclusion-exclusion area exactly, " +
      "every refusal is one of the documented honesty bounds") {
    val rnd = new scala.util.Random(1414)
    var successes = 0
    val allowed = Seq("share a vertex", "tangential", "collinear",
      "disjoint or touch-only", "HOLE", "degenerate", "grazes")
    (1 to 300).foreach { trial =>
      val W = 4 + rnd.nextInt(6); val H = 4 + rnd.nextInt(6)
      val a = 1 + rnd.nextInt(W - 1); val h = 1 + rnd.nextInt(H - 1)
      // L = R1 [0,W]x[0,h] + R2 [0,a]x[h,H]
      val ell = s"POLYGON ((0 0, $W 0, $W $h, $a $h, $a $H, 0 $H, 0 0))"
      val x1 = -3 + rnd.nextInt(12); val x2 = x1 + 1 + rnd.nextInt(8)
      val y1 = -3 + rnd.nextInt(12); val y2 = y1 + 1 + rnd.nextInt(8)
      val r = s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))"
      def inter(ax1: Int, ay1: Int, ax2: Int, ay2: Int): Int =
        math.max(0, math.min(ax2, x2) - math.max(ax1, x1)) *
          math.max(0, math.min(ay2, y2) - math.max(ay1, y1))
      val expected = (W * h + a * (H - h)) + (x2 - x1) * (y2 - y1) -
        (inter(0, 0, W, h) + inter(0, h, a, H))
      try {
        val got = clip("st_union", ell, r)
        assert(got.isDefined, s"trial $trial: union returned empty")
        assert(math.abs(got.get._1 - expected) < 1e-9,
          s"trial $trial: ell=$ell r=$r got ${got.get._1} expected $expected")
        // and it commutes
        assert(math.abs(clip("st_union", r, ell).get._1 - expected) < 1e-9,
          s"trial $trial commute")
        successes += 1
      } catch {
        case e: Exception =>
          val chain = TestSpark.causeChain(e)
          assert(allowed.exists(chain.contains),
            s"trial $trial: undocumented refusal for ell=$ell r=$r: $chain")
      }
    }
    // the family must actually exercise the success path, not refuse
    // everything (documented-refusal-only would be vacuous)
    assert(successes >= 60, s"only $successes/300 trials succeeded")
  }

  test("BOTH-CONCAVE intersection fuzz: 300 seeded L x L pairs — every " +
      "SUCCESS matches the exact unit-cell count (integer-rectilinear, " +
      "so cell counting IS the area), empties only when the true area " +
      "is 0, every refusal is a documented honesty bound") {
    val rnd = new scala.util.Random(2718)
    var successes = 0
    var successesOff = 0
    val allowed = Seq("share a vertex", "tangential", "collinear",
      "degenerate", "grazes", "touch-only")
    (1 to 300).foreach { trial =>
      // L1 = [0,W]x[0,h] + [0,a]x[h,H], reflex at (a,h) — concave
      val W = 4 + rnd.nextInt(6); val H = 4 + rnd.nextInt(6)
      val a = 1 + rnd.nextInt(W - 1); val h = 1 + rnd.nextInt(H - 1)
      // L2 = translated L in one of FOUR chiralities (arm upper-left /
      // upper-right / lower-left / lower-right) — mixed orientations
      // are what interlock into DISCONNECTED intersections
      val x1 = -3 + rnd.nextInt(10); val y1 = -3 + rnd.nextInt(10)
      val W2 = 3 + rnd.nextInt(6); val H2 = 3 + rnd.nextInt(6)
      val a2 = 1 + rnd.nextInt(W2 - 1); val h2 = 1 + rnd.nextInt(H2 - 1)
      val cfg = rnd.nextInt(4)
      // two rectangles per config: full-width slab + partial-width arm
      val (s1, s2) = cfg match {
        case 0 => ((0, 0, W2, h2), (0, h2, a2, H2))           // arm UL
        case 1 => ((0, 0, W2, h2), (W2 - a2, h2, W2, H2))     // arm UR
        case 2 => ((0, H2 - h2, W2, H2), (0, 0, a2, H2 - h2)) // arm LL
        case _ => ((0, H2 - h2, W2, H2), (W2 - a2, 0, W2, H2 - h2)) // LR
      }
      def vtx(cfg: Int): Seq[(Int, Int)] = cfg match {
        case 0 => Seq((0, 0), (W2, 0), (W2, h2), (a2, h2), (a2, H2), (0, H2))
        case 1 => Seq((0, 0), (W2, 0), (W2, H2), (W2 - a2, H2),
          (W2 - a2, h2), (0, h2))
        case 2 => Seq((0, 0), (a2, 0), (a2, H2 - h2), (W2, H2 - h2),
          (W2, H2), (0, H2))
        case _ => Seq((W2 - a2, 0), (W2, 0), (W2, H2), (0, H2),
          (0, H2 - h2), (W2 - a2, H2 - h2))
      }
      // exact area by UNIT-CELL count: all LATTICE coordinates are
      // integers, so the intersection is a union of unit cells —
      // counting cells whose center lies in both shapes is the area,
      // no geometry code
      def inL1(x: Double, y: Double): Boolean =
        (x > 0 && x < W && y > 0 && y < h) ||
          (x > 0 && x < a && y > h && y < H)
      def inRect(x: Double, y: Double, r: (Int, Int, Int, Int)): Boolean =
        x > x1 + r._1 && x < x1 + r._3 && y > y1 + r._2 && y < y1 + r._4
      def inL2(x: Double, y: Double): Boolean =
        inRect(x, y, s1) || inRect(x, y, s2)
      val cells = (for {
        cx <- -3 until 20; cy <- -3 until 20
        if inL1(cx + 0.5, cy + 0.5) && inL2(cx + 0.5, cy + 0.5)
      } yield 1).sum.toDouble
      // each pair runs at TWO placements: the integer lattice, and an
      // OFF-LATTICE affine image (scale 7/16, offset 13/64 — exact
      // binary fractions, so the transformed polygons are exact and
      // the true area is cells x scale² with no rounding) — the
      // off-lattice pass exercises the tolerance machinery where the
      // lattice would hide it
      Seq((1.0, 0.0, 0), (0.4375, 0.203125, 1)).foreach {
        case (sc, off, variant) =>
          def pt(vx: Int, vy: Int): String = s"${vx * sc + off} ${vy * sc + off}"
          val w1 = "POLYGON ((" + Seq((0, 0), (W, 0), (W, h), (a, h),
            (a, H), (0, H), (0, 0)).map((pt _).tupled).mkString(", ") + "))"
          val w2 = "POLYGON ((" + ((vtx(cfg) :+ vtx(cfg).head)
            .map { case (vx, vy) => pt(vx + x1, vy + y1) }).mkString(", ") + "))"
          val expected = cells * sc * sc
          try {
            clip("st_intersection", w1, w2) match {
              case None =>
                assert(expected == 0.0,
                  s"trial $trial/$variant: empty result but true area " +
                    s"$expected (l1=$w1 l2=$w2)")
              case Some((got, _, _)) =>
                assert(math.abs(got - expected) < 1e-9,
                  s"trial $trial/$variant: l1=$w1 l2=$w2 got $got " +
                    s"expected $expected")
                // and it commutes
                val swap = clip("st_intersection", w2, w1)
                assert(swap.isDefined &&
                  math.abs(swap.get._1 - expected) < 1e-9,
                  s"trial $trial/$variant commute")
                if (variant == 0) successes += 1 else successesOff += 1
            }
          } catch {
            case e: org.scalatest.exceptions.TestFailedException => throw e
            case e: Exception =>
              val chain = TestSpark.causeChain(e)
              assert(allowed.exists(chain.contains),
                s"trial $trial/$variant: undocumented refusal for " +
                  s"l1=$w1 l2=$w2: $chain")
          }
      }
    }
    // the family must actually exercise the success path AT BOTH
    // placements (the MULTI-piece path is covered deterministically by
    // the fixture test below and the q_gis_clip_both_concave gate's 400
    // rows — random integer Ls interlock rarely and usually hit the
    // collinear refusal first)
    assert(successes >= 40, s"only $successes/300 lattice trials succeeded")
    assert(successesOff >= 40,
      s"only $successesOff/300 off-lattice trials succeeded")
  }

  test("both-concave intersection: dispositions and refusals on " +
      "hand-picked fixtures") {
    // interlocking L and Γ: two disjoint pieces -> MULTIPOLYGON
    val ell = "POLYGON ((0 0, 8 0, 8 2, 2 2, 2 6, 0 6, 0 0))"
    val gam = "POLYGON ((3 -1, 4 -1, 4 4, -1 4, -1 3, 3 3, 3 -1))"
    import spark.implicits._
    val r = Seq((ell, gam)).toDF("a", "b")
      .select(call_function("st_intersection",
        stGeomFromText(col("a")), stGeomFromText(col("b"))).as("g"))
      .select(col("g")("gtype"),
        graft.functions.GisFunctions.stNumGeometries(col("g")),
        stArea(col("g"))).collect()(0)
    assert(r.getString(0) == "MULTIPOLYGON" && r.getInt(1) == 2 &&
      math.abs(r.getDouble(2) - 4.0) < 1e-9) // [3,4]x[0,2] + [0,2]x[3,4]
    // containment: the inner concave polygon returns verbatim
    val inner = "POLYGON ((0.5 3, 1.5 3, 1.5 3.5, 1 3.5, 1 5, 0.5 5, 0.5 3))"
    val c = clip("st_intersection", ell, inner)
    assert(c.isDefined && math.abs(c.get._1 - 1.25) < 1e-9 && c.get._2 == 6)
    // disjoint: EMPTY (None), not a refusal
    val far = "POLYGON ((20 3, 21 3, 21 3.5, 20.5 3.5, 20.5 5, 20 5, 20 3))"
    assert(clip("st_intersection", ell, far).isEmpty)
    // the degenerate-contact matrix still refuses: shared vertex,
    // collinear span, vertex tangency
    clipRefuses("st_intersection", ell,
      "POLYGON ((2 2, 5 2, 5 5, 3 5, 3 4, 2 4, 2 2))", "share a vertex")
    clipRefuses("st_intersection", ell,
      "POLYGON ((3 0, 6 0, 6 5, 5 5, 5 4, 3 4, 3 0))", "collinear")
    clipRefuses("st_intersection", ell,
      // concave polygon whose vertex (4, 2) sits ON ell's y=2 edge
      // (edge-endpoint-on-interior = vertex tangency)
      "POLYGON ((4 2, 7 1, 7 5, 5 5, 5 4, 4 4, 4 2))", "tangential")
  }

  test("MULTIPOLYGON WKT parses into the multi form (rings normalized " +
      "CCW), st_area/envelope/count consume it, st_astext round-trips; " +
      "holes and other MULTI* refuse") {
    import spark.implicits._
    // second part given CLOCKWISE — must not cancel the first's area
    val m = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), " +
      "((4 0, 4 2, 6 2, 6 0, 4 0)))"
    val r = Seq(m).toDF("w").select(stGeomFromText(col("w")).as("g"))
      .select(col("g")("gtype"), stArea(col("g")),
        stNumGeometries(col("g")), stXMax(col("g")), stYMax(col("g")),
        stAsText(col("g"))).collect()(0)
    assert(r.getString(0) === "MULTIPOLYGON")
    assert(math.abs(r.getDouble(1) - 8.0) < 1e-12, r.getDouble(1).toString)
    assert(r.getInt(2) === 2)
    assert(r.getDouble(3) === 6.0 && r.getDouble(4) === 2.0)
    val wkt = r.getString(5)
    assert(wkt.startsWith("MULTIPOLYGON (((") && wkt.endsWith(")))"), wkt)
    // rendered text re-parses to the same area/count (round trip)
    val rt = Seq(wkt).toDF("w").select(stGeomFromText(col("w")).as("g"))
      .select(stArea(col("g")), stNumGeometries(col("g"))).collect()(0)
    assert(math.abs(rt.getDouble(0) - 8.0) < 1e-12)
    assert(rt.getInt(1) === 2)
    // an OPEN ring closes on parse
    val open = Seq("MULTIPOLYGON (((0 0, 1 0, 1 1)))").toDF("w")
      .select(stGeomFromText(col("w")).as("g"))
      .select(stArea(col("g")), stNumGeometries(col("g"))).collect()(0)
    assert(math.abs(open.getDouble(0) - 0.5) < 1e-12)
    assert(open.getInt(1) === 1)
    // closure is decided from BOTH axes: this open ring's first/last
    // share x (0==0) but not y — a per-axis check would close xs only
    // and corrupt the arrays (review-r13 regression case)
    val axis = Seq("MULTIPOLYGON (((0 0, 1 0, 0 1)))").toDF("w")
      .select(stGeomFromText(col("w")).as("g"))
      .select(stArea(col("g")), stNumGeometries(col("g")),
        size(col("g")("xs")), size(col("g")("ys"))).collect()(0)
    assert(math.abs(axis.getDouble(0) - 0.5) < 1e-12, axis.toString)
    assert(axis.getInt(1) === 1)
    assert(axis.getInt(2) === axis.getInt(3)) // aligned arrays
    // holes refuse; other MULTI* refuse
    val e1 = intercept[Exception] {
      Seq("MULTIPOLYGON (((0 0, 8 0, 8 8, 0 8, 0 0), " +
        "(2 2, 3 2, 3 3, 2 3, 2 2)))").toDF("w")
        .select(stGeomFromText(col("w"))).collect()
    }
    assert(TestSpark.causeChain(e1).contains("no holes"),
      TestSpark.causeChain(e1))
    val e2 = intercept[Exception] {
      Seq("MULTIPOINT ((1 1), (2 2))").toDF("w")
        .select(stGeomFromText(col("w"))).collect()
    }
    assert(TestSpark.causeChain(e2).contains("hole-free MULTIPOLYGON"),
      TestSpark.causeChain(e2))
    // degenerate parts (< 3 distinct vertices) refuse — the same bound
    // StUnionAgg.partsOf enforces; before, ((1 1, 2 2)) closed to a
    // zero-area two-vertex "ring" and flowed into area/envelope
    Seq("MULTIPOLYGON (((1 1, 2 2)))",
        "MULTIPOLYGON (((1 1, 2 2, 1 1, 2 2)))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 6)))")
      .foreach { w =>
        val e = intercept[Exception] {
          Seq(w).toDF("w").select(stGeomFromText(col("w"))).collect()
        }
        assert(TestSpark.causeChain(e).contains("MULTIPOLYGON"),
          s"$w: ${TestSpark.causeChain(e)}")
      }
  }

  test("st_union_multi (ST_UnionAggregate's disjoint slice): one part " +
      "stays POLYGON, several become MULTIPOLYGON, multi inputs " +
      "flatten, the result is aggregation-order independent, touching/" +
      "overlapping/point inputs refuse") {
    import spark.implicits._
    def aggOf(wkts: Seq[String]) =
      wkts.toDF("w").agg(stUnionAgg(stGeomFromText(col("w"))).as("u"))
        .select(col("u")("gtype"), stArea(col("u")),
          stNumGeometries(col("u")), stAsText(col("u")))
        .collect()(0)
    val r = aggOf(Seq(rect(0, 0, 2, 2), rect(4, 0, 6, 1), rect(0, 5, 1, 6)))
    assert(r.getString(0) === "MULTIPOLYGON")
    assert(math.abs(r.getDouble(1) - 7.0) < 1e-12)
    assert(r.getInt(2) === 3)
    val one = aggOf(Seq(rect(0, 0, 2, 2)))
    assert(one.getString(0) === "POLYGON")
    assert(math.abs(one.getDouble(1) - 4.0) < 1e-12)
    assert(one.getInt(2) === 1)
    // MULTIPOLYGON inputs flatten their parts into the union
    val multiIn = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), " +
      "((3 0, 4 0, 4 1, 3 1, 3 0)))"
    val f = aggOf(Seq(multiIn, rect(6, 6, 7, 7)))
    assert(f.getInt(2) === 3)
    assert(math.abs(f.getDouble(1) - 3.0) < 1e-12)
    // canonical part order: the rendered union is identical whatever
    // order the group aggregated in
    val ws = Seq(rect(0, 0, 2, 2), rect(4, 0, 6, 1), rect(0, 5, 1, 6))
    assert(aggOf(ws).getString(3) === aggOf(ws.reverse).getString(3))
    // touching (shared edge) and overlapping pairs refuse
    val e1 = intercept[Exception] {
      aggOf(Seq(rect(0, 0, 2, 2), rect(2, 0, 4, 2)))
    }
    assert(TestSpark.causeChain(e1).contains("touch or overlap"),
      TestSpark.causeChain(e1))
    val e2 = intercept[Exception] {
      aggOf(Seq(rect(0, 0, 2, 2), rect(1, 1, 3, 3)))
    }
    assert(TestSpark.causeChain(e2).contains("touch or overlap"),
      TestSpark.causeChain(e2))
    val e3 = intercept[Exception] { aggOf(Seq("POINT (1 1)")) }
    assert(TestSpark.causeChain(e3).contains("POLYGON/MULTIPOLYGON"),
      TestSpark.causeChain(e3))
  }

  // ---------------------------------------------------- st_transform

  private def xform(wkt: String, from: Int, to: Int): (Double, Double) = {
    import spark.implicits._
    val r = Seq(wkt).toDF("w")
      .select(stTransform(stGeomFromText(col("w")), from, to).as("g"))
      .select(element_at(col("g")("xs"), 1), element_at(col("g")("ys"), 1))
      .collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  test("st_transform 4326<->3857: closed-form forward, exact-ish round " +
      "trip, envelope invariants on a polygon") {
    val (x, y) = xform("POINT (2.2945 48.8584)", 4326, 3857)
    assert(math.abs(x - 6378137.0 * math.toRadians(2.2945)) < 1e-6)
    assert(math.abs(y - 6378137.0 *
      math.log(math.tan(math.Pi / 4 + math.toRadians(48.8584) / 2))) < 1e-6)
    val (lon, lat) = xform(s"POINT ($x $y)", 3857, 4326)
    assert(math.abs(lon - 2.2945) < 1e-9)
    assert(math.abs(lat - 48.8584) < 1e-9)
    // equator / prime meridian map to the origin (to fp noise: the
    // lat leg is R*ln(tan(pi/4)) where tan(pi/4) != 1 by one ulp)
    val (ox, oy) = xform("POINT (0 0)", 4326, 3857)
    assert(ox === 0.0)
    assert(math.abs(oy) < 1e-6)
  }

  test("st_transform 4326<->UTM: golden points cross-validated by two " +
      "independent published formulations (Karney n-series vs Snyder " +
      "e-series, tools/utm_golden.py), mm agreement; 1e-9-degree round " +
      "trips; srid stamping; unsupported pairs refuse") {
    // (lon, lat, epsg, expected easting, expected northing)
    val golden = Seq(
      (2.2945, 48.8584, 32631, 448252.00138, 5411954.90995),
      (-73.5, 40.5, 32618, 627103.08731, 4484335.40166),
      (151.2153, -33.8568, 32756, 334900.56965, 6252288.75289),
      (3.0, 0.0, 32631, 500000.0, 0.0),
      (103.85, 1.29, 32648, 372057.36823, 142612.91054),
      (-122.4194, 37.7749, 32610, 551130.76848, 4180998.88150))
    golden.foreach { case (lon, lat, epsg, ee, en) =>
      val (e, n) = xform(s"POINT ($lon $lat)", 4326, epsg)
      assert(math.abs(e - ee) < 1e-3, s"easting $lon $lat -> $e vs $ee")
      assert(math.abs(n - en) < 1e-3, s"northing $lon $lat -> $n vs $en")
      val (lon2, lat2) = xform(s"POINT ($e $n)", epsg, 4326)
      assert(math.abs(lon2 - lon) < 1e-9, s"rt lon $lon2 vs $lon")
      assert(math.abs(lat2 - lat) < 1e-9, s"rt lat $lat2 vs $lat")
    }
    // non-4326 pairs compose through geographic coords (same datum):
    // 3857 -> UTM equals the direct 4326 -> UTM to fp round-trip, and
    // a UTM zone change round-trips through its neighbor zone
    val (mx, my) = xform("POINT (2.2945 48.8584)", 4326, 3857)
    val (ce, cn) = xform(s"POINT ($mx $my)", 3857, 32631)
    assert(math.abs(ce - 448252.00138) < 1e-3, ce.toString)
    assert(math.abs(cn - 5411954.90995) < 1e-3, cn.toString)
    val (e32, n32) = xform("POINT (448252.001 5411954.910)", 32631, 32632)
    val (backE, backN) = xform(s"POINT ($e32 $n32)", 32632, 32631)
    assert(math.abs(backE - 448252.001) < 1e-6, backE.toString)
    assert(math.abs(backN - 5411954.910) < 1e-6, backN.toString)
    // srid-carrying geometry comes out stamped with the target srid
    import spark.implicits._
    val srid = Seq("POINT (9 48)").toDF("w")
      .select(stSrid(stTransform(
        stGeomFromTextSrid(col("w"), lit(4326)), 4326, 32632)))
      .collect()(0).getInt(0)
    assert(srid === 32632)
    // unsupported pair: refusal at call time (Column API)...
    val e1 = intercept[UnsupportedOperationException] {
      stTransform(stGeomFromText(lit("POINT (0 0)")), 4326, 27700)
    }
    assert(e1.getMessage.contains("projection engine"))
    // ...and at PLAN time when invoked by name (checkInputDataTypes)
    val e2 = intercept[Exception] {
      Seq("POINT (0 0)").toDF("w")
        .select(call_function("st_transform",
          stGeomFromText(col("w")), lit(4326), lit(2154)))
        .collect()
    }
    assert(TestSpark.causeChain(e2).contains("projection engine"),
      TestSpark.causeChain(e2))
  }

  test("st_transform domain guards: far-from-zone longitude, polar " +
      "latitude, out-of-extent easting/northing and srid-mismatched " +
      "input all REFUSE instead of returning garbage") {
    import spark.implicits._
    // 57 deg from zone 31's central meridian (3 deg E) — outside the
    // Krueger series' published accuracy envelope
    val e1 = intercept[Exception](xform("POINT (60 10)", 4326, 32631))
    assert(TestSpark.causeChain(e1).contains("central meridian"),
      TestSpark.causeChain(e1))
    // polar latitude — outside UTM entirely
    val e2 = intercept[Exception](xform("POINT (3 89)", 4326, 32631))
    assert(TestSpark.causeChain(e2).contains("polar"),
      TestSpark.causeChain(e2))
    // inverse with an easting ~8.5e6 m from the false origin
    val e3 = intercept[Exception](
      xform("POINT (9000000 5000000)", 32631, 4326))
    assert(TestSpark.causeChain(e3).contains("valid extent"),
      TestSpark.causeChain(e3))
    // srid-carrying geometry whose tag disagrees with fromSrid
    val e4 = intercept[Exception] {
      Seq("POINT (9 48)").toDF("w")
        .select(stTransform(
          stGeomFromTextSrid(col("w"), lit(3857)), 4326, 32632))
        .collect()
    }
    assert(TestSpark.causeChain(e4).contains("mis-tagged"),
      TestSpark.causeChain(e4))
    // the guards do NOT bite legitimate near-boundary use: a zone-32
    // point read through neighbor zone 31 (6.7 deg offset) still works
    val (e32, n32) = xform("POINT (448252.001 5411954.910)", 32631, 32632)
    assert(math.abs(e32 - 448252.001) > 1.0) // genuinely re-projected
    assert(n32 > 5.4e6)
    // the 35-deg bound is tight on BOTH sides: 34.9 deg from zone 31's
    // central meridian (3E) round-trips to 1e-9 deg (the series really
    // does hold that wide), 35.1 deg refuses
    val (we, wn) = xform("POINT (37.9 10) ", 4326, 32631)
    val (wl, wp) = xform(s"POINT ($we $wn)", 32631, 4326)
    assert(math.abs(wl - 37.9) < 1e-9 && math.abs(wp - 10) < 1e-9,
      s"$wl $wp")
    val eWide = intercept[Exception](xform("POINT (38.1 10)", 4326, 32631))
    assert(TestSpark.causeChain(eWide).contains("central meridian"))
  }

  test("st_transform applies per-vertex on LINESTRING/POLYGON and " +
      "preserves the geometry type") {
    import spark.implicits._
    val r = Seq("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))").toDF("w")
      .select(stTransform(stGeomFromText(col("w")), 4326, 3857).as("g"))
      .select(col("g")("gtype"), size(col("g")("xs")),
        element_at(col("g")("xs"), 2), element_at(col("g")("ys"), 3))
      .collect()(0)
    assert(r.getString(0) === "POLYGON")
    assert(r.getInt(1) === 5) // vertex count preserved (ring as given)
    assert(math.abs(r.getDouble(2) - 6378137.0 * math.toRadians(1.0)) < 1e-6)
    assert(math.abs(r.getDouble(3) - 6378137.0 *
      math.log(math.tan(math.Pi / 4 + math.toRadians(1.0) / 2))) < 1e-6)
  }
}
