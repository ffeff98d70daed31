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

  test("st_transform is a documented refusal") {
    val e = intercept[UnsupportedOperationException] {
      stTransform(lit(1), 4326, 3857)
    }
    assert(e.getMessage.contains("projection"))
  }
}
