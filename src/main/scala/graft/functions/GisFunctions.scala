package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GIS surface (reference: contrib/udfs/src/main/java/.../gis/ —
  * STPointFunc.java, STDistance.java, STDWithin.java, STXFunc/STYFunc,
  * STGeomFromText, STAsText/STAsGeoJSON, STEnvelope, STWithin,
  * STXMin..STYMax): point construction, great-circle distance,
  * distance/bbox predicates, and a hand-rolled planar geometry core —
  * WKT parse for POINT/LINESTRING/POLYGON (single ring), envelope,
  * ray-casting point-in-polygon, GeoJSON — all as pure codegen'd
  * column expressions over a (gtype, xs, ys) struct; no geometry
  * library, no UDF, nothing leaves whole-stage codegen. (The Esri
  * operations needing true geometry algebra — st_buffer, st_union,
  * st_intersection of polygons — stay out of scope and error clearly.)
  */
object GisFunctions {

  private val EarthRadiusKm = 6371.0088

  /** ST_Point(lon, lat) as a typed struct column. */
  def stPoint(lon: Column, lat: Column): Column =
    struct(lon.cast("double").as("x"), lat.cast("double").as("y"))

  def stX(point: Column): Column = point("x")
  def stY(point: Column): Column = point("y")

  /** Great-circle (haversine) distance in kilometers. */
  def stDistanceKm(aLon: Column, aLat: Column,
                   bLon: Column, bLat: Column): Column = {
    val dLat = radians(bLat - aLat)
    val dLon = radians(bLon - aLon)
    val h = pow(sin(dLat / 2), 2) +
      cos(radians(aLat)) * cos(radians(bLat)) * pow(sin(dLon / 2), 2)
    // clamp: fp rounding can push h one ulp past 1 for near-antipodal
    // pairs, and asin(sqrt(1 + ulp)) is NaN — the distance silently
    // vanished from st_dwithin instead of reading ~20015 km
    lit(2 * EarthRadiusKm) * asin(sqrt(least(h, lit(1.0))))
  }

  /** ST_DWithin on great-circle distance. */
  def stDWithinKm(aLon: Column, aLat: Column, bLon: Column, bLat: Column,
                  km: Double): Column =
    stDistanceKm(aLon, aLat, bLon, bLat) <= km

  /** Point-in-bounding-box predicate (the planar ST_Within case Drill's
    * gis UDFs cover for envelopes). */
  def stWithinBBox(lon: Column, lat: Column, minLon: Double, minLat: Double,
                   maxLon: Double, maxLat: Double): Column =
    lon >= minLon && lon <= maxLon && lat >= minLat && lat <= maxLat

  // ---- planar geometry core: (gtype, xs, ys) struct ----------------

  /** ST_GeomFromText for POINT / LINESTRING / POLYGON (one outer
    * ring) and MULTIPOLYGON with single-ring parts. Declarative WKT
    * parse: coordinate list via regexp, pair split via transform —
    * simple geometries land as a (gtype, xs[], ys[]) struct;
    * MULTIPOLYGON lands in the NaN-separated multi form. Holes and
    * the other MULTI* types raise a clear error (the honesty bound of
    * the hand-rolled core). */
  def stGeomFromText(wkt: Column): Column = {
    val typ = upper(trim(regexp_extract(wkt, "^\\s*([A-Za-z]+)", 1)))
    // any `)` followed (over whitespace) by `,` is a ring/geometry
    // separator — holes and MULTI* parts in every spacing variant
    val multiRing = wkt.rlike("\\)\\s*,")
    val body = regexp_extract(wkt, "\\(\\(?\\s*([^()]+?)\\s*\\)?\\)", 1)
    def pairsOf(b: Column) = transform(split(b, ","),
      s => split(trim(regexp_replace(s, "\\s+", " ")), " "))
    def xsOf(ps: Column) = transform(ps, p => element_at(p, 1).cast("double"))
    def ysOf(ps: Column) = transform(ps, p => element_at(p, 2).cast("double"))
    def badPairsIn(ps: Column) = exists(ps, p => size(p) =!= 2) ||
      exists(xsOf(ps), x => x.isNull) || exists(ysOf(ps), y => y.isNull)
    val pairs = pairsOf(body)
    val xs = xsOf(pairs)
    val ys = ysOf(pairs)
    // Z/M/ZM modifiers would silently DROP ordinates; a malformed
    // coordinate (non-numeric token, odd token count) casts to null and
    // later NPEs the predicate kernel or reads as phantom 0.0 — both
    // refuse loudly like holes/MULTI* do
    val zm = wkt.rlike("(?i)^\\s*[A-Za-z]+\\s+(ZM|Z|M)\\s*\\(")
    val badPair = badPairsIn(pairs)
    // ---- MULTIPOLYGON routes through ONE compact expression node
    // (WktMultiParse): the declarative unroll duplicated the per-part
    // closure/orientation subtrees ~100x and every stGeomFromText call
    // site paid seconds of analysis — the fallback node costs one
    // reference, codegen continues around it, and its boxed eval runs
    // only on actual MULTIPOLYGON strings.
    when(typ === "MULTIPOLYGON", call_function("wkt_multi_parse", wkt))
      .when(!typ.isin("POINT", "LINESTRING", "POLYGON") || multiRing || zm,
        raise_error(concat(lit("st_geomfromtext supports single-ring 2-D " +
          "POINT/LINESTRING/POLYGON and hole-free MULTIPOLYGON, got: "),
          wkt)))
      .when(badPair,
        raise_error(concat(lit("st_geomfromtext: malformed coordinate " +
          "list in: "), wkt)))
      .otherwise(struct(typ.as("gtype"), xs.as("xs"), ys.as("ys")))
  }

  /** ST_GeomFromText(wkt, srid) — the two-arg reference form
    * (contrib/udfs gis/STGeomFromTextSrid.java): same parse, with the
    * spatial reference id CARRIED on the geometry as an int field. No
    * coordinate transformation is implied (or available — see
    * [[stTransform]]); the srid is metadata the DE-9IM predicates
    * ignore (they read gtype/xs/ys by ordinal) and [[stAsJson]]
    * renders. */
  def stGeomFromTextSrid(wkt: Column, srid: Column): Column = {
    val g = stGeomFromText(wkt)
    struct(g("gtype").as("gtype"), g("xs").as("xs"), g("ys").as("ys"),
      srid.cast("int").as("srid"))
  }

  /** ST_SRID accessor for [[stGeomFromTextSrid]] geometries. */
  def stSrid(geom: Column): Column = geom("srid")

  /** ST_UnionAggregate's disjoint slice (see [[StUnionAgg]]): union a
    * GROUP of pairwise-disjoint polygons into one geometry — a plain
    * POLYGON for one part, the MULTIPOLYGON form for several; touching
    * or overlapping inputs refuse loudly. */
  def stUnionAgg(geom: Column): Column =
    call_function("st_union_multi", collect_list(geom))

  /** ST_Transform (reference STTransform.java, proj4-backed there),
    * NARROWED to the CRS pairs with public closed-form math — see
    * [[StTransform]]: EPSG:4326 ↔ 3857 (Web Mercator) and 4326 ↔ UTM
    * (EPSG:326zz / 327zz, Krüger series). Every other pair keeps the
    * documented refusal — a datum pipeline hand-rolled beyond these
    * would only validate against itself. Refuses at CALL time for
    * unsupported pairs (and again at plan time for SQL callers). */
  def stTransform(geom: Column, fromSrid: Int, toSrid: Int): Column = {
    if (!StTransform.supported(fromSrid, toSrid))
      throw new UnsupportedOperationException(
        s"st_transform($fromSrid -> $toSrid): only EPSG:4326 <-> " +
          "EPSG:3857 and EPSG:4326 <-> UTM (EPSG:326zz/327zz) have " +
          "public closed-form math in this build; other CRS pairs " +
          "require a projection engine (proj4/Esri)")
    call_function("st_transform", geom, lit(fromSrid), lit(toSrid))
  }

  /** ST_AsText — WKT back out of the struct (doubles in Spark's own
    * string form, so parse→text is canonical rather than byte-exact). */
  def stAsText(geom: Column): Column = {
    val pairs = zip_with(geom("xs"), geom("ys"),
      (x, y) => concat_ws(" ", x.cast("string"), y.cast("string")))
    val list = array_join(pairs, ", ")
    // WKT LinearRings REQUIRE first == last: the core stores rings open,
    // so close on the way out (like the JSON renderers) or PostGIS/JTS
    // consumers reject the output
    val ringList = array_join(closedRing(pairs), ", ")
    when(geom("gtype") === "MULTIPOLYGON",
      concat(lit("MULTIPOLYGON ((("),
        multiBody(geom, p => p, ", ", ")), (("), lit(")))")))
      .when(geom("gtype") === "POINT", concat(lit("POINT ("), list, lit(")")))
      .when(geom("gtype") === "LINESTRING",
        concat(lit("LINESTRING ("), list, lit(")")))
      .otherwise(concat(lit("POLYGON (("), ringList, lit("))")))
  }

  /** Polygon ring with guaranteed closure (first == last): the planar
    * core accepts open rings (stContains walks the closing edge
    * implicitly), but RFC 7946 and Esri JSON REQUIRE closed linear
    * rings — append the first vertex when the ring was given open. */
  private def closedRing(coords: Column): Column =
    when(element_at(coords, 1) === element_at(coords, -1), coords)
      .otherwise(concat(coords, array(element_at(coords, 1))))

  /** Render the MULTIPOLYGON form's ring list as text: the struct
    * stores rings CLOSED with a NaN sentinel after each, so one
    * aggregate pass accumulates vertex tokens (via `vertex` applied to
    * "x y"-style pairs), marks each sentinel with `|`, and a finishing
    * replace turns the markers into `ringSep`. Vertex text never
    * contains `|`, so the marker is collision-free. */
  private def multiBody(geom: Column, vertex: Column => Column,
                        vertexSep: String, ringSep: String): Column =
    aggregate(
      zip_with(geom("xs"), geom("ys"), (x, y) =>
        when(isnan(x), lit(null)).otherwise(vertex(
          concat_ws(" ", x.cast("string"), y.cast("string"))))),
      lit(""),
      (acc, p) => when(p.isNull, concat(acc, lit("|")))
        .otherwise(concat(acc,
          when(acc === "" || acc.endsWith("|"), lit(""))
            .otherwise(lit(vertexSep)), p)),
      acc => regexp_replace(regexp_replace(acc, "\\|$", ""),
        "\\|", java.util.regex.Matcher.quoteReplacement(ringSep)))

  /** ST_AsGeoJSON — the geometry object (type + coordinates). */
  def stAsGeoJSON(geom: Column): Column = {
    val coords = zip_with(geom("xs"), geom("ys"), (x, y) => array(x, y))
    val typeName = when(geom("gtype") === "POINT", "Point")
      .when(geom("gtype") === "LINESTRING", "LineString")
      .otherwise("Polygon")
    when(geom("gtype") === "MULTIPOLYGON",
      concat(lit("""{"type":"MultiPolygon","coordinates":[[["""),
        multiBody(geom,
          p => concat(lit("["), regexp_replace(p, " ", ","), lit("]")),
          ",", "]],[["),
        lit("]]]}")))
      .when(geom("gtype") === "POINT",
        to_json(struct(typeName.as("type"),
          element_at(coords, 1).as("coordinates"))))
      .when(geom("gtype") === "LINESTRING",
        to_json(struct(typeName.as("type"), coords.as("coordinates"))))
      .otherwise(to_json(struct(typeName.as("type"),
        array(closedRing(coords)).as("coordinates"))))
  }

  /** ST_AsJson — Esri JSON rendering (reference STAsJson.java, which
    * delegates to GeometryEngine.geometryToJson): points are
    * `{"x":..,"y":..,"spatialReference":{"wkid":..}}`, linestrings are
    * `paths`, polygons are `rings` (one ring — the planar core's bound).
    * `wkid` defaults to 4326; pass [[stSrid]] of an srid-carrying
    * geometry to render its own reference. */
  def stAsJson(geom: Column, wkid: Column = lit(4326)): Column = {
    val coords = zip_with(geom("xs"), geom("ys"), (x, y) => array(x, y))
    val sr = struct(wkid.cast("int").as("wkid"))
    // the multi form renders as ONE Esri polygon with several rings —
    // that IS Esri JSON's representation of disjoint-part polygons
    when(geom("gtype") === "MULTIPOLYGON",
      concat(lit("""{"rings":[["""),
        multiBody(geom,
          p => concat(lit("["), regexp_replace(p, " ", ","), lit("]")),
          ",", "],["),
        lit("""]],"spatialReference":{"wkid":"""),
        wkid.cast("int").cast("string"), lit("}}")))
      .when(geom("gtype") === "POINT",
        to_json(struct(element_at(geom("xs"), 1).as("x"),
          element_at(geom("ys"), 1).as("y"), sr.as("spatialReference"))))
      .when(geom("gtype") === "LINESTRING",
        to_json(struct(array(coords).as("paths"), sr.as("spatialReference"))))
      .otherwise(
        to_json(struct(array(closedRing(coords)).as("rings"),
          sr.as("spatialReference"))))
  }

  // envelope extremes filter the MULTIPOLYGON form's NaN ring
  // sentinels (array_min already ignores NaN under Spark's ordering,
  // but array_max would return it — filter both for symmetry; simple
  // geometries carry no NaN and are unaffected)
  def stXMin(geom: Column): Column =
    array_min(filter(geom("xs"), x => !isnan(x)))
  def stXMax(geom: Column): Column =
    array_max(filter(geom("xs"), x => !isnan(x)))
  def stYMin(geom: Column): Column =
    array_min(filter(geom("ys"), y => !isnan(y)))
  def stYMax(geom: Column): Column =
    array_max(filter(geom("ys"), y => !isnan(y)))

  /** ST_Envelope as a (xmin, ymin, xmax, ymax) struct. */
  def stEnvelope(geom: Column): Column =
    struct(stXMin(geom).as("xmin"), stYMin(geom).as("ymin"),
      stXMax(geom).as("xmax"), stYMax(geom).as("ymax"))

  /** ST_Contains(polygon, point): even-odd ray casting over the ring's
    * edges — one codegen'd HOF pass, no UDF, no shuffle. Points exactly
    * ON an edge follow the even-odd tie-break (consistent, but don't
    * rely on boundary points). The ring may be given open or closed;
    * the closing edge is walked explicitly. */
  def stContains(poly: Column, px: Column, py: Column): Column = {
    val xs = poly("xs"); val ys = poly("ys")
    val n = size(xs)
    val x = px.cast("double"); val y = py.cast("double")
    // edge i: (v[i], v[i+1 mod n]); 1-based element_at
    val crossings = aggregate(sequence(lit(0), n - 1), lit(0),
      (acc, i) => {
        val x1 = element_at(xs, (i % n) + 1)
        val y1 = element_at(ys, (i % n) + 1)
        val x2 = element_at(xs, ((i + 1) % n) + 1)
        val y2 = element_at(ys, ((i + 1) % n) + 1)
        val crosses = ((y1 > y) =!= (y2 > y)) &&
          (x < (x2 - x1) * (y - y1) / (y2 - y1) + x1)
        acc + when(crosses, 1).otherwise(0)
      })
    (poly("gtype") === "POLYGON") && (crossings % 2 === 1)
  }

  /** ST_Within(point, polygon) — the inverse argument order. */
  def stWithinPoly(px: Column, py: Column, poly: Column): Column =
    stContains(poly, px, py)

  /** Planar ST_Distance between two POINT geometries. */
  def stDistancePlanar(a: Column, b: Column): Column =
    sqrt(pow(element_at(a("xs"), 1) - element_at(b("xs"), 1), 2) +
      pow(element_at(a("ys"), 1) - element_at(b("ys"), 1), 2))

  /** Envelope-overlap intersects (the bbox pre-filter; the exact
    * predicate is [[stIntersects]]). */
  def stIntersectsBBox(a: Column, b: Column): Column =
    stXMin(a) <= stXMax(b) && stXMin(b) <= stXMax(a) &&
      stYMin(a) <= stYMax(b) && stYMin(b) <= stYMax(a)

  // ---- DE-9IM predicates (GisPredicates.scala; registered in the
  // session function registry by GraftExtensions) --------------------
  def stIntersects(a: Column, b: Column): Column =
    call_function("st_intersects", a, b)
  def stDisjoint(a: Column, b: Column): Column =
    call_function("st_disjoint", a, b)
  def stEquals(a: Column, b: Column): Column =
    call_function("st_equals", a, b)
  def stTouches(a: Column, b: Column): Column =
    call_function("st_touches", a, b)
  def stCrosses(a: Column, b: Column): Column =
    call_function("st_crosses", a, b)
  def stOverlaps(a: Column, b: Column): Column =
    call_function("st_overlaps", a, b)
  def stRelate(a: Column, b: Column): Column =
    call_function("st_relate", a, b)
  def stRelate(a: Column, b: Column, pattern: String): Column =
    call_function("st_relate", a, b, lit(pattern))

  // ---- constructive geometry, CONVEX slice (ConvexClip.scala;
  // registered by GraftExtensions). NULL result = empty geometry;
  // concave inputs, disjoint unions, holes, and multi-part differences
  // refuse loudly — see ConvexClip's scaladoc for the exact bounds. --
  def stIntersection(a: Column, b: Column): Column =
    call_function("st_intersection", a, b)
  def stUnion(a: Column, b: Column): Column =
    call_function("st_union", a, b)
  def stDifference(a: Column, b: Column): Column =
    call_function("st_difference", a, b)

  /** ST_Area — planar shoelace area of a polygon struct (0 for
    * POINT/LINESTRING). Declarative: rotate-by-one arrays + one fold;
    * works for open AND closed rings (the closing duplicate's wrap term
    * is identically zero). */
  def stArea(geom: Column): Column = {
    val xs = geom("xs"); val ys = geom("ys")
    val n = size(xs)
    val xs2 = concat(slice(xs, lit(2), n), slice(xs, lit(1), lit(1)))
    val ys2 = concat(slice(ys, lit(2), n), slice(ys, lit(1), lit(1)))
    val lhs = zip_with(xs, ys2, (x, y2) => x * y2)
    val rhs = zip_with(xs2, ys, (x2, y) => x2 * y)
    val terms = zip_with(lhs, rhs, (p, q) => p - q)
    // no otherwise: a NULL geometry (empty clip result) stays NULL —
    // only a real POINT/LINESTRING collapses to area 0
    when(geom("gtype") === "POLYGON",
      abs(aggregate(terms, lit(0.0), (acc, t) => acc + t)) / 2)
      // MULTIPOLYGON (NaN-separated CLOSED rings, see ConvexClip
      // .multiRow): closed storage makes every consecutive pair a real
      // edge of some ring and every wrap/separator pair touch a NaN —
      // summing the non-NaN shoelace terms IS the sum of part areas
      .when(geom("gtype") === "MULTIPOLYGON",
        abs(aggregate(terms, lit(0.0),
          (acc, t) => acc + when(isnan(t), lit(0.0)).otherwise(t))) / 2)
      .when(geom("gtype").isNotNull, lit(0.0))
  }

  /** Number of parts: 1 for simple geometries, the ring count for the
    * NaN-separated MULTIPOLYGON form (one sentinel per ring). NULL
    * (empty geometry) stays NULL. */
  def stNumGeometries(geom: Column): Column =
    when(geom("gtype") === "MULTIPOLYGON",
      size(filter(geom("xs"), x => isnan(x))))
      .when(geom("gtype").isNotNull, lit(1))
}
