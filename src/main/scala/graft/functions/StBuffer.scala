package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `st_buffer` (reference contrib/udfs/.../gis/STBuffer.java —
  * `GeometryEngine.buffer` through the Esri library there): constructive
  * Minkowski buffering over the (gtype, xs, ys) planar core, for the
  * shapes where a hand-rolled construction is exact-by-construction:
  *
  *  - POINT: the disc as a regular N-gon (first vertex at angle 0);
  *  - 2-point LINESTRING: the capsule — two offset sides plus two
  *    N/2-segment semicircular caps;
  *  - CONVEX POLYGON, d > 0: the Minkowski sum with the disc — offset
  *    edges joined by per-vertex arc fans (each vertex's exterior angle
  *    split into equal steps, endpoints EXACTLY on the edge normals, so
  *    axis-aligned inputs keep exact envelope extremes);
  *  - CONVEX POLYGON, d < 0: erosion = Sutherland–Hodgman clip of the
  *    ring by every inward-offset edge half-plane (convex erosion is
  *    again convex); a vanished interior returns NULL (= EMPTY);
  *  - d == 0: the input ring canonicalized (open, CCW).
  *
  * N = 32 segments per full circle by default; a literal third argument
  * overrides and must be a positive multiple of 4 (keeps the four axis
  * extremes exact). NULL in (geometry or distance) → NULL out, the
  * reference's NULL_IF_NULL.
  *
  * Refused LOUDLY (never a wrong ring): concave polygons (a concave
  * positive buffer needs arc-arc trimming and a concave erosion can
  * split into MULTIPOLYGON), polylines of more than 2 points (offset
  * sides can self-intersect), holes / MULTI* (the parse core's bound).
  * POINT/LINESTRING with d <= 0 buffer to the empty set → NULL.
  */
object StBuffer {

  val DefaultSegments = 32

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"st_buffer: $msg")

  private def signedArea2(xs: Array[Double], ys: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = xs.length
    while (i < n) {
      val j = (i + 1) % n
      s += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    s
  }

  private def geomRow(xs: Array[Double], ys: Array[Double]): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString("POLYGON"),
      new GenericArrayData(xs.map(x => x: Any)),
      new GenericArrayData(ys.map(y => y: Any))))

  /** Open, CCW, consecutive-dup-collapsed ring; refuses concave. */
  private def parseRing(xs0: Array[Double], ys0: Array[Double],
                        eps2: Double): (Array[Double], Array[Double]) = {
    var xs = xs0; var ys = ys0
    if (xs.length > 1 && xs.head == xs.last && ys.head == ys.last) {
      xs = xs.dropRight(1); ys = ys.dropRight(1)
    }
    if (xs.length > 1) {
      val keep = Array.newBuilder[Int]
      keep += 0
      var i = 1
      while (i < xs.length) {
        if (xs(i) != xs(i - 1) || ys(i) != ys(i - 1)) keep += i
        i += 1
      }
      val ks = keep.result()
      if (ks.length != xs.length) { xs = ks.map(xs); ys = ks.map(ys) }
    }
    if (xs.length < 3) fail("polygon has fewer than 3 distinct vertices")
    if (signedArea2(xs, ys) < 0) { xs = xs.reverse; ys = ys.reverse }
    if (math.abs(signedArea2(xs, ys)) <= eps2)
      fail("polygon has zero area (all vertices collinear)")
    val n = xs.length
    var i = 0
    while (i < n) {
      val j = (i + 1) % n; val k = (i + 2) % n
      val cr = (xs(j) - xs(i)) * (ys(k) - ys(i)) -
        (ys(j) - ys(i)) * (xs(k) - xs(i))
      if (cr < -eps2) fail(s"polygon is concave at vertex $j — " +
        "st_buffer implements the CONVEX slice (a concave positive " +
        "buffer needs arc-arc trimming; a concave erosion can split " +
        "into MULTIPOLYGON)")
      i += 1
    }
    (xs, ys)
  }

  /** Arc from unit normal n0 to unit normal n1 (CCW) around (cx,cy) at
    * radius d, split into ceil(span/(2π/segN)) equal steps. BOTH
    * endpoints are emitted EXACTLY as c + d·n (no trig — axis-aligned
    * normals keep exact envelope extremes); only interior points use
    * cos/sin. */
  private def arcBetween(cx: Double, cy: Double, d: Double,
                         n0x: Double, n0y: Double, n1x: Double, n1y: Double,
                         segN: Int,
                         out: scala.collection.mutable.ArrayBuffer[(Double, Double)])
      : Unit = {
    val a0 = math.atan2(n0y, n0x)
    var a1 = math.atan2(n1y, n1x)
    if (a1 < a0 - 1e-12) a1 += 2.0 * math.Pi
    val span = math.max(0.0, a1 - a0)
    val step = 2.0 * math.Pi / segN
    val m = math.max(1, math.ceil(span / step - 1e-12).toInt)
    out += ((cx + d * n0x, cy + d * n0y))
    var k = 1
    while (k < m) {
      val a = a0 + span * k / m
      out += ((cx + d * math.cos(a), cy + d * math.sin(a)))
      k += 1
    }
    out += ((cx + d * n1x, cy + d * n1y))
  }

  /** The disc as a regular N-gon by quadrant reflection — cardinal
    * vertices are EXACT (cos/sin only inside the first quadrant). */
  private def disc(cx: Double, cy: Double, d: Double, segN: Int,
                   out: scala.collection.mutable.ArrayBuffer[(Double, Double)])
      : Unit = {
    val q = segN / 4
    val cs = Array.tabulate(q) { r =>
      if (r == 0) (1.0, 0.0)
      else { val a = 2.0 * math.Pi * r / segN; (math.cos(a), math.sin(a)) }
    }
    var k = 0
    while (k < segN) {
      val (c0, s0) = cs(k % q)
      val (c, s) = (k / q) match {
        case 0 => (c0, s0)
        case 1 => (-s0, c0)
        case 2 => (-c0, -s0)
        case _ => (s0, -c0)
      }
      out += ((cx + d * c, cy + d * s))
      k += 1
    }
  }

  private def dedupeClosed(pts: Seq[(Double, Double)], eps: Double)
      : (Array[Double], Array[Double]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- pts)
      if (out.isEmpty || math.abs(out.last._1 - p._1) > eps ||
          math.abs(out.last._2 - p._2) > eps) out += p
    while (out.length > 1 &&
        math.abs(out.head._1 - out.last._1) <= eps &&
        math.abs(out.head._2 - out.last._2) <= eps)
      out.remove(out.length - 1)
    (out.map(_._1).toArray, out.map(_._2).toArray)
  }

  /** Sutherland–Hodgman clip of a ring by half-plane
    * {p : (p - a)·n <= c}. */
  private def clipHalfPlane(xs: Array[Double], ys: Array[Double],
                            ax: Double, ay: Double, nx: Double, ny: Double,
                            c: Double): (Array[Double], Array[Double]) = {
    val ox = scala.collection.mutable.ArrayBuffer.empty[Double]
    val oy = scala.collection.mutable.ArrayBuffer.empty[Double]
    val n = xs.length
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val di = (xs(i) - ax) * nx + (ys(i) - ay) * ny - c
      val dj = (xs(j) - ax) * nx + (ys(j) - ay) * ny - c
      if (di <= 0) { ox += xs(i); oy += ys(i) }
      if ((di < 0 && dj > 0) || (di > 0 && dj < 0)) {
        val t = di / (di - dj)
        ox += xs(i) + t * (xs(j) - xs(i))
        oy += ys(i) + t * (ys(j) - ys(i))
      }
      i += 1
    }
    (ox.toArray, oy.toArray)
  }

  /** The buffer construction; returns null for EMPTY. */
  def buffer(row: InternalRow, d: Double, segN: Int): InternalRow = {
    if (row == null) return null
    require(segN > 0 && segN % 4 == 0,
      s"st_buffer: segments must be a positive multiple of 4, got $segN")
    if (java.lang.Double.isNaN(d)) fail("distance is NaN")
    val gtype = row.getUTF8String(0).toString
    val xsA = row.getArray(1); val ysA = row.getArray(2)
    val xs0 = Array.tabulate(xsA.numElements())(xsA.getDouble)
    val ys0 = Array.tabulate(ysA.numElements())(ysA.getDouble)
    var scale = math.max(1.0, math.abs(d))
    for (v <- xs0) scale = math.max(scale, math.abs(v))
    for (v <- ys0) scale = math.max(scale, math.abs(v))
    val eps = 32 * java.lang.Math.ulp(1.0) * scale
    val eps2 = eps * scale
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    gtype match {
      case "POINT" =>
        if (d <= 0) return null // empty interior: d <= 0 buffers to ∅
        disc(xs0(0), ys0(0), d, segN, buf)
        val (rx, ry) = dedupeClosed(buf.toSeq, eps)
        geomRow(rx, ry)
      case "LINESTRING" =>
        if (d <= 0) return null
        if (xs0.length != 2)
          fail(s"LINESTRING buffering supports exactly 2 points, got " +
            s"${xs0.length} (longer polylines can self-intersect when " +
            "offset)")
        val (ax, ay, bx, by) = (xs0(0), ys0(0), xs0(1), ys0(1))
        val len = math.hypot(bx - ax, by - ay)
        if (len <= eps) { // degenerate segment = point
          disc(ax, ay, d, segN, buf)
          val (rx, ry) = dedupeClosed(buf.toSeq, eps)
          return geomRow(rx, ry)
        }
        // unit right/left normals of the A→B direction (exact for
        // axis-aligned segments)
        val ux = (bx - ax) / len; val uy = (by - ay) / len
        val (rnx, rny) = (uy, -ux) // right of travel
        val (lnx, lny) = (-uy, ux)
        // CCW capsule: A right-offset → cap around B (right → left
        // normal, bulging forward) → B left-offset → cap around A
        buf += ((ax + d * rnx, ay + d * rny))
        arcBetween(bx, by, d, rnx, rny, lnx, lny, segN, buf)
        arcBetween(ax, ay, d, lnx, lny, rnx, rny, segN, buf)
        val (rx, ry) = dedupeClosed(buf.toSeq, eps)
        geomRow(rx, ry)
      case "POLYGON" =>
        val (xs, ys) = parseRing(xs0, ys0, eps2)
        val n = xs.length
        if (d == 0) return geomRow(xs, ys) // identity (canonical CCW)
        if (d > 0) {
          // outward unit normal of CCW edge i→i+1 is (dy, -dx)/L
          val nx = new Array[Double](n); val ny = new Array[Double](n)
          var i = 0
          while (i < n) {
            val j = (i + 1) % n
            val l = math.hypot(xs(j) - xs(i), ys(j) - ys(i))
            nx(i) = (ys(j) - ys(i)) / l
            ny(i) = -(xs(j) - xs(i)) / l
            i += 1
          }
          i = 0
          while (i < n) {
            val prev = (i + n - 1) % n
            arcBetween(xs(i), ys(i), d, nx(prev), ny(prev), nx(i), ny(i),
              segN, buf)
            i += 1
          }
          val (rx, ry) = dedupeClosed(buf.toSeq, eps)
          geomRow(rx, ry)
        } else {
          // erosion: clip by every inward-offset edge half-plane
          var cx = xs; var cy = ys
          var i = 0
          while (i < n && cx.length >= 3) {
            val j = (i + 1) % n
            val l = math.hypot(xs(j) - xs(i), ys(j) - ys(i))
            val enx = (ys(j) - ys(i)) / l
            val eny = -(xs(j) - xs(i)) / l
            val r = clipHalfPlane(cx, cy, xs(i), ys(i), enx, eny, d)
            cx = r._1; cy = r._2
            i += 1
          }
          if (cx.length < 3 || math.abs(signedArea2(cx, cy)) <= eps2) null
          else { val (rx, ry) = dedupeClosed(
            cx.zip(cy).toSeq, eps); geomRow(rx, ry) }
        }
      case other => fail(s"unsupported geometry type $other (POINT, " +
        "2-point LINESTRING and convex POLYGON buffer; MULTI*/holes " +
        "are outside the parse core)")
    }
  }
}

/** `st_buffer(geom, distance[, segments])` — see [[StBuffer]]. */
case class StBufferExpr(left: Expression, right: Expression, segments: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (GisPredicates.isGeomType(left.dataType) &&
        right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "st_buffer expects (geometry struct, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = left.dataType match {
    // result drops srid like the clip algebra: canonical 3-field shape
    case s: StructType => StructType(s.fields.take(3))
    case other => other
  }

  override def nullable: Boolean = true

  override def nullSafeEval(geom: Any, dist: Any): Any =
    StBuffer.buffer(geom.asInstanceOf[InternalRow],
      dist.asInstanceOf[Double], segments)

  override def prettyName: String = "st_buffer"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StBufferExpr =
    copy(left = newLeft, right = newRight)
}
