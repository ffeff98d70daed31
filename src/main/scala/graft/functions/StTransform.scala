package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

/** `st_transform(geom, fromSrid, toSrid)` — coordinate reprojection
  * (reference contrib/udfs/.../gis/STTransform.java, which delegates to
  * proj4j for ARBITRARY CRS pairs). No projection engine exists in this
  * zero-egress build, so the surface is NARROWED to the pairs whose
  * math is public closed form and therefore oracle-checkable:
  *
  *  - EPSG:4326 ↔ EPSG:3857 (Web Mercator): the elementary spherical
  *    formulas on the WGS84 semi-major axis — x = R·λ,
  *    y = R·ln tan(π/4 + φ/2) — exactly what every web-map stack
  *    publishes; a SQL oracle recomputes them verbatim.
  *  - EPSG:4326 ↔ EPSG:326zz/327zz (UTM north/south, zones 1-60):
  *    WGS84 Transverse Mercator via the published Krüger n-series
  *    (Karney 2011, "Transverse Mercator with an accuracy of a few
  *    nanometers", arXiv:1002.1417; the same series printed in OSGB
  *    and Deakin's references). Forward: conformal latitude →
  *    Gauss-Schreiber sphere → α-series; inverse: β-series →
  *    Newton-solve the conformal latitude back to geographic. Series
  *    order 6 in the third flattening n (n ≈ 1.68e-3 for WGS84);
  *    truncation error is far below a millimeter, and the spec pins
  *    round-trips to 1e-9 degrees and fixed points cross-validated
  *    against two independent published formulations.
  *
  * Every other (from, to) pair still REFUSES loudly at plan time —
  * datum shifts and grid transforms need a projection database this
  * build honestly does not have.
  *
  * Latitudes at ±90° map to ±Infinity in 3857 (the projection's own
  * pole behavior); the official 3857 validity stops at ±85.051129°.
  */
object StTransform {

  val A = 6378137.0                       // WGS84 semi-major axis (m)
  val F = 1.0 / 298.257223563             // WGS84 flattening
  private val E2 = F * (2 - F)            // first eccentricity squared
  private val E = math.sqrt(E2)
  private val K0 = 0.9996                 // UTM scale at central meridian
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

  // third flattening and the rectifying-radius / Krüger coefficients
  private val N1 = F / (2 - F)
  private val N2 = N1 * N1
  private val N3 = N2 * N1
  private val N4 = N3 * N1
  private val N5 = N4 * N1
  private val N6 = N5 * N1
  /** Rectifying radius A·(1 + n²/4 + n⁴/64 + n⁶/256)/(1+n). */
  private val RectA =
    A / (1 + N1) * (1 + N2 / 4 + N4 / 64 + N6 / 256)
  /** Forward (α) series, Karney 2011 eq. 35 / Wikipedia "Transverse
    * Mercator: flattening series". Orders ≥4 contribute ≈5e-5 m for
    * WGS84; they are carried for completeness. */
  private val Alpha = Array(
    N1 / 2 - 2 * N2 / 3 + 5 * N3 / 16 + 41 * N4 / 180 - 127 * N5 / 288
      + 7891 * N6 / 37800,
    13 * N2 / 48 - 3 * N3 / 5 + 557 * N4 / 1440 + 281 * N5 / 630
      - 1983433 * N6 / 1935360,
    61 * N3 / 240 - 103 * N4 / 140 + 15061 * N5 / 26880
      + 167603 * N6 / 181440,
    49561 * N4 / 161280 - 179 * N5 / 168 + 6601661 * N6 / 7257600,
    34729 * N5 / 80640 - 3418889 * N6 / 1995840,
    212378941 * N6 / 319334400)
  /** Inverse (β) series, Karney 2011 eq. 36. */
  private val Beta = Array(
    N1 / 2 - 2 * N2 / 3 + 37 * N3 / 96 - N4 / 360 - 81 * N5 / 512
      + 96199 * N6 / 604800,
    N2 / 48 + N3 / 15 - 437 * N4 / 1440 + 46 * N5 / 105
      - 1118711 * N6 / 3870720,
    17 * N3 / 480 - 37 * N4 / 840 - 209 * N5 / 4480 + 5569 * N6 / 90720,
    4397 * N4 / 161280 - 11 * N5 / 504 - 830251 * N6 / 7257600,
    4583 * N5 / 161280 - 108847 * N6 / 3991680,
    20648693 * N6 / 638668800)

  // ------------------------------------------------------ Web Mercator

  def lonLatToMercator(lon: Double, lat: Double): (Double, Double) =
    (A * math.toRadians(lon),
      A * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)))

  def mercatorToLonLat(x: Double, y: Double): (Double, Double) =
    (math.toDegrees(x / A),
      math.toDegrees(2 * math.atan(math.exp(y / A)) - math.Pi / 2))

  // ---------------------------------------------------------------- UTM

  /** tan of the CONFORMAL latitude for tan(φ) = tau (Karney eq. 7-9). */
  private def taupf(tau: Double): Double = {
    val tau1 = math.sqrt(1 + tau * tau)
    val sig = math.sinh(E * atanh(E * tau / tau1))
    tau * math.sqrt(1 + sig * sig) - sig * tau1
  }
  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  /** Invert [[taupf]] by Newton iteration on the RESIDUAL (convergence
    * is checked against the forward map itself, so the answer is honest
    * even where the derivative approximation is loose). An exit without
    * convergence REFUSES — returning the last iterate would silently
    * hand back garbage coordinates, against this file's contract. */
  private def tauf(taup: Double): Double = {
    val e2m = 1 - E2
    var tau = taup / e2m // first guess: the spherical-excess stretch
    var i = 0
    while (i < 30) {
      val v = taupf(tau) - taup
      if (math.abs(v) <= 1e-12 * math.max(1.0, math.abs(taup))) return tau
      // dtau'/dtau (Karney eq. 20)
      val tau1 = math.sqrt(1 + tau * tau)
      val sig = math.sinh(E * atanh(E * tau / tau1))
      val taup1 = math.sqrt(1 + taupf(tau) * taupf(tau))
      val d = (taup1 * taup1) / (tau1 * tau1) * tau1 * e2m /
        (1 - E2 * (tau * tau) / (tau1 * tau1)) / taup1
      tau -= v / d
      i += 1
    }
    throw new IllegalArgumentException(
      "st_transform: conformal-latitude inversion did not converge in " +
        "30 Newton steps (input is outside the projection's valid " +
        "domain) — refusing rather than returning an unconverged value")
  }

  /** Domain bound for the Krüger order-6 series: Karney 2011 bounds the
    * truncation error below 5 nm within ~3900 km of the central
    * meridian, i.e. ~35° of longitude at the equator (narrower ground
    * distance at higher latitude, where the series only improves). The
    * file's mm-accuracy claim dies well past this; refuse beyond it. */
  private val MaxDeltaLonDeg = 35.0
  // must ADMIT every forward image of the allowed domain: at lat 84.5
  // combined with 35 deg of longitude the forward xi reaches ~1.492
  // (the meridian-convergence stretch), so the guard sits just past it
  // (the pole is xi ~1.571, still refused)
  private val MaxAbsXi = 1.50
  // the inverse bound must ADMIT every forward image of the allowed
  // domain: |eta| peaks at the equator at atanh(sin 35 deg) = 0.6523
  // (the Gauss-Schreiber stretch outruns ground distance), so the
  // easting guard sits just past it
  private val MaxAbsEta = 0.66

  /** Central meridian of a UTM zone, in degrees. */
  def zoneCentralMeridian(zone: Int): Double = 6.0 * zone - 183.0

  /** Forward UTM: (lon°, lat°) → (easting, northing) in zone. */
  def lonLatToUtm(lon: Double, lat: Double, zone: Int,
                  south: Boolean): (Double, Double) = {
    // domain guards — the series only holds near the central meridian
    // and away from the poles; outside, it silently produces garbage
    val dLonRaw = lon - zoneCentralMeridian(zone)
    val dLon = dLonRaw - 360.0 * math.round(dLonRaw / 360.0)
    if (math.abs(dLon) > MaxDeltaLonDeg)
      throw new IllegalArgumentException(
        f"st_transform: point is $dLon%.3f deg from UTM zone $zone%d's " +
          f"central meridian — the Krueger order-6 series holds its " +
          f"accuracy claim only within ~$MaxDeltaLonDeg%.0f deg " +
          "(~3900 km, Karney 2011); refusing rather than guessing")
    if (math.abs(lat) > 84.5)
      throw new IllegalArgumentException(
        f"st_transform: latitude $lat%.4f deg is outside UTM's polar " +
          "bound (|lat| <= 84.5 deg) — use a polar CRS; refusing " +
          "rather than guessing")
    val lam = math.toRadians(dLon)
    val phi = math.toRadians(lat)
    val taup = taupf(math.tan(phi))
    val xiP = math.atan2(taup, math.cos(lam))
    val etaP = asinh(math.sin(lam) /
      math.hypot(taup, math.cos(lam)))
    var xi = xiP
    var eta = etaP
    var j = 0
    while (j < 6) {
      xi += Alpha(j) * math.sin(2 * (j + 1) * xiP) * math.cosh(2 * (j + 1) * etaP)
      eta += Alpha(j) * math.cos(2 * (j + 1) * xiP) * math.sinh(2 * (j + 1) * etaP)
      j += 1
    }
    val e0 = FalseEasting + K0 * RectA * eta
    val n0 = (if (south) FalseNorthingSouth else 0.0) + K0 * RectA * xi
    (e0, n0)
  }
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1))

  /** Inverse UTM: (easting, northing) in zone → (lon°, lat°). */
  def utmToLonLat(easting: Double, northing: Double, zone: Int,
                  south: Boolean): (Double, Double) = {
    val xi = (northing - (if (south) FalseNorthingSouth else 0.0)) /
      (K0 * RectA)
    val eta = (easting - FalseEasting) / (K0 * RectA)
    // mirror of the forward domain guard: coordinates this far from
    // the zone are outside where the beta-series (and UTM itself) hold
    if (math.abs(xi) > MaxAbsXi || math.abs(eta) > MaxAbsEta)
      throw new IllegalArgumentException(
        f"st_transform: easting/northing ($easting%.1f, $northing%.1f) " +
          f"is outside UTM zone $zone%d's valid extent (|xi| <= " +
          f"$MaxAbsXi%.2f, |eta| <= $MaxAbsEta%.2f after false-origin " +
          "removal) — refusing rather than guessing")
    var xiP = xi
    var etaP = eta
    var j = 0
    while (j < 6) {
      xiP -= Beta(j) * math.sin(2 * (j + 1) * xi) * math.cosh(2 * (j + 1) * eta)
      etaP -= Beta(j) * math.cos(2 * (j + 1) * xi) * math.sinh(2 * (j + 1) * eta)
      j += 1
    }
    val taup = math.sin(xiP) /
      math.hypot(math.sinh(etaP), math.cos(xiP))
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    val phi = math.atan(tauf(taup))
    (zoneCentralMeridian(zone) + math.toDegrees(lam), math.toDegrees(phi))
  }

  // ------------------------------------------------------- dispatching

  /** The supported SRID codes: 4326, 3857, 326zz / 327zz. */
  private def utmZone(srid: Int): Option[(Int, Boolean)] =
    if (srid >= 32601 && srid <= 32660) Some((srid - 32600, false))
    else if (srid >= 32701 && srid <= 32760) Some((srid - 32700, true))
    else None

  /** Per-vertex transformer for a supported pair; None = unsupported.
    * Identity pairs are trivial; pairs not involving 4326 (3857 ↔ UTM,
    * UTM zone changes) COMPOSE through geographic coordinates — both
    * legs share the WGS84 datum, so the composition is exact up to fp
    * round-trip (no datum shift is being smuggled in). */
  def transformer(from: Int, to: Int)
      : Option[(Double, Double) => (Double, Double)] =
    (from, to) match {
      case (a, b) if a == b && (a == 4326 || a == 3857 ||
        utmZone(a).isDefined) => Some((x, y) => (x, y))
      case (4326, 3857) => Some((lon, lat) => lonLatToMercator(lon, lat))
      case (3857, 4326) => Some((x, y) => mercatorToLonLat(x, y))
      case (4326, t) => utmZone(t).map { case (z, s) =>
        (lon: Double, lat: Double) => lonLatToUtm(lon, lat, z, s) }
      case (f, 4326) => utmZone(f).map { case (z, s) =>
        (e: Double, n: Double) => utmToLonLat(e, n, z, s) }
      case (f, t) =>
        // same-datum composition through 4326 (both legs supported and
        // non-identity by the cases above)
        for {
          fwd <- transformer(f, 4326)
          bwd <- transformer(4326, t)
        } yield (x: Double, y: Double) => {
          val (lon, lat) = fwd(x, y)
          bwd(lon, lat)
        }
    }

  def supported(from: Int, to: Int): Boolean = transformer(from, to).isDefined
}

/** `st_transform(geom, fromSrid, toSrid)` — see [[StTransform]]. The
  * srid arguments are validated at PLAN time (unsupported pairs refuse
  * before any task runs); an srid-carrying input struct comes out
  * stamped with `toSrid`. */
case class StTransformExpr(child: Expression, fromSrid: Int, toSrid: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!GisPredicates.isGeomType(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        "st_transform expects a geometry struct, got " +
          child.dataType.simpleString)
    else if (!StTransform.supported(fromSrid, toSrid))
      // refuse at PLAN time, before any task runs
      TypeCheckResult.TypeCheckFailure(
        s"st_transform($fromSrid -> $toSrid): only EPSG:4326 <-> " +
          "EPSG:3857 and EPSG:4326 <-> UTM (EPSG:326zz/327zz) have " +
          "public closed-form math in this build; other CRS pairs " +
          "need a projection engine (proj4) and refuse rather than " +
          "guess")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = child.dataType match {
    case s: StructType if s.fields.length >= 4 =>
      StructType(s.fields.take(3) :+ StructField("srid", IntegerType,
        nullable = false))
    case other => other
  }

  override def nullable: Boolean = child.nullable

  private lazy val fn = StTransform.transformer(fromSrid, toSrid).getOrElse(
    throw new UnsupportedOperationException(
      s"st_transform($fromSrid -> $toSrid): only EPSG:4326 <-> " +
        "EPSG:3857 and EPSG:4326 <-> UTM (EPSG:326zz/327zz) have " +
        "public closed-form math in this build; other CRS pairs need " +
        "a projection engine (proj4) and refuse rather than guess"))

  override protected def nullSafeEval(g: Any): Any = {
    val row = g.asInstanceOf[InternalRow]
    // an srid-carrying geometry must agree with fromSrid: transforming
    // a mis-tagged geometry would be silently wrong AND stamp the
    // result toSrid, laundering the error
    if (child.dataType.asInstanceOf[StructType].fields.length >= 4 &&
        !row.isNullAt(3)) { // null srid field = untagged geometry
      val inSrid = row.getInt(3)
      if (inSrid != fromSrid)
        throw new IllegalArgumentException(
          s"st_transform: geometry carries srid=$inSrid but the call " +
            s"declares fromSrid=$fromSrid — refusing to transform a " +
            "mis-tagged geometry")
    }
    val xs = row.getArray(1)
    val ys = row.getArray(2)
    val n = xs.numElements()
    val ox = new Array[Double](n)
    val oy = new Array[Double](n)
    var i = 0
    while (i < n) {
      val (x, y) = fn(xs.getDouble(i), ys.getDouble(i))
      ox(i) = x; oy(i) = y
      i += 1
    }
    val hasSrid = child.dataType.asInstanceOf[StructType].fields.length >= 4
    val out = new Array[Any](if (hasSrid) 4 else 3)
    out(0) = row.getUTF8String(0)
    out(1) = new GenericArrayData(ox.map(v => v: Any))
    out(2) = new GenericArrayData(oy.map(v => v: Any))
    if (hasSrid) out(3) = toSrid
    new GenericInternalRow(out)
  }

  override def prettyName: String = "st_transform"

  override protected def withNewChildInternal(
      newChild: Expression): StTransformExpr = copy(child = newChild)
}
