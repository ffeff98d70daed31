package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal GIS surface (reference: contrib/udfs/src/main/java/.../gis/ —
  * STPointFunc.java, STDistance.java, STDWithin.java, STXFunc/STYFunc):
  * point construction, great-circle distance, and distance/bbox
  * predicates as pure codegen'd expressions. (Full geometry — polygons,
  * WKT — needs a geometry library this container doesn't ship.)
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
    lit(2 * EarthRadiusKm) * asin(sqrt(h))
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
}
