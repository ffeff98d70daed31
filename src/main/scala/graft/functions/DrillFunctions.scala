package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Drill's built-in scalar function surface, re-expressed over Spark's
  * codegen'd `org.apache.spark.sql.functions` (no UDFs in the hot path).
  *
  * Reference inventory: exec/java-exec/src/main/java/org/apache/drill/exec/
  * expr/fn/impl/{StringFunctions.java, MathFunctions.java,
  * DateTypeFunctions.java, Hash64Functions.java, ParseUrlFunction.java,
  * ParseQueryFunction.java, Mappify.java}. Each Drill function maps to a
  * native Catalyst expression so whole-stage codegen stays intact.
  */
object DrillFunctions {

  // ---- string (Drill StringFunctions.java) ----
  def charLength(c: Column): Column = length(c)
  def position(sub: Column, in: Column): Column = locate_(sub, in)
  private def locate_(sub: Column, in: Column): Column =
    call_function("position", sub, in)
  def splitPart(c: Column, sep: String, n: Int): Column =
    call_function("split_part", c, lit(sep), lit(n))
  def strpos(haystack: Column, needle: Column): Column =
    call_function("instr", haystack, needle)
  def ilike(c: Column, pattern: String): Column =
    call_function("ilike", c, lit(pattern))

  // ---- regex (Drill RegexpUtil / SqlPattern*) ----
  def regexpMatches(c: Column, pattern: String): Column = c.rlike(pattern)
  def regexpReplace(c: Column, p: String, r: String): Column =
    regexp_replace(c, p, r)
  def regexpExtractAll(c: Column, p: String): Column =
    call_function("regexp_extract_all", c, lit(p))

  // ---- math (Drill MathFunctions.java) ----
  /** Drill TRUNC(x, n): truncate toward zero at n decimal places. */
  def truncTo(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    (c * f).cast("long").cast("double") / f
  }

  // ---- date/time (Drill DateTypeFunctions.java, LastDayFunction.java) ----
  def lastDay(c: Column): Column = last_day(c)
  def age(a: Column, b: Column): Column = datediff(a, b)
  def dateTruncMonth(c: Column): Column = trunc(c, "month")

  // ---- hash (Drill Hash64Functions.java, XXHash.java, MurmurHash3.java) ----
  def hash32(cols: Column*): Column = hash(cols: _*)
  def hash64(cols: Column*): Column = xxhash64(cols: _*)
  def md5Hex(c: Column): Column = md5(c)
  def sha1Hex(c: Column): Column = sha1(c)
  def sha256Hex(c: Column): Column = sha2(c, 256)

  // ---- URL (Drill ParseUrlFunction.java / ParseQueryFunction.java) ----
  def parseUrlHost(c: Column): Column = parse_url(c, lit("HOST"))
  def parseUrlPath(c: Column): Column = parse_url(c, lit("PATH"))
  def parseUrlQuery(c: Column): Column = parse_url(c, lit("QUERY"))
  def parseQueryParam(c: Column, key: String): Column =
    parse_url(c, lit("QUERY"), lit(key))

  // ---- complex / schema-on-read (Drill Mappify.java = kvgen, conv/) ----
  /** Drill kvgen(map) — map column to rows of (key, value) happens via
    * explode at the DataFrame level; this builds the map from a JSON
    * string column (Drill's convert_from(json)). */
  def convertFromJsonMap(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.LongType))
  def convertToJson(c: Column): Column = to_json(c)

  /** Drill typeof() — runtime type name of a column value. */
  def typeOf(c: Column): Column = call_function("typeof", c)
}
