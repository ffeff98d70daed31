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
  /** FULL-STRING anchored, like the reference: Drill's regexp_matches
    * runs matcher.matches() (StringFunctions.java RegexpMatches), not a
    * substring find — an unanchored rlike returned true for any
    * substring hit. Same anchoring recipe as [[similarTo]]. */
  def regexpMatches(c: Column, pattern: String): Column =
    c.rlike("\\A(?:" + pattern + ")\\z")
  def regexpReplace(c: Column, p: String, r: String): Column =
    regexp_replace(c, p, r)
  def regexpExtractAll(c: Column, p: String): Column =
    call_function("regexp_extract_all", c, lit(p))

  // ---- math (Drill MathFunctions.java) ----
  /** Drill TRUNC(x, n): truncate toward zero at n decimal places —
    * BigDecimal.setScale(n, DOWN) semantics via EXACT decimal
    * arithmetic: the old double multiply turned 0.29*100 into
    * 28.999... (emitting 0.28) and overflowed the ANSI long cast on
    * values past 2^63/10^n. Decimal(38,12) bounds the representable
    * input at ~1e26 — beyond any double's meaningful decimal places. */
  def truncTo(c: Column, n: Int): Column = {
    val d = c.cast(org.apache.spark.sql.types.DecimalType(38, 12))
    // negative scale is Drill-legal (trunc(1234.5, -2) = 1200):
    // BigDecimal.pow refuses a negative exponent, so express 10^n as a
    // division for n < 0 — same truncate-toward-zero semantics
    val p = java.math.BigDecimal.TEN.pow(math.abs(n))
    val scaled = if (n >= 0) d * lit(p) else d / lit(p)
    val trunced = when(c >= 0, floor(scaled)).otherwise(ceil(scaled))
    (if (n >= 0) trunced / lit(p) else trunced * lit(p)).cast("double")
  }

  // ---- date/time (Drill DateTypeFunctions.java, LastDayFunction.java) ----
  def lastDay(c: Column): Column = last_day(c)
  /** Drill AGE(t1, t2): a full INTERVAL with sub-day precision —
    * timestamp subtraction yields Spark's DayTimeIntervalType (the old
    * datediff binding rounded every sub-day duration to whole calendar
    * days). Date inputs promote to midnight timestamps first. */
  def age(a: Column, b: Column): Column =
    a.cast("timestamp") - b.cast("timestamp")
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
  /** Parity note: matches the SQL-side convert_from(x,'JSON')
    * registration (map<string,string>) — a bigint-valued variant nulled
    * every non-integer value and disagreed with the SQL surface. */
  def convertFromJsonMap(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType))
  def convertToJson(c: Column): Column = to_json(c)

  /** Drill typeof() — runtime type name of a column value. */
  def typeOf(c: Column): Column = call_function("typeof", c)

  /** SQL:99 SIMILAR TO (ref exec/.../expr/fn/impl/StringFunctions.java
    * `similar`/`similar_to` + RegexpUtil.sqlToRegexSimilar — Calcite's
    * translation): `%` -> `.*`, `_` -> `.`, `\` and `$` escape for Java,
    * bracket enumerations and the regex-ish SQL specials (| * + ? { } (
    * )) pass through, optional escape character. Full-string anchored
    * like the reference's matcher.matches(). */
  def sqlToRegexSimilar(sqlPattern: String, escapeChar: Char = 0): String = {
    val out = new StringBuilder
    var insideEnum = false
    var i = 0
    val len = sqlPattern.length
    while (i < len) {
      val c = sqlPattern.charAt(i)
      if (escapeChar != 0 && c == escapeChar) {
        require(i < len - 1, s"invalid escape sequence at $i in '$sqlPattern'")
        val n = sqlPattern.charAt(i + 1)
        if ("[]()|^-+*_%?{}".indexOf(n) >= 0) {
          // '-' is in the reference's JAVA_REGEX_SPECIALS too: an
          // escaped dash inside an enumeration must stay LITERAL, not
          // become a character range ('b' SIMILAR TO '[a!-c]' ESCAPE
          // '!' is false per SQL:99)
          if ("[]()|^$.{}\\*+?-".indexOf(n) >= 0) out.append('\\')
          out.append(n)
        } else if (n == escapeChar) out.append(n)
        else throw new IllegalArgumentException(
          s"invalid escape sequence at $i in '$sqlPattern'")
        i += 1
      } else if (insideEnum) {
        if (c == ']') insideEnum = false
        out.append(c)
      } else c match {
        case '_' => out.append('.')
        case '%' => out.append(".*")
        case '[' => insideEnum = true; out.append('[')
        case ']' => throw new IllegalArgumentException(
          s"invalid similar pattern (unmatched ']') at $i in '$sqlPattern'")
        case '\\' => out.append("\\\\")
        case '$' => out.append("\\$")
        case other => out.append(other)
      }
      i += 1
    }
    require(!insideEnum, s"invalid similar pattern (unclosed '[') in '$sqlPattern'")
    out.toString
  }

  /** `similar_to(str, pattern)` — the predicate form; pattern is a
    * literal (as in the reference, where @Param(constant) compiles it
    * once at setup). */
  def similarTo(c: Column, pattern: String, escapeChar: Char = 0): Column =
    c.rlike("\\A(?:" + sqlToRegexSimilar(pattern, escapeChar) + ")\\z")

  // ---- contrib/udfs DateFunctions.java tail ----

  /** Drill's `nearest_date(ts, interval)` (ref contrib/udfs/
    * DateConversionUtils.java): floor `ts` to the first instant of its
    * period — the time-series GROUP BY helper. All thirteen reference
    * intervals; the sub-hour ones are integer floor-division on epoch
    * seconds (positive-epoch data, same floor the reference computes
    * field-wise). */
  def nearestDate(ts: Column, interval: String): Column = {
    // LOCAL-field floor like the reference (which computes on
    // LocalDateTime fields): epoch-based flooring would misalign
    // sub-hour buckets in zones whose UTC offset is not a bucket
    // multiple (+05:45 etc.), so floor the minute/second fields
    // against the already-truncated hour/minute instead
    def minuteBucket(m: Int): Column = try_add(date_trunc("hour", ts),
      make_interval(lit(0), lit(0), lit(0), lit(0), lit(0),
        floor(minute(ts) / m).cast("int") * m))
    def secondBucket(s: Int): Column = try_add(date_trunc("minute", ts),
      make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
        (floor(second(ts) / s).cast("int") * s).cast("decimal(18,6)")))
    // Locale.ROOT: tr/az default locales dot-capitalize 'i' and a valid
    // lowercase "minute" would fail (the convEnc precedent)
    interval.toUpperCase(java.util.Locale.ROOT) match {
      case "YEAR"        => date_trunc("year", ts)
      case "QUARTER"     => date_trunc("quarter", ts)
      case "MONTH"       => date_trunc("month", ts)
      // previousOrSame(SUNDAY) at midnight = Monday-trunc of (ts + 1d),
      // shifted back a day; Monday-week is Spark's own week trunc
      case "WEEK_SUNDAY" =>
        date_trunc("week", ts + expr("INTERVAL 1 DAY")) - expr("INTERVAL 1 DAY")
      case "WEEK_MONDAY" => date_trunc("week", ts)
      case "DAY"         => date_trunc("day", ts)
      case "HOUR"        => date_trunc("hour", ts)
      case "HALF_HOUR"      => minuteBucket(30)
      case "QUARTER_HOUR"   => minuteBucket(15)
      case "MINUTE"      => date_trunc("minute", ts)
      case "HALF_MINUTE"    => secondBucket(30)
      case "QUARTER_MINUTE" => secondBucket(15)
      case "SECOND"      => date_trunc("second", ts)
      case other => throw new IllegalArgumentException(
        s"[$other] is not a valid time statement. Expecting: YEAR, " +
          "QUARTER, MONTH, WEEK_SUNDAY, WEEK_MONDAY, DAY, HOUR, " +
          "HALF_HOUR, QUARTER_HOUR, MINUTE, HALF_MINUTE, QUARTER_MINUTE, SECOND")
    }
  }

  /** Drill's `year_week(date)` (ref contrib/udfs DateFunctions.java
    * YearWeekFunction): calendar year * 100 + ISO week number —
    * faithfully including the reference's year-boundary quirk (Jan 1 in
    * ISO week 52/53 reports the NEW year with the old week). */
  def yearWeek(c: Column): Column =
    (year(c) * 100 + weekofyear(c)).cast("int")

  /** Drill's `percent_change(old, new)` (ref contrib/udfs
    * DistributionFunctions.java): (new-old)*100/old, with the
    * reference's zero handling — either side zero yields 0. */
  def percentChange(oldV: Column, newV: Column): Column =
    when(newV === 0 || oldV === 0, lit(0.0))
      .otherwise((newV - oldV) * 100.0 / oldV)
}
