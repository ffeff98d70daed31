package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-agent classification, re-expressed from Drill's parse_user_agent
  * (reference contrib/udfs/.../UserAgentFunctions.java). Drill delegates
  * to the yauaa analyzer (thousands of learned rules); the graft version
  * is a deterministic ordered rule set over the major browser / OS /
  * device families — declared as pure Column expressions (regexp + CASE)
  * so the whole parse is codegen'd, broadcast-free, and reproducible by
  * any SQL engine for the correctness gate.
  *
  * Rule order is semantic and mirrored verbatim in the oracle SQL:
  * robots are checked first (their UA often embeds browser tokens);
  * Edge/Opera before Chrome (they embed "Chrome/"); Chrome before
  * Safari (Chrome embeds "Safari/"); Android before Linux.
  */
object UserAgent {

  private val BotRe = "(?i)(bot|crawler|spider|slurp|curl|wget|python-requests|headless)"

  def isBot(ua: Column): Column = ua.rlike(BotRe)

  def browser(ua: Column): Column =
    when(isBot(ua), "Robot")
      // the whole family: Chromium Edge (Edg/), legacy EdgeHTML
      // (Edge/), Android (EdgA/), iOS (EdgiOS/) — all embed Chrome
      // tokens and misclassified as Chrome when only Edg/ matched
      .when(ua.contains("Edg/") || ua.contains("Edge/") ||
        ua.contains("EdgA/") || ua.contains("EdgiOS/"), "Edge")
      .when(ua.contains("OPR/"), "Opera")
      .when(ua.contains("Chrome/"), "Chrome")
      .when(ua.contains("Firefox/"), "Firefox")
      .when(ua.contains("Safari/") && ua.contains("Version/"), "Safari")
      .when(ua.contains("MSIE ") || ua.contains("Trident/"), "IE")
      .otherwise("Other")

  def browserVersion(ua: Column): Column =
    when(isBot(ua), "")
      .when(ua.contains("Edg/") || ua.contains("Edge/") ||
        ua.contains("EdgA/") || ua.contains("EdgiOS/"),
        regexp_extract(ua, "Edg(?:e|A|iOS)?/([0-9.]+)", 1))
      .when(ua.contains("OPR/"), regexp_extract(ua, "OPR/([0-9.]+)", 1))
      .when(ua.contains("Chrome/"), regexp_extract(ua, "Chrome/([0-9.]+)", 1))
      .when(ua.contains("Firefox/"), regexp_extract(ua, "Firefox/([0-9.]+)", 1))
      .when(ua.contains("Safari/") && ua.contains("Version/"),
        regexp_extract(ua, "Version/([0-9.]+)", 1))
      .when(ua.contains("MSIE "), regexp_extract(ua, "MSIE ([0-9.]+)", 1))
      .when(ua.contains("Trident/"), regexp_extract(ua, "rv:([0-9.]+)", 1))
      .otherwise("")

  def osName(ua: Column): Column =
    when(ua.contains("Windows NT"), "Windows")
      .when(ua.contains("Android"), "Android")
      .when(ua.contains("iPhone") || ua.contains("iPad") || ua.contains("iPod"), "iOS")
      .when(ua.contains("Mac OS X"), "macOS")
      .when(ua.contains("Linux"), "Linux")
      .otherwise("Other")

  def deviceClass(ua: Column): Column =
    when(isBot(ua), "Robot")
      .when(ua.contains("iPad") ||
        (ua.contains("Android") && !ua.contains("Mobile")), "Tablet")
      .when(ua.contains("iPhone") || ua.contains("iPod") ||
        ua.contains("Mobile"), "Phone")
      .otherwise("Desktop")

  /** The full parse as one struct column — Drill's map-returning
    * parse_user_agent(ua); field access is parse_user_agent(ua).browser
    * etc. The single-field two-arg Drill form is the same projection. */
  def parseUserAgent(ua: Column): Column =
    // NULL user agents parse to a NULL struct — letting the CASE chains
    // fall through classified every null UA as an 'Other'/Desktop hit
    // with a contradictory null is_bot
    when(ua.isNotNull, struct(
      browser(ua).as("browser"),
      browserVersion(ua).as("browser_version"),
      osName(ua).as("os"),
      deviceClass(ua).as("device_class"),
      isBot(ua).as("is_bot")))
}
