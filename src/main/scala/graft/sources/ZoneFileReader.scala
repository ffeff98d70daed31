package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RFC 1035 §5 master-file ("zone file") reader + the DNS function
  * family re-expressed zero-egress.
  *
  * The reference ships live-resolver UDFs
  * (contrib/udfs/.../DNSFunctions.java:39 `get_host_name`, :78
  * `get_host_address`, :116 `dns_lookup` — an InetAddress / dnsjava
  * query per row). A zero-egress engine cannot ask a resolver, but the
  * DATA those resolvers serve has a public on-disk form: the RFC 1035
  * §5.1 master-file format every authoritative server loads. This
  * reader parses zone files into a relation; [[Dns]] re-expresses the
  * lookup functions as joins against it. `whois` stays refused — its
  * registry data has no public on-disk format.
  *
  * Format coverage (RFC 1035 §5.1 + the RFC 2308 `$TTL` directive +
  * BIND duration TTLs like `1h30m`):
  *  - `;` comments (quoted-string-aware), blank lines, `( )`
  *    multi-line grouping, `"…"` quoted strings, `\X` and `\DDD`
  *    escapes;
  *  - `$ORIGIN` / `$TTL`; `$INCLUDE` refuses loudly (a reader must not
  *    chase arbitrary filesystem references from data);
  *  - record lines `[name] [ttl] [class] type rdata` with TTL/class
  *    optional in either order, owner-name inheritance from the
  *    previous record, `@` for the origin, relative-name
  *    qualification;
  *  - typed rdata canonicalization for A (octet-validated), AAAA
  *    (RFC 5952 text form), NS/CNAME/PTR/MX/SRV (names qualified),
  *    SOA (names qualified, duration fields normalized to seconds),
  *    TXT (quoted segments re-rendered escaped); any other type keeps
  *    its raw rdata text so unknown records still surface as rows.
  *
  * Names are canonicalized lowercase without the trailing dot (DNS is
  * case-insensitive; `example.com` not `example.com.`), the root zone
  * rendering as `.`.
  *
  * Scale posture: one task per zone file (master files are not
  * block-splittable — parentheses let one record span lines), the same
  * per-file contract as the other hand-rolled readers. Zone relations
  * are dimension-sized next to a 100 TB fact table, so every [[Dns]]
  * lookup is a broadcast-able equi-join.
  */
object ZoneFileReader {

  case class ZoneRecord(name: String, ttl: Long, rclass: String,
                        rtype: String, rdata: String)

  private case class Token(text: String, quoted: Boolean)

  /** Tokenize one file into logical lines (parens joined, comments
    * stripped, quotes honored). Returns tokens plus whether the
    * physical line began with whitespace (owner-name inheritance). */
  private def logicalLines(text: String, file: String)
      : Seq[(Seq[Token], Boolean)] = {
    val out = Seq.newBuilder[(Seq[Token], Boolean)]
    var i = 0
    val n = text.length
    var depth = 0
    var toks = Seq.newBuilder[Token]
    var count = 0
    var leadingWs = false
    var lineStart = true
    val cur = new StringBuilder
    var curQuoted = false
    var inTok = false
    var line = 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$file:$line: $msg")
    def endTok(): Unit = {
      if (inTok || curQuoted) {
        toks += Token(cur.toString, curQuoted); count += 1
        cur.clear(); inTok = false; curQuoted = false
      }
    }
    def endLine(): Unit = {
      endTok()
      val ts = toks.result()
      if (ts.nonEmpty) out += ((ts, leadingWs))
      toks = Seq.newBuilder[Token]; count = 0
      leadingWs = false; lineStart = true
    }
    def readEscape(): Char = {
      // \DDD = one byte by decimal code; \X = literal X (RFC 1035 §5.1)
      if (i + 1 >= n) fail("dangling backslash")
      val c1 = text.charAt(i + 1)
      if (c1.isDigit) {
        if (i + 3 >= n || !text.charAt(i + 2).isDigit ||
            !text.charAt(i + 3).isDigit)
          fail("\\DDD escape needs three digits")
        val v = (text.substring(i + 1, i + 4)).toInt
        if (v > 255) fail(s"\\DDD escape $v out of byte range")
        i += 4; v.toChar
      } else { i += 2; c1 }
    }
    while (i < n) {
      val c = text.charAt(i)
      if (c == '"') {
        // quoted string: one token, escapes honored, comments inert
        if (inTok) fail("quote inside an unquoted token")
        i += 1
        var closed = false
        while (i < n && !closed) {
          val q = text.charAt(i)
          if (q == '\\') cur.append(readEscape())
          else if (q == '"') { closed = true; i += 1 }
          else if (q == '\n') fail("newline inside quoted string")
          else { cur.append(q); i += 1 }
        }
        if (!closed) fail("unterminated quoted string")
        curQuoted = true
        endTok()
        lineStart = false
      } else if (c == '\\') { inTok = true; cur.append(readEscape()) }
      else if (c == ';') { // comment to end of physical line
        endTok()
        while (i < n && text.charAt(i) != '\n') i += 1
      } else if (c == '\n') {
        line += 1
        endTok()
        if (depth == 0) endLine() else lineStart = false
        i += 1
      } else if (c == '(') {
        endTok(); depth += 1; i += 1; lineStart = false
      } else if (c == ')') {
        endTok()
        if (depth == 0) fail("unbalanced ')'")
        depth -= 1; i += 1
      } else if (c == ' ' || c == '\t' || c == '\r') {
        if (lineStart && count == 0 && !inTok) leadingWs = true
        endTok(); i += 1
      } else { inTok = true; lineStart = false; cur.append(c); i += 1 }
    }
    if (depth != 0) fail("unbalanced '(' at end of file")
    endLine()
    out.result()
  }

  private val ClassNames = Set("IN", "CS", "CH", "HS")
  private val DurationRe = "(?i)^(\\d+[wdhms])+$".r
  private val DurationPartRe = "(?i)(\\d+)([wdhms])".r

  /** TTL / SOA-timer text: plain seconds or BIND duration (1w2d3h). */
  def parseTtl(s: String): Option[Long] =
    if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toLong)
    else if (DurationRe.findFirstIn(s).isDefined)
      Some(DurationPartRe.findAllMatchIn(s).map { m =>
        val v = m.group(1).toLong
        m.group(2).toLowerCase match {
          case "w" => v * 604800L; case "d" => v * 86400L
          case "h" => v * 3600L; case "m" => v * 60L; case "s" => v
        }
      }.sum)
    else None

  /** Qualify a (possibly relative) domain name against `origin`
    * (canonical form: lowercase, no trailing dot, root = "."). */
  private def qualify(raw: String, origin: Option[String],
                      where: String): String = {
    val name = raw.toLowerCase
    if (name == "@")
      origin.getOrElse(throw new IllegalArgumentException(
        s"$where: '@' with no $$ORIGIN in scope"))
    else if (name == ".") "."
    else if (name.endsWith(".")) name.dropRight(1)
    else origin match {
      case Some(".") => name
      case Some(o) => s"$name.$o"
      case None => throw new IllegalArgumentException(
        s"$where: relative name '$raw' with no $$ORIGIN in scope — " +
          "pass origin= or add a $ORIGIN directive")
    }
  }

  private def canonV4(s: String, where: String): String = {
    val parts = s.split("\\.", -1)
    require(parts.length == 4 && parts.forall(p =>
      p.nonEmpty && p.forall(_.isDigit) && p.toInt <= 255),
      s"$where: bad IPv4 address '$s'")
    parts.map(_.toInt).mkString(".")
  }

  /** Parse an IPv6 literal to 8 groups; render per RFC 5952 (lowercase,
    * longest zero run compressed, leftmost on ties, runs of one group
    * never compressed). */
  def canonV6(s: String, where: String = "AAAA"): String = {
    def fail(): Nothing =
      throw new IllegalArgumentException(s"$where: bad IPv6 address '$s'")
    val dc = s.indexOf("::")
    if (dc != s.lastIndexOf("::")) fail()
    def groups(part: String): Seq[Int] =
      if (part.isEmpty) Nil
      else part.split(":", -1).toSeq.flatMap { g =>
        if (g.contains('.')) {
          // trailing dotted-quad (RFC 4291 §2.2.3, ::ffff:1.2.3.4)
          if (part.split(":", -1).last != g) fail()
          val o = g.split("\\.", -1)
          if (o.length != 4 || o.exists(p => p.isEmpty ||
              !p.forall(_.isDigit) || p.toInt > 255)) fail()
          Seq((o(0).toInt << 8) | o(1).toInt, (o(2).toInt << 8) | o(3).toInt)
        } else {
          if (g.isEmpty || g.length > 4 ||
              !g.forall(c => c.isDigit || ('a' to 'f').contains(c.toLower)))
            fail()
          Seq(Integer.parseInt(g, 16))
        }
      }
    val full: Seq[Int] =
      if (dc >= 0) {
        val l = groups(s.substring(0, dc))
        val r = groups(s.substring(dc + 2))
        if (l.length + r.length > 7) fail()
        l ++ Seq.fill(8 - l.length - r.length)(0) ++ r
      } else { val g = groups(s); if (g.length != 8) fail(); g }
    // longest zero run (>= 2), leftmost wins
    var best = -1; var bestLen = 1
    var i = 0
    while (i < 8) {
      if (full(i) == 0) {
        var j = i; while (j < 8 && full(j) == 0) j += 1
        if (j - i > bestLen) { best = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    def hex(g: Seq[Int]) = g.map(Integer.toHexString).mkString(":")
    if (best < 0) hex(full)
    else {
      val l = hex(full.take(best)); val r = hex(full.drop(best + bestLen))
      s"$l::$r"
    }
  }

  /** Full 32-nibble reversed form for ip6.arpa PTR names. */
  private[sources] def v6Nibbles(s: String): String = {
    val full = canonV6(s, "ip6")
    // re-expand the canonical form (it may be compressed)
    val dc = full.indexOf("::")
    val groups: Seq[Int] =
      if (dc >= 0) {
        def g(p: String) = if (p.isEmpty) Nil
          else p.split(":", -1).toSeq.map(Integer.parseInt(_, 16))
        val l = g(full.substring(0, dc)); val r = g(full.substring(dc + 2))
        l ++ Seq.fill(8 - l.length - r.length)(0) ++ r
      } else full.split(":", -1).toSeq.map(Integer.parseInt(_, 16))
    groups.flatMap(v => f"$v%04x").reverse.mkString(".")
  }

  private def renderTxt(segs: Seq[Token]): String =
    segs.map(t => "\"" + t.text.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\"").mkString(" ")

  /** Parse one master file's text. `origin` seeds `$ORIGIN` (canonical
    * or dot-terminated; empty = none until the file declares one). */
  def parseZone(text: String, origin: String = "",
                file: String = "<zone>"): Seq[ZoneRecord] = {
    var org: Option[String] =
      if (origin.isEmpty) None
      else Some(if (origin.endsWith(".") && origin != ".")
        origin.dropRight(1).toLowerCase else origin.toLowerCase)
    var defaultTtl: Option[Long] = None
    var lastTtl: Option[Long] = None
    var soaMinimum: Option[Long] = None
    var lastOwner: Option[String] = None
    val out = Seq.newBuilder[ZoneRecord]
    for ((toks, leadingWs) <- logicalLines(text, file)) {
      val head = toks.head.text
      if (!toks.head.quoted && head.startsWith("$")) {
        head.toUpperCase match {
          case "$ORIGIN" =>
            require(toks.length == 2, s"$file: $$ORIGIN needs one name")
            org = Some(qualify(toks(1).text, org, file))
          case "$TTL" =>
            require(toks.length == 2, s"$file: $$TTL needs one value")
            defaultTtl = Some(parseTtl(toks(1).text).getOrElse(
              throw new IllegalArgumentException(
                s"$file: bad $$TTL '${toks(1).text}'")))
          case "$INCLUDE" => throw new IllegalArgumentException(
            s"$file: $$INCLUDE is refused — the reader does not chase " +
              "filesystem references out of data; inline the file or " +
              "read the directory")
          case d => throw new IllegalArgumentException(
            s"$file: unknown directive $d")
        }
      } else {
        // [name] [ttl] [class] type rdata — owner inherited when the
        // line began with whitespace
        var rest = toks
        val owner =
          if (leadingWs) lastOwner.getOrElse(
            throw new IllegalArgumentException(
              s"$file: first record cannot inherit an owner name"))
          else {
            val o = qualify(rest.head.text, org, file)
            rest = rest.tail
            o
          }
        lastOwner = Some(owner)
        // up to one TTL and one class, either order
        var ttl: Option[Long] = None
        var rclass: Option[String] = None
        var done = false
        while (!done && rest.nonEmpty) {
          val t = rest.head.text
          val up = t.toUpperCase
          if (!rest.head.quoted && rclass.isEmpty &&
              ClassNames.contains(up)) { rclass = Some(up); rest = rest.tail }
          else if (!rest.head.quoted && ttl.isEmpty &&
              parseTtl(t).isDefined && t.head.isDigit) {
            ttl = parseTtl(t); rest = rest.tail
          } else done = true
        }
        require(rest.nonEmpty, s"$file: record for $owner has no type")
        val rtype = rest.head.text.toUpperCase
        val rd = rest.tail
        def one(what: String): String = {
          require(rd.length == 1, s"$file: $rtype for $owner needs " +
            s"exactly one $what field, got ${rd.length}")
          rd.head.text
        }
        val rdata = rtype match {
          case "A" => canonV4(one("address"), s"$file:$owner")
          case "AAAA" => canonV6(one("address"), s"$file:$owner")
          case "NS" | "CNAME" | "PTR" =>
            qualify(one("name"), org, s"$file:$owner")
          case "MX" =>
            require(rd.length == 2,
              s"$file: MX for $owner needs preference + exchange")
            require(rd(0).text.forall(_.isDigit),
              s"$file: MX preference '${rd(0).text}' is not a number")
            s"${rd(0).text.toInt} ${qualify(rd(1).text, org, file)}"
          case "SRV" =>
            require(rd.length == 4,
              s"$file: SRV for $owner needs pri weight port target")
            require(rd.take(3).forall(_.text.forall(_.isDigit)),
              s"$file: SRV numeric fields malformed for $owner")
            (rd.take(3).map(_.text.toInt) :+
              qualify(rd(3).text, org, file)).mkString(" ")
          case "SOA" =>
            require(rd.length == 7,
              s"$file: SOA needs 7 fields, got ${rd.length}")
            val times = rd.drop(2).map(t => parseTtl(t.text).getOrElse(
              throw new IllegalArgumentException(
                s"$file: bad SOA timer '${t.text}'")))
            (Seq(qualify(rd(0).text, org, file),
              qualify(rd(1).text, org, file)) ++ times.map(_.toString))
              .mkString(" ")
          case "TXT" =>
            require(rd.nonEmpty, s"$file: TXT for $owner is empty")
            renderTxt(rd)
          case _ => rd.map(_.text).mkString(" ") // unknown type: raw
        }
        if (rtype == "SOA")
          soaMinimum = Some(rdata.split(" ").last.toLong)
        // TTL precedence: explicit > $TTL (RFC 2308) > last explicit
        // (RFC 1035 §5.1) > SOA MINIMUM (pre-2308 — the RFC's own §5.3
        // example zone states no TTL anywhere and relies on this)
        val effTtl = ttl.orElse(defaultTtl).orElse(lastTtl)
          .orElse(soaMinimum).getOrElse(
            throw new IllegalArgumentException(
              s"$file: record for $owner has no TTL and no $$TTL / " +
                "SOA-minimum default"))
        if (ttl.isDefined) lastTtl = ttl
        out += ZoneRecord(owner, effTtl, rclass.getOrElse("IN"),
          rtype, rdata)
      }
    }
    out.result()
  }

  /** Read `.zone` / `.db` master files under `path` (or one explicit
    * file) as a DataFrame (name, ttl, rclass, rtype, rdata). One task
    * per file. `origin` seeds `$ORIGIN` for every file (master files
    * distributed without their named.conf stanza usually need one);
    * empty = each file must declare its own before any relative name. */
  def read(spark: SparkSession, path: String,
           origin: String = ""): DataFrame = {
    import spark.implicits._
    val files = FileList.resolve(spark, path, Set(".zone", ".db"))
    val confB = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    FileList.asDataset(spark, files)
      .mapPartitions { paths =>
        val conf = confB.value.value
        paths.flatMap { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val fs = p.getFileSystem(conf)
          val len = fs.getFileStatus(p).getLen
          require(len <= (1L << 30), s"$f: zone file over 1 GiB — split " +
            "the zone (master files parse whole-file per task)")
          val in = fs.open(p)
          val bytes = try {
            val b = new Array[Byte](len.toInt)
            in.readFully(0, b); b
          } finally in.close()
          parseZone(new String(bytes, "UTF-8"), origin, f)
        }
      }
      .toDF()
  }
}

/** The reference's DNS lookup functions as joins against a zone
  * relation (see [[ZoneFileReader]] for why this is the zero-egress
  * re-expression). Zones are dimension-sized, so every lookup is a
  * broadcast-able equi-join against the fact side — no per-row
  * resolver round-trip, no shuffle of the big side.
  */
object Dns {

  /** `dns_lookup(name, type)` (DNSFunctions.java:116): every matching
    * record for each input name, as the reference's per-record map
    * shape (name, record, ttl, type, rdata) — `record` is the full
    * master-file line rendering. Names match case-insensitively. */
  def dnsLookup(zone: DataFrame, names: DataFrame, nameCol: String,
                rtype: String): DataFrame = {
    val recs = zone.filter(upper(col("rtype")) === rtype.toUpperCase)
      .select(col("name").as("_zn"), col("ttl"), col("rclass"),
        col("rtype"), col("rdata"))
    names.join(recs, lower(col(nameCol)) === col("_zn"), "inner")
      .withColumn("record", concat_ws(" ", col("_zn"), col("ttl"),
        col("rclass"), col("rtype"), col("rdata")))
      .select(names.columns.map(col) ++ Seq(col("record"), col("ttl"),
        col("rtype").as("type"), col("rdata")): _*)
  }

  /** `get_host_address` (DNSFunctions.java:78): A lookup with bounded
    * CNAME chasing (aliases resolve like a resolver would; depth-capped
    * so alias loops terminate). Adds `addrCol`; misses get "Unknown" —
    * the reference's miss value. Deterministic: the lexicographically
    * smallest address wins when a name holds several A records. */
  def hostAddress(zone: DataFrame, names: DataFrame, nameCol: String,
                  addrCol: String = "address",
                  maxCnameDepth: Int = 8): DataFrame = {
    val a = zone.filter(upper(col("rtype")) === "A")
      .groupBy(col("name").as("_an")).agg(min("rdata").as("_addr"))
    val cn = zone.filter(upper(col("rtype")) === "CNAME")
      .groupBy("name").agg(min("rdata").as("_tgt0"))
    var cur = names.withColumn("_n", lower(col(nameCol)))
    for (i <- 1 to maxCnameDepth) {
      // fresh per-iteration aliases: re-joining one frame N times with
      // recycled column refs is the ambiguous-self-join trap
      val cni = cn.select(col("name").as(s"_cn$i"),
        col("_tgt0").as(s"_tgt$i"))
      cur = cur.join(cni, col("_n") === col(s"_cn$i"), "left")
        .withColumn("_n2", coalesce(col(s"_tgt$i"), col("_n")))
        .drop("_n", s"_cn$i", s"_tgt$i").withColumnRenamed("_n2", "_n")
    }
    cur.join(a, col("_n") === col("_an"), "left")
      .withColumn(addrCol, coalesce(col("_addr"), lit("Unknown")))
      .drop("_n", "_an", "_addr")
  }

  /** `get_host_name` / `reverse_ip_lookup` (DNSFunctions.java:39): PTR
    * lookup through the standard reverse trees (in-addr.arpa /
    * ip6.arpa). Adds `hostCol`; misses get "Unknown host" — the
    * reference's miss value. */
  def hostName(zone: DataFrame, ips: DataFrame, ipCol: String,
               hostCol: String = "hostname"): DataFrame = {
    val revName = udf { (ip: String) =>
      if (ip == null) null
      else if (ip.contains(":"))
        ZoneFileReader.v6Nibbles(ip) + ".ip6.arpa"
      else ip.split("\\.", -1).reverse.mkString(".") + ".in-addr.arpa"
    }
    val ptr = zone.filter(upper(col("rtype")) === "PTR")
      .groupBy(col("name").as("_pn")).agg(min("rdata").as("_host"))
    ips.withColumn("_rev", revName(col(ipCol)))
      .join(ptr, col("_rev") === col("_pn"), "left")
      .withColumn(hostCol, coalesce(col("_host"), lit("Unknown host")))
      .drop("_rev", "_pn", "_host")
  }

  /** The reference's `whois` (DNSFunctions.java:208) stays refused:
    * registry responses have no public on-disk format to decode, and a
    * zero-egress engine cannot query port 43. */
  def whois(domain: String): Nothing =
    throw new UnsupportedOperationException(
      "whois is not supported zero-egress: WHOIS registry data has no " +
        "public on-disk format (the DNS functions work against RFC 1035 " +
        "zone files — see ZoneFileReader)")
}
