package graft

import org.scalatest.funsuite.AnyFunSuite

/** RFC 1035 zone-file reader + the DNS function family (reference
  * contrib/udfs/.../DNSFunctions.java — live resolver calls
  * re-expressed zero-egress as joins against parsed master files). */
class ZoneFileSpec extends AnyFunSuite {
  import TestSpark._
  import graft.sources.{Dns, ZoneFileReader}
  import ZoneFileReader.ZoneRecord

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("zones").toString

  private def write(dir: String, name: String, text: String): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, name), text.getBytes("UTF-8"))

  // GOLDEN content: RFC 1035 §5.3's example zone, verbatim (only the
  // implied origin supplied, as the RFC's surrounding text describes) —
  // content the fixture tooling did NOT produce.
  private val Rfc1035Example =
    """@   IN  SOA     VENERA      Action\.domains (
      |                                 20     ; SERIAL
      |                                 7200   ; REFRESH
      |                                 600    ; RETRY
      |                                 3600000; EXPIRE
      |                                 60)    ; MINIMUM
      |
      |        NS      A.ISI.EDU.
      |        NS      VENERA
      |        NS      VAXA
      |        MX      10      VENERA
      |        MX      20      VAXA
      |
      |A       A       26.3.0.103
      |
      |VENERA  A       10.1.0.52
      |        A       128.9.0.32
      |
      |VAXA    A       10.2.0.27
      |        A       128.9.0.33
      |""".stripMargin

  test("GOLDEN: RFC 1035 §5.3 example zone parses verbatim — parens " +
      "across lines, comments, escaped dot in the SOA rname, owner " +
      "inheritance, relative + absolute names, SOA-minimum default TTL") {
    val recs = ZoneFileReader.parseZone(Rfc1035Example, "ISI.EDU.")
    assert(recs.head == ZoneRecord("isi.edu", 60L, "IN", "SOA",
      "venera.isi.edu action.domains.isi.edu 20 7200 600 3600000 60"))
    // every record inherits the SOA MINIMUM (no TTL stated anywhere)
    assert(recs.forall(_.ttl == 60L))
    assert(recs.filter(_.rtype == "NS").map(_.rdata) ==
      Seq("a.isi.edu", "venera.isi.edu", "vaxa.isi.edu"))
    assert(recs.filter(_.rtype == "MX").map(r => (r.name, r.rdata)) ==
      Seq(("isi.edu", "10 venera.isi.edu"), ("isi.edu", "20 vaxa.isi.edu")))
    assert(recs.filter(_.rtype == "A").map(r => (r.name, r.rdata)) == Seq(
      ("a.isi.edu", "26.3.0.103"), ("venera.isi.edu", "10.1.0.52"),
      ("venera.isi.edu", "128.9.0.32"), ("vaxa.isi.edu", "10.2.0.27"),
      ("vaxa.isi.edu", "128.9.0.33")))
  }

  test("directives and typed rdata: $ORIGIN/$TTL, BIND duration TTLs, " +
      "ttl/class in either order, TXT quoting round-trip with \\DDD " +
      "escapes, AAAA canonicalized per RFC 5952, SRV, unknown types raw") {
    val recs = ZoneFileReader.parseZone(
      """$ORIGIN Example.COM.
        |$TTL 1h30m
        |www     IN 300 A    010.0.0.1   ; ttl after class, zero-padded
        |v6      AAAA 2001:0DB8:0:0:0:0:0:0001
        |mapped  AAAA ::ffff:192.168.0.1
        |txt     TXT  "he said \"hi\"" literal \065
        |_sip._tcp SRV 10 60 5060 sip
        |weird   TYPE65280 \# 2 abcd
        |""".stripMargin)
    val byName = recs.map(r => r.name -> r).toMap
    assert(byName("www.example.com") ==
      ZoneRecord("www.example.com", 300L, "IN", "A", "10.0.0.1"))
    assert(byName("v6.example.com").rdata == "2001:db8::1")
    assert(byName("v6.example.com").ttl == 5400L) // $TTL 1h30m
    assert(byName("mapped.example.com").rdata == "::ffff:c0a8:1")
    assert(byName("txt.example.com").rdata ==
      "\"he said \\\"hi\\\"\" \"literal\" \"A\"") // \065 = 'A'
    assert(byName("_sip._tcp.example.com").rdata ==
      "10 60 5060 sip.example.com")
    assert(byName("weird.example.com").rdata == "# 2 abcd")
  }

  test("refusals: $INCLUDE, relative name with no origin, bad IPv4 " +
      "octet, double '::', unbalanced parens — all loud") {
    def bad(text: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        ZoneFileReader.parseZone(text)
      }
      assert(e.getMessage.toLowerCase.contains(needle), e.getMessage)
    }
    bad("$INCLUDE sub.zone\n", "refused")
    bad("www 300 IN A 1.2.3.4\n", "no $origin in scope")
    bad("$ORIGIN x.\nwww 300 IN A 1.2.3.400\n", "bad ipv4")
    bad("$ORIGIN x.\nwww 300 IN AAAA 1::2::3\n", "bad ipv6")
    bad("$ORIGIN x.\nwww 300 IN SOA a b (20 7200 600 1 1\n", "unbalanced")
  }

  test("distributed read: one row set across several files, each with " +
      "its own $ORIGIN; caller origin covers files without one") {
    val dir = freshDir()
    write(dir, "a.zone", "$ORIGIN a.test.\n$TTL 60\nh1 A 10.0.0.1\n")
    write(dir, "b.zone", "$ORIGIN b.test.\n$TTL 60\nh2 A 10.0.0.2\n")
    val got = ZoneFileReader.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(4))).toSet
    assert(got == Set(("h1.a.test", "10.0.0.1"), ("h2.b.test", "10.0.0.2")))
    val dir2 = freshDir()
    write(dir2, "c.zone", "$TTL 60\nh3 A 10.0.0.3\n")
    val got2 = ZoneFileReader.read(spark, dir2, origin = "c.test")
      .collect().map(_.getString(0)).toSet
    assert(got2 == Set("h3.c.test"))
  }

  test("Dns.hostAddress chases CNAME chains (bounded — loops resolve " +
      "to Unknown), misses return the reference's 'Unknown'") {
    import spark.implicits._
    val zone = ZoneFileReader.read(spark, {
      val d = freshDir()
      write(d, "z.zone",
        """$ORIGIN t.
          |$TTL 60
          |host A 10.0.0.9
          |alias CNAME alias2
          |alias2 CNAME host
          |loopa CNAME loopb
          |loopb CNAME loopa
          |""".stripMargin)
      d
    })
    val names = Seq("ALIAS.t", "host.t", "loopa.t", "nope.t").toDF("h")
    val got = Dns.hostAddress(zone, names, "h").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("ALIAS.t" -> "10.0.0.9", "host.t" -> "10.0.0.9",
      "loopa.t" -> "Unknown", "nope.t" -> "Unknown"))
  }

  test("Dns.hostName resolves v4 AND v6 PTR records through the " +
      "reverse trees; Dns.dnsLookup returns the reference's record " +
      "shape; whois refuses") {
    import spark.implicits._
    val zone = ZoneFileReader.read(spark, {
      val d = freshDir()
      write(d, "rev.zone",
        """$TTL 120
          |9.0.0.10.in-addr.arpa. PTR host.t.
          |1.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.8.b.d.0.1.0.0.2.ip6.arpa. PTR v6host.t.
          |host.t. MX 10 mail.t.
          |""".stripMargin)
      d
    })
    val got = Dns.hostName(zone, Seq("10.0.0.9", "2001:db8::1", "1.1.1.1")
        .toDF("ip"), "ip")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("10.0.0.9" -> "host.t",
      "2001:db8::1" -> "v6host.t", "1.1.1.1" -> "Unknown host"))
    val lk = Dns.dnsLookup(zone, Seq("host.t").toDF("h"), "h", "MX")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4)))
    assert(lk.toSeq == Seq(
      ("host.t 120 IN MX 10 mail.t", 120L, "MX", "10 mail.t")))
    intercept[UnsupportedOperationException] { Dns.whois("example.com") }
  }
}
