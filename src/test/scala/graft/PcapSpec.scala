package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PcapReader

class PcapSpec extends AnyFunSuite {
  import TestSpark._

  test("reads the committed capture: framing, IPv4 decode, ports") {
    val df = PcapReader.read(spark, s"$Fixtures/sample.pcap")
    val rows = df.orderBy("ts_sec").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1700000001L && rows(0).getLong(1) == 111111L)
    assert(rows(0).getString(3) == "10.0.0.1" && rows(0).getString(4) == "10.0.0.2")
    assert(rows(0).getString(5) == "TCP")
    assert(rows(0).getInt(6) == 443 && rows(0).getInt(7) == 51000)
    assert(rows(2).getString(5) == "UDP" && rows(2).getInt(6) == 53)
    assert(rows(2).getInt(2) == 44) // eth(14) + ipv4(20) + udp(8) + 2 payload
  }

  test("pdf reader extracts Tj text from plain and FlateDecode streams") {
    val df = graft.sources.PdfReader.read(spark, s"$Fixtures/sample.pdf")
    val rows = df.orderBy("stream_idx", "text_idx").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (0, 0, "Hello graft"), (0, 1, "Line two (escaped)"),
      (1, 0, "Compressed page"), (1, 1, "Deflate works")))
  }

  test("DSv2 connector: spark.read.format(graft-pcap) with column pruning") {
    val v2 = spark.read.format("graft-pcap").load(s"$Fixtures/sample.pcap")
    val direct = PcapReader.read(spark, s"$Fixtures/sample.pcap")
    assert(v2.schema == direct.schema)
    assert(v2.orderBy("ts_sec").collect().toSeq ==
      direct.orderBy("ts_sec").collect().toSeq)
    // projection prunes at the scan: the physical read schema shrinks
    val pruned = v2.select("src_ip", "dst_port")
    pruned.collect()
    val scanSchema = pruned.queryExecution.executedPlan.collectLeaves()
      .head.schema.fieldNames.toSet
    assert(scanSchema == Set("src_ip", "dst_port"), s"got $scanSchema")
  }

  test("pdf TJ arrays keep every string; operators across newlines count") {
    import graft.sources.PdfReader
    // kerned TJ array: both fragments are shown text
    assert(PdfReader.textOps("BT [(Hel) -20 (lo)] TJ ET") == Seq("Hel", "lo"))
    // operator separated by a newline (legal whitespace per ISO 32000)
    assert(PdfReader.textOps("BT (text)\nTj ET") == Seq("text"))
    // a string with no showing operator is NOT text
    assert(PdfReader.textOps("/Title (metadata only) /Author (x)") == Seq.empty)
    // array not followed by TJ shows nothing
    assert(PdfReader.textOps("[(a) (b)] def") == Seq.empty)
  }

  test("xlsx inline strings concatenate rich-text runs") {
    import graft.sources.XlsxReader
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val sheet = """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>""" +
      """<row r="2"><c r="A2" t="inlineStr"><is><r><t>Hello </t></r><r><t>World</t></r></is></c></row>""" +
      """</sheetData></worksheet>"""
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(sheet.getBytes("UTF-8")); z.closeEntry(); z.close()
    val (headers, rows) = XlsxReader.parseGrid(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(headers.toSeq == Seq("h"))
    assert(rows.map(_.toSeq) == Seq(Seq("Hello World"))) // runs concatenated
  }

  test("reader hardening: pdf octal/nested dicts, pcap nano magic, pcapng refusal, xlsx phonetic runs") {
    import graft.sources.{PcapngReader, PdfReader, XlsxReader}
    import java.io.{ByteArrayInputStream, DataInputStream}
    // pdf: octal escapes are the normal encoding for non-ASCII literals
    assert(PdfReader.textOps("BT (\\101\\102\\7) Tj ET") == Seq("AB"))
    // a nested sub-dictionary must not hide the outer /FlateDecode
    val payload = "BT (ok) Tj ET".getBytes("ISO-8859-1")
    val defl = { val d = new java.util.zip.Deflater()
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](256); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOfRange(buf, 0, n) }
    val pdfBytes =
      "<< /Filter /FlateDecode /Resources << /Font << /F1 2 0 R >> >> >>\nstream\n"
        .getBytes("ISO-8859-1") ++ defl ++ "\nendstream".getBytes("ISO-8859-1")
    val streams = PdfReader.contentStreams(pdfBytes)
    assert(streams.size == 1 && streams.head.contains("(ok)"),
      s"nested dict hid the filter: $streams")

    // pcap: nanosecond-precision magic (tcpdump --nano) reads, fractional
    // field normalized to the schema's ts_usec contract
    val bb = java.nio.ByteBuffer.allocate(24 + 16 + 4)
    bb.putInt(0xa1b23c4d) // big-endian nano magic
    bb.position(24)
    bb.putInt(7)          // ts_sec
    bb.putInt(500000000)  // ts frac in NANOS
    bb.putInt(4)          // incl_len
    bb.putInt(4)          // orig_len
    bb.putInt(0xdeadbeef) // 4 bytes of packet data
    val nanoRows = PcapReader.parse(
      new DataInputStream(new ByteArrayInputStream(bb.array()))).toSeq
    assert(nanoRows.map(r => (r.getLong(0), r.getLong(1))) == Seq((7L, 500000L)))

    // pcapng: a classic pcap (first block not SHB) refuses instead of
    // silently yielding zero rows
    val classic = java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of(s"$Fixtures/sample.pcap"))
    val e = intercept[IllegalArgumentException] {
      PcapngReader.parse(new DataInputStream(
        new ByteArrayInputStream(classic))).toSeq
    }
    assert(e.getMessage.contains("not a pcapng file"), e.getMessage)

    // xlsx: phonetic runs (<rPh>) are hints, not cell text
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val sst = """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<si><t>Tokyo</t><rPh sb="0" eb="2"><t>PHONETIC</t></rPh><phoneticPr fontId="1"/></si></sst>"""
    val sheet = """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1"><c r="A1" t="inlineStr"><is><t>city</t></is></c></row>""" +
      """<row r="2"><c r="A2" t="s"><v>0</v></c></row>""" +
      """</sheetData></worksheet>"""
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("xl/sharedStrings.xml"))
    z.write(sst.getBytes("UTF-8")); z.closeEntry()
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(sheet.getBytes("UTF-8")); z.closeEntry(); z.close()
    val (hdr2, rows2) = XlsxReader.parseGrid(
      new ByteArrayInputStream(bos.toByteArray))
    assert(hdr2.toSeq == Seq("city"))
    assert(rows2.map(_.toSeq) == Seq(Seq("Tokyo")), rows2.map(_.toSeq))
  }

  test("pcapng: block framing over the same decoder equals the classic rows") {
    val ng = graft.sources.PcapngReader.read(spark, s"$Fixtures/sample.pcapng")
      .orderBy("ts_sec").collect().toSeq
    val classic = PcapReader.read(spark, s"$Fixtures/sample.pcap")
      .orderBy("ts_sec").collect().toSeq
    // same three packets, same decode, same (sec, usec) despite the
    // 64-bit single-number pcapng timestamp; the fixture also contains an
    // unknown block type the framing must skip
    assert(ng == classic)
  }

  test("pcapng: if_tsresol option drives timestamp normalization (ms + big-endian)") {
    import java.io.{ByteArrayInputStream, DataInputStream}
    def beBlock(btype: Long, body: Array[Byte]): Array[Byte] = {
      val total = 12 + body.length
      val bb = java.nio.ByteBuffer.allocate(total)
      bb.putInt(btype.toInt).putInt(total).put(body).putInt(total)
      bb.array()
    }
    val shb = beBlock(0x0A0D0D0AL,
      java.nio.ByteBuffer.allocate(16).putInt(0x1A2B3C4D).putShort(1).putShort(0)
        .putLong(-1L).array())
    // IDB declaring if_tsresol = 3 (milliseconds)
    val idb = beBlock(1L, java.nio.ByteBuffer.allocate(16)
      .putShort(1).putShort(0).putInt(65535)
      .putShort(9).putShort(1).put(3.toByte).put(Array[Byte](0, 0, 0))
      .array().take(16))
    // EPB at ts = 1700000001234 ms => sec 1700000001, usec 234000
    val ts = 1700000001234L
    val data = new Array[Byte](20) // non-IPv4: null network fields
    val epbBody = java.nio.ByteBuffer.allocate(20 + data.length)
      .putInt(0).putInt((ts >> 32).toInt).putInt(ts.toInt)
      .putInt(data.length).putInt(data.length).put(data).array()
    val epb = beBlock(6L, epbBody)
    val bytes = shb ++ idb ++ epb
    val rows = graft.sources.PcapngReader.parse(
      new DataInputStream(new ByteArrayInputStream(bytes))).toList
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1700000001L)
    assert(rows.head.getLong(1) == 234000L)
  }

  test("non-IPv4 frames yield null network fields, not failures") {
    // ARP ethertype 0x0806, truncated body
    val arp = Array.fill[Byte](20)(0)
    arp(12) = 0x08; arp(13) = 0x06
    val (src, dst, proto, sp, dp) = PcapReader.decodeEthIpv4(arp)
    assert(src == null && dst == null && proto == null && sp == null && dp == null)
  }
}
