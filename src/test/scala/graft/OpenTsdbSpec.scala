package graft

import org.scalatest.funsuite.AnyFunSuite

/** OpenTSDB-on-HBase reader (reference contrib/storage-opentsdb —
  * re-expressed zero-egress over the PUBLIC HBase table schema TSD
  * stores, decoded from store files through HBaseHFileReader). */
class OpenTsdbSpec extends AnyFunSuite {
  import TestSpark._
  import graft.sources.{HBaseHFileReader, OpenTsdbReader}

  private def freshDirs(): (String, String) = (
    java.nio.file.Files.createTempDirectory("tsdb_data").toString,
    java.nio.file.Files.createTempDirectory("tsdb_uid").toString)

  test("round-trip: int widths (1/2/4/8, negative sign-extension), " +
      "floats, multiple metrics/tags, hour-crossing timestamps") {
    val (dataDir, uidDir) = freshDirs()
    val points = Seq(
      ("sys.cpu", Map("host" -> "a", "dc" -> "eu"), 1500000000L, 42.0),
      ("sys.cpu", Map("host" -> "a", "dc" -> "eu"), 1500000001L, -7.0),
      ("sys.cpu", Map("host" -> "b", "dc" -> "eu"), 1500000002L, 70000.0),
      // crosses into the next hour bucket (base rolls at 3600 s)
      ("sys.cpu", Map("host" -> "a", "dc" -> "eu"), 1500003601L, -40000.0),
      ("sys.mem", Map("host" -> "a"), 1500000000L, 2.5),
      ("sys.mem", Map("host" -> "a"), 1500000007L, 9999999999L.toDouble))
    val (dataCells, uidCells) = OpenTsdbReader.fixtureCells(points)
    HBaseHFileReader.writeHFile(spark, s"$dataDir/f1", dataCells)
    HBaseHFileReader.writeHFile(spark, s"$uidDir/f1", uidCells)
    val got = OpenTsdbReader.read(spark, dataDir, uidDir).collect()
      .map(r => (r.getString(0),
        r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == points.map(p => (p._1, p._2, p._3, p._4)).toSet, got)
  }

  test("HBase versions and TSD-compaction delete markers resolve " +
      "BEFORE decode: stale versions lose, tombstoned points drop") {
    val (dataDir, uidDir) = freshDirs()
    val (dataCells, uidCells) = OpenTsdbReader.fixtureCells(Seq(
      ("m", Map("h" -> "a"), 1500000000L, 7.0),
      ("m", Map("h" -> "a"), 1500000001L, 5.0)))
    val Seq(c1, c2) = dataCells
    // an OLDER Put version of point 1 (would duplicate/garble without
    // newest-wins) and a DeleteColumn marker newer than point 2 — the
    // shape TSD's row compaction leaves behind (its cleanup deletes
    // ALL versions of the original qualifiers, which HBase writes as
    // a <=-threshold DeleteColumn, NOT an exact-ts Delete)
    val stale = c1.copy(value = Array[Byte](99), ts = c1.ts - 5000,
      seqId = 0L)
    val del2 = c2.copy(typeCode = 12, value = Array.emptyByteArray,
      ts = c2.ts + 5000)
    HBaseHFileReader.writeHFile(spark, s"$dataDir/f1",
      Seq(c1, stale, del2, c2)) // ts desc within (row, qualifier)
    HBaseHFileReader.writeHFile(spark, s"$uidDir/f1", uidCells)
    val got = OpenTsdbReader.read(spark, dataDir, uidDir).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set((1500000000L, 7.0)), got.toString)
  }

  test("exact-ts Delete markers (type 8) delete ONLY their version — " +
      "an older surviving version still decodes (regionserver " +
      "semantics, shared resolveLatest)") {
    val (dataDir, uidDir) = freshDirs()
    val (dataCells, uidCells) = OpenTsdbReader.fixtureCells(Seq(
      ("m", Map("h" -> "a"), 1500000000L, 7.0)))
    val Seq(c1) = dataCells
    // an older version of the same point, a Delete at EXACTLY the
    // newest version's ts (kills it), and a Delete at an untouched ts
    // (kills nothing) — the older version must surface
    val older = c1.copy(value = Array[Byte](3), ts = c1.ts - 5000,
      seqId = 0L)
    val delNewest = c1.copy(typeCode = 8, value = Array.emptyByteArray)
    val delNothing = c1.copy(typeCode = 8, value = Array.emptyByteArray,
      ts = c1.ts + 9999)
    // HBase order: ts desc, then type code desc at equal ts (the
    // Delete sorts before the Put it shadows)
    HBaseHFileReader.writeHFile(spark, s"$dataDir/f1",
      Seq(delNothing, delNewest, c1, older))
    HBaseHFileReader.writeHFile(spark, s"$uidDir/f1", uidCells)
    val got = OpenTsdbReader.read(spark, dataDir, uidDir).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set((1500000000L, 3.0)), got.toString)
  }

  test("refusals: millisecond qualifiers, salted/odd row keys, missing " +
      "uid mappings all fail loudly") {
    val (dataDir, uidDir) = freshDirs()
    val points = Seq(("m", Map("k" -> "v"), 1500000000L, 1.0))
    val (dataCells, uidCells) = OpenTsdbReader.fixtureCells(points)
    HBaseHFileReader.writeHFile(spark, s"$uidDir/f1", uidCells)
    // a 4-byte ms qualifier (0xF first nibble)
    val ms = dataCells.head.copy(
      qualRaw = Array(0xF0.toByte, 0, 0, 7.toByte))
    HBaseHFileReader.writeHFile(spark, s"$dataDir/f1", Seq(ms))
    val e1 = intercept[Exception] {
      OpenTsdbReader.read(spark, dataDir, uidDir).collect()
    }
    assert(causeChain(e1).contains("millisecond"), causeChain(e1))

    // a row key that is not metric+ts+n*(tagk+tagv)
    val (dataDir2, _) = freshDirs()
    val odd = dataCells.head.copy(row = Array[Byte](1, 2, 3, 4))
    HBaseHFileReader.writeHFile(spark, s"$dataDir2/f1", Seq(odd))
    val e2 = intercept[Exception] {
      OpenTsdbReader.read(spark, dataDir2, uidDir).collect()
    }
    assert(causeChain(e2).contains("salted"), causeChain(e2))

    // data referencing a uid the uid table does not hold
    val (dataDir3, uidDir3) = freshDirs()
    HBaseHFileReader.writeHFile(spark, s"$dataDir3/f1", dataCells)
    HBaseHFileReader.writeHFile(spark, s"$uidDir3/f1",
      uidCells.filterNot(_.qualifier == "metrics"))
    val e3 = intercept[Exception] {
      OpenTsdbReader.read(spark, dataDir3, uidDir3).collect()
    }
    assert(causeChain(e3).contains("missing from tsdb-uid"), causeChain(e3))
  }

  test("plan audit: uids resolve as BROADCAST JOINS against the uid " +
      "relation — no driver-side collect of uid rows on the read path") {
    val (dataDir, uidDir) = freshDirs()
    val points = Seq(
      ("sys.cpu", Map("host" -> "a"), 1500000000L, 1.0),
      ("sys.mem", Map("host" -> "b", "dc" -> "eu"), 1500000002L, 2.0))
    val (dataCells, uidCells) = OpenTsdbReader.fixtureCells(points)
    HBaseHFileReader.writeHFile(spark, s"$dataDir/f1", dataCells)
    HBaseHFileReader.writeHFile(spark, s"$uidDir/f1", uidCells)
    val (plan, caches) = OpenTsdbReader.buildRead(spark, dataDir, uidDir)
    try {
      val phys = plan.queryExecution.executedPlan.toString
      // the three uid slices (metrics/tagk/tagv) join broadcast
      val nBroadcast = "BroadcastHashJoin".r.findAllIn(phys).size
      assert(nBroadcast >= 3, s"expected >=3 broadcast uid joins:\n$phys")
      // and the same plan still yields the right rows
      val got = plan.collect().map(r => (r.getString(0),
        r.getMap[String, String](1).toMap, r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == points.toSet, got)
    } finally caches.foreach(_.unpersist())
  }

  test("GOLDEN bytes: hand-encoded row key / qualifier / value decode " +
      "(bytes NOT produced by fixtureCells)") {
    // metric uid 1, base ts 1500000000 - (1500000000 % 3600) =
    // 1499997600 = 0x596825A0; tagk uid 1 -> tagv uid 1;
    // point: offset 2400 s, 2-byte int value 300
    //   qualifier q = 2400<<4 | (2-1) = 0x9601; value = 0x012C
    val rk = Array[Byte](0, 0, 1, 0x59, 0x68, 0x25, 0xA0.toByte,
      0, 0, 1, 0, 0, 1)
    val dataCell = HBaseHFileReader.Cell(rk, "t", "",
      1L, 4, Array[Byte](0x01, 0x2C), 1L,
      qualRaw = Array(0x96.toByte, 0x01))
    val uidCells = Seq(
      HBaseHFileReader.Cell(Array[Byte](0, 0, 1), "name", "metrics", 1L,
        4, "golden.metric".getBytes("UTF-8"), 1L),
      HBaseHFileReader.Cell(Array[Byte](0, 0, 1), "name", "tagk", 1L,
        4, "host".getBytes("UTF-8"), 1L),
      HBaseHFileReader.Cell(Array[Byte](0, 0, 1), "name", "tagv", 1L,
        4, "web01".getBytes("UTF-8"), 1L))
    val (dataDir, uidDir) = freshDirs()
    HBaseHFileReader.writeHFile(spark, s"$dataDir/f1", Seq(dataCell))
    HBaseHFileReader.writeHFile(spark, s"$uidDir/f1", uidCells)
    val rows = OpenTsdbReader.read(spark, dataDir, uidDir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(0) == "golden.metric" &&
      r.getMap[String, String](1).toMap == Map("host" -> "web01") &&
      r.getLong(2) == 1499997600L + 2400L &&
      r.getDouble(3) == 300.0, r.toString)
  }
}
