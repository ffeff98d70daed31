package graft

import org.scalatest.funsuite.AnyFunSuite

/** HBase HFile reader (reference contrib/storage-hbase — re-expressed
  * zero-egress over the PUBLIC v2/v3 on-disk format: 33-byte block
  * headers with CRC chunks, block indexes, PBUF FileInfo, protobuf
  * trailer). Matrix: both majors, both index depths, GZ compression,
  * delete-marker semantics, corrupt-trailer/checksum refusals, and a
  * hand-assembled golden file the reader's own writer did NOT produce. */
class HFileSpec extends AnyFunSuite {
  import TestSpark._
  import graft.sources.HBaseHFileReader
  import graft.sources.HBaseHFileReader.Cell

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def freshDir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"hfile_$name").toString

  private def cell(row: String, fam: String, qual: String, ts: Long,
                   value: String, tpe: Int = 4, seq: Long = 1L): Cell =
    Cell(b(row), fam, qual, ts, tpe, b(value), seq)

  test("v3 round-trip: cells, families, versions, memstore seq ids; " +
      "read() gives the Drill shape with latest version winning") {
    val dir = freshDir("v3")
    // HBase order: row asc, family asc, qualifier asc, ts DESC
    HBaseHFileReader.writeHFile(spark, s"$dir/aaa", Seq(
      cell("r1", "f", "name", 2000L, "new", seq = 5L),
      cell("r1", "f", "name", 1000L, "old", seq = 2L),
      cell("r1", "g", "x", 1000L, "gx"),
      cell("r2", "f", "name", 1500L, "r2name")))
    val cells = HBaseHFileReader.readCells(spark, dir)
    assert(cells.count() == 4)
    val c0 = cells.filter("ts = 2000").collect()(0)
    assert(new String(c0.getAs[Array[Byte]]("row_key"), "UTF-8") == "r1" &&
      c0.getAs[String]("family") == "f" &&
      c0.getAs[String]("qualifier") == "name" &&
      c0.getAs[String]("cell_type") == "Put" &&
      new String(c0.getAs[Array[Byte]]("value"), "UTF-8") == "new" &&
      c0.getAs[Long]("seq_id") == 5L)

    val table = HBaseHFileReader.read(spark, dir)
    assert(table.columns.toSeq == Seq("row_key", "f", "g"))
    val rows = table.collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8") -> r).toMap
    def famMap(r: org.apache.spark.sql.Row, i: Int): Map[String, String] =
      r.getMap[String, Array[Byte]](i).toMap
        .map { case (k, v) => k -> new String(v, "UTF-8") }
    assert(famMap(rows("r1"), 1) == Map("name" -> "new")) // latest wins
    assert(famMap(rows("r1"), 2) == Map("x" -> "gx"))
    assert(famMap(rows("r2"), 1) == Map("name" -> "r2name"))
    assert(famMap(rows("r2"), 2) == Map.empty)
  }

  test("delete markers: DeleteFamily / DeleteColumn / exact Delete / " +
      "DeleteFamilyVersion all apply HBase semantics") {
    val dir = freshDir("dels")
    HBaseHFileReader.writeHFile(spark, s"$dir/sf", Seq(
      // r1/f: DeleteFamily at ts 1500 — kills ts<=1500, keeps ts 2000
      cell("r1", "f", "a", 1500L, "", tpe = 14),
      cell("r1", "f", "keep", 2000L, "survives"),
      cell("r1", "f", "kill", 1000L, "gone"),
      // r2/f: DeleteColumn on q1 at 1500 kills both versions below it;
      // exact Delete on q2@1000 kills only that version
      cell("r2", "f", "q1", 1500L, "", tpe = 12),
      cell("r2", "f", "q1", 1400L, "gone1"),
      cell("r2", "f", "q1", 1200L, "gone2"),
      cell("r2", "f", "q2", 1100L, "q2new"),
      cell("r2", "f", "q2", 1000L, "", tpe = 8),
      cell("r2", "f", "q2", 1000L, "q2dead"),
      // r3/f: DeleteFamilyVersion kills EXACTLY ts 1000 across the family
      cell("r3", "f", "a", 1000L, "", tpe = 10),
      cell("r3", "f", "p", 1000L, "deadexact"),
      cell("r3", "f", "p", 900L, "older-survives")))
    val table = HBaseHFileReader.read(spark, dir)
    val rows = table.collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8") -> r).toMap
    def famMap(r: org.apache.spark.sql.Row): Map[String, String] =
      r.getMap[String, Array[Byte]](1).toMap
        .map { case (k, v) => k -> new String(v, "UTF-8") }
    assert(famMap(rows("r1")) == Map("keep" -> "survives"))
    assert(famMap(rows("r2")) == Map("q2" -> "q2new"))
    assert(famMap(rows("r3")) == Map("p" -> "older-survives"))
  }

  test("v2 major + GZ compression + two-level index + multi-block: " +
      "same cells decode; one task per store file") {
    val dir = freshDir("matrix")
    val cells = (0 until 200).map { i =>
      cell(f"row$i%03d", "f", "n", 1000L, s"val$i")
    }
    // tiny blockSize forces many data blocks under the two leaf blocks
    HBaseHFileReader.writeHFile(spark, s"$dir/h1", cells.take(100),
      major = 2, blockSize = 256, gzip = true, twoLevel = true)
    HBaseHFileReader.writeHFile(spark, s"$dir/h2", cells.drop(100),
      major = 3, blockSize = 256, gzip = true, twoLevel = true,
      memstoreTS = false)
    val df = HBaseHFileReader.readCells(spark, dir)
    assert(df.rdd.getNumPartitions == 2)
    val got = df.collect().map(r =>
      (new String(r.getAs[Array[Byte]]("row_key"), "UTF-8"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).toSet
    assert(got == cells.map(c =>
      (new String(c.row, "UTF-8"), new String(c.value, "UTF-8"))).toSet)
  }

  test("corrupt trailer magic and corrupt block bytes refuse loudly") {
    val dir = freshDir("bad")
    val f = HBaseHFileReader.writeHFile(spark, s"$dir/ok",
      Seq(cell("r", "f", "q", 1L, "v")))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))

    // trailer magic flipped — "not an HFile"
    val t1 = bytes.clone(); t1(t1.length - 4096) = 'X'.toByte
    val d1 = freshDir("badmagic")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d1/t"), t1)
    val e1 = intercept[Exception] {
      HBaseHFileReader.readCells(spark, d1).collect()
    }
    assert(causeChain(e1).contains("not an HFile"), causeChain(e1))

    // first data-block payload byte flipped — CRC-32C catches it
    val t2 = bytes.clone(); t2(40) = (t2(40) ^ 0x1).toByte
    val d2 = freshDir("badcrc")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d2/t"), t2)
    val e2 = intercept[Exception] {
      HBaseHFileReader.readCells(spark, d2).collect()
    }
    assert(causeChain(e2).contains("checksum mismatch"), causeChain(e2))
  }

  test("GOLDEN bytes: a minimal v2 file hand-assembled from the spec " +
      "layout decodes (bytes NOT produced by writeHFile)") {
    // independent transcription of the published layout: one cell
    // row=r1 f:q ts=7 Put value=v, no memstore ts; NONE compression;
    // CRC-32C chunks; root-only index; empty FileInfo; v2 trailer (212)
    val bo = new java.io.ByteArrayOutputStream()
    def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def block(magic: String, payload: Array[Byte]): Array[Byte] = {
      val withHeader = 33 + payload.length
      val buf = java.nio.ByteBuffer.allocate(withHeader + 4)
      buf.put(magic.getBytes("US-ASCII"))
      buf.putInt(payload.length + 4).putInt(payload.length).putLong(-1L)
      buf.put(2.toByte).putInt(16384).putInt(withHeader).put(payload)
      val crc = new java.util.zip.CRC32C()
      crc.update(buf.array(), 0, withHeader)
      buf.putInt(crc.getValue.toInt)
      buf.array()
    }
    // data block: keyLen=16 valLen=1; key = 0002 'r1' 01 'f' 'q' ts=7 04
    val kv = java.nio.ByteBuffer.allocate(25)
    kv.putInt(16).putInt(1)
    kv.putShort(2).put(b("r1")).put(1.toByte).put(b("f")).put(b("q"))
    kv.putLong(7L).put(4.toByte).put(b("v"))
    val dataBlock = block("DATABLK*", kv.array())
    bo.write(dataBlock)
    // root index: offset 0, onDiskSizeWithHeader, vint key len 16 + key
    val rootOff = bo.size()
    val ri = java.nio.ByteBuffer.allocate(8 + 4 + 1 + 16)
    ri.putLong(0L).putInt(dataBlock.length).put(16.toByte)
    ri.put(java.util.Arrays.copyOfRange(kv.array(), 8, 24))
    bo.write(block("IDXROOT2", ri.array()))
    // file info: PBUF + empty delimited message
    val fiOff = bo.size()
    bo.write(block("FILEINF2",
      "PBUF".getBytes("US-ASCII") :+ 0.toByte)) // empty delimited msg
    // trailer: magic + delimited FileTrailerProto + pad + version int
    val tp = new java.io.ByteArrayOutputStream()
    def pint(f: Int, v: Long): Unit = { varint(tp, (f << 3).toLong); varint(tp, v) }
    pint(1, fiOff); pint(2, rootOff); pint(5, 1); pint(7, 1); pint(8, 1)
    pint(9, 0); pint(10, 0); pint(12, 2)
    val trailer = java.nio.ByteBuffer.allocate(212)
    trailer.put("TRABLK\"$".getBytes("US-ASCII"))
    val msg = tp.toByteArray
    trailer.put(msg.length.toByte).put(msg)
    trailer.position(208)
    trailer.putInt(2 | (3 << 24)) // major 2, minor 3
    bo.write(trailer.array())

    val dir = freshDir("golden")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/g"),
      bo.toByteArray)
    val rows = HBaseHFileReader.readCells(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(new String(r.getAs[Array[Byte]]("row_key"), "UTF-8") == "r1" &&
      r.getAs[String]("family") == "f" &&
      r.getAs[String]("qualifier") == "q" &&
      r.getAs[Long]("ts") == 7L &&
      r.getAs[String]("cell_type") == "Put" &&
      new String(r.getAs[Array[Byte]]("value"), "UTF-8") == "v")
  }
}
