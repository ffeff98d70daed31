package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cassandra SSTable reader (reference contrib/storage-cassandra —
  * re-expressed zero-egress over the public "big" on-disk format):
  * byte-exact fixtures through the published layout, decoded back;
  * merge semantics across sstables; refusal bounds; and a golden
  * minimal sstable hand-assembled from the format layout. */
class CassandraSpec extends AnyFunSuite {
  import TestSpark._
  import graft.sources.CassandraSSTableReader

  private def freshDir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"sstable_$name").toString

  private val Epoch = 1442880000000000L // 2015-09-22 in µs

  test("round-trip: typed key/clustering/regulars, absent-cell subset " +
      "bitmap, per-version decode (nb uncompressed)") {
    val dir = freshDir("rt")
    CassandraSSTableReader.writeSSTable(spark, dir,
      keyType = "Int32Type",
      clusteringTypes = Seq("LongType", "UTF8Type"),
      regulars = Seq("b" -> "BooleanType", "d" -> "DoubleType",
        "s" -> "UTF8Type", "u" -> "UUIDType"),
      rows = Seq(
        (1, Seq(10L, "x"), Seq(true, 2.5, "one",
          "00000000-0000-1000-8000-000000000001"), Epoch + 100),
        // null regulars exercise the absent-column bitmap path
        (1, Seq(11L, "y"), Seq(null, null, "two", null), Epoch + 200),
        (2, Seq(20L, "z"), Seq(false, -1.25, "three",
          "00000000-0000-1000-8000-000000000002"), Epoch + 300)))
    val df = CassandraSSTableReader.read(spark, dir, keyName = "id",
      clusteringNames = Seq("seq", "tag"))
    assert(df.columns.toSeq == Seq("id", "seq", "tag", "b", "d", "s", "u"))
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getString(2), r.get(3), r.get(4), r.getString(5), r.get(6))).toSet
    assert(rows == Set(
      (1, 10L, "x", true, 2.5, "one", "00000000-0000-1000-8000-000000000001"),
      (1, 11L, "y", null, null, "two", null),
      (2, 20L, "z", false, -1.25, "three",
        "00000000-0000-1000-8000-000000000002")), rows.toString)
  }

  test("LZ4-compressed sstables decode; chunk CRC corruption refuses; " +
      "cross-sstable merge: newest wins, tombstones shadow") {
    val dir = freshDir("merge")
    // gen 1 (lz4): two rows
    CassandraSSTableReader.writeSSTable(spark, dir,
      keyType = "Int32Type", clusteringTypes = Nil,
      regulars = Seq("v" -> "UTF8Type"),
      rows = Seq((1, Nil, Seq("old1"), Epoch + 100),
        (2, Nil, Seq("keep2"), Epoch + 100),
        (3, Nil, Seq("dead3"), Epoch + 100),
        (4, Nil, Seq("dead4"), Epoch + 100)),
      generation = 1, lz4 = true)
    // gen 2: overwrite key 1, row-tombstone key 3, partition-tombstone 4
    CassandraSSTableReader.writeSSTable(spark, dir,
      keyType = "Int32Type", clusteringTypes = Nil,
      regulars = Seq("v" -> "UTF8Type"),
      rows = Seq((1, Nil, Seq("new1"), Epoch + 500)),
      generation = 2,
      rowTombstones = Seq((3, Nil, Epoch + 500)),
      partitionTombstones = Seq((4, Epoch + 500)))
    val rows = CassandraSSTableReader.read(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "new1"), (2, "keep2")), rows.toString)

    // corrupt one compressed byte in gen 1: the chunk CRC32 must catch
    // it (drop hadoop's own .crc sidecar so the sstable-level check is
    // what fires — real clusters don't write LocalFS sidecars)
    val dataPath = java.nio.file.Paths.get(dir, "nb-1-big-Data.db")
    val bytes = java.nio.file.Files.readAllBytes(dataPath)
    bytes(2) = (bytes(2) ^ 0x1).toByte
    java.nio.file.Files.write(dataPath, bytes)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, ".nb-1-big-Data.db.crc"))
    val e = intercept[Exception] {
      CassandraSSTableReader.read(spark, dir).collect()
    }
    assert(causeChain(e).contains("CRC mismatch"), causeChain(e))
  }

  test("3.x 'mc' lz4 sstables decode too (no maxCompressedLength " +
      "field in CompressionInfo — the 4.0+ layouts differ)") {
    val dir = freshDir("mc")
    CassandraSSTableReader.writeSSTable(spark, dir,
      keyType = "Int32Type", clusteringTypes = Nil,
      regulars = Seq("v" -> "UTF8Type"),
      rows = Seq((1, Nil, Seq("three-x"), Epoch + 1)),
      version = "mc", lz4 = true)
    val rows = CassandraSSTableReader.read(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getString(1) == "three-x")
  }

  test("refusals: unsupported version, collection types, and the " +
      "clean missing-component surface") {
    val dir = freshDir("refuse")
    CassandraSSTableReader.writeSSTable(spark, dir,
      keyType = "Int32Type", clusteringTypes = Nil,
      regulars = Seq("v" -> "UTF8Type"),
      rows = Seq((1, Nil, Seq("x"), Epoch + 1)))
    // version 'ka' (2.x) refuses by name
    val dir2 = freshDir("refuse_v")
    for (c <- Seq("Data.db", "Statistics.db"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(dir, s"nb-1-big-$c"),
        java.nio.file.Paths.get(dir2, s"ka-1-big-$c"))
    val e1 = intercept[Exception] {
      CassandraSSTableReader.read(spark, dir2).collect()
    }
    assert(causeChain(e1).contains("'ka'"), causeChain(e1))
    // collection column types refuse at the writer/ctype layer
    val e2 = intercept[Exception] {
      CassandraSSTableReader.writeSSTable(spark, freshDir("refuse_t"),
        keyType = "Int32Type", clusteringTypes = Nil,
        regulars = Seq("m" ->
          "MapType(org.apache.cassandra.db.marshal.UTF8Type,org.apache.cassandra.db.marshal.Int32Type)"),
        rows = Nil)
    }
    assert(causeChain(e2).contains("composite/collection"), causeChain(e2))
    // missing Statistics.db names the component
    val dir3 = freshDir("refuse_m")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "nb-1-big-Data.db"),
      java.nio.file.Paths.get(dir3, "nb-1-big-Data.db"))
    val e3 = intercept[Exception] {
      CassandraSSTableReader.read(spark, dir3).collect()
    }
    assert(causeChain(e3).contains("Statistics.db"), causeChain(e3))
  }

  test("GOLDEN bytes: a minimal nb sstable hand-assembled from the " +
      "format layout decodes (bytes NOT produced by writeSSTable)") {
    // Statistics.db: TOC(count=1; component 3 @ offset 12), then the
    // serialization header: minTs/minLdt/minTtl deltas 0, Int32 key,
    // 0 clustering, 0 static, 1 regular ("v": UTF8Type)
    val keyT = "org.apache.cassandra.db.marshal.Int32Type".getBytes("US-ASCII")
    val valT = "org.apache.cassandra.db.marshal.UTF8Type".getBytes("US-ASCII")
    val stats = new java.io.ByteArrayOutputStream()
    val sd = new java.io.DataOutputStream(stats)
    sd.writeInt(1); sd.writeInt(3); sd.writeInt(12)
    stats.write(0); stats.write(0); stats.write(0) // ts/ldt/ttl deltas
    stats.write(keyT.length); stats.write(keyT)
    stats.write(0) // clustering count
    stats.write(0) // static count
    stats.write(1) // regular count
    stats.write(1); stats.write('v'.toInt) // name "v"
    stats.write(valT.length); stats.write(valT)
    // Data.db: one partition (key=7, LIVE), one row:
    //   flags 0x24 (HAS_TIMESTAMP | HAS_ALL_COLUMNS), bodySize 5,
    //   prevSize 0, tsDelta 5, cell flags 0x08 (USE_ROW_TIMESTAMP),
    //   value len 2 + "hi", then END_OF_PARTITION
    val data = Array[Byte](
      0x00, 0x04, 0x00, 0x00, 0x00, 0x07,            // key len + int 7
      0x7F, -1, -1, -1,                                // ldt = Int.Max LIVE
      -128, 0, 0, 0, 0, 0, 0, 0,                       // mfda = Long.Min
      0x24, 0x05, 0x00,                                // flags, sizes
      0x05,                                            // ts delta 5
      0x08, 0x02, 'h'.toByte, 'i'.toByte,              // cell
      0x01)                                            // end of partition
    val dir = freshDir("golden")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "nb-1-big-Statistics.db"),
      stats.toByteArray)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "nb-1-big-Data.db"), data)
    val rows = CassandraSSTableReader.read(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getInt(0) == 7 && rows(0).getString(1) == "hi",
      rows(0).toString)
    // the raw relation carries the decoded liveness timestamp
    val raw = CassandraSSTableReader.readRaw(spark, dir).collect()(0)
    assert(raw.getAs[Long]("_max_ts") == Epoch + 5, raw.toString)
  }
}
