package graft

import org.scalatest.funsuite.AnyFunSuite

/** Phoenix-on-HBase reader (reference contrib/storage-phoenix — the
  * plugin reads via the Phoenix thin-client JDBC driver; re-expressed
  * zero-egress over the PUBLIC Phoenix table layout in HBase, decoded
  * from store files through HBaseHFileReader). */
class PhoenixSpec extends AnyFunSuite {
  import TestSpark._
  import graft.sources.{HBaseHFileReader, PhoenixReader}
  import graft.sources.PhoenixReader.PhoenixColumn

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("phoenix_store").toString

  private def d(iso: String): java.sql.Date = java.sql.Date.valueOf(iso)

  test("round-trip: full supported type matrix, composite VARCHAR+fixed " +
      "PK, nulls as absent cells, empty values as NULL") {
    val dir = freshDir()
    val schema = Seq(
      PhoenixColumn("seg", "VARCHAR", pk = true),
      PhoenixColumn("id", "BIGINT", pk = true),
      PhoenixColumn("name", "VARCHAR"),
      PhoenixColumn("n", "INTEGER"),
      PhoenixColumn("sm", "SMALLINT"),
      PhoenixColumn("ty", "TINYINT"),
      PhoenixColumn("ui", "UNSIGNED_INT"),
      PhoenixColumn("ul", "UNSIGNED_LONG"),
      PhoenixColumn("flag", "BOOLEAN"),
      PhoenixColumn("dt", "DATE"))
    val rows: Seq[(Seq[Any], Long, Long)] = Seq(
      (Seq("a", 1L, "x", -7, 300.toShort, (-3).toByte, 42, 9999999999L,
        true, d("1994-02-01")), 1000L, 1L),
      (Seq("a", -2L, null, Int.MinValue, Short.MinValue, Byte.MaxValue,
        0, 0L, false, d("1969-12-31")), 1000L, 1L),
      // nulls in every non-PK column (only the empty marker survives)
      (Seq("zz", Long.MaxValue, null, null, null, null, null, null,
        null, null), 1000L, 1L))
    HBaseHFileReader.writeHFile(spark, s"$dir/f1",
      PhoenixReader.fixtureCells(schema, rows))
    val got = PhoenixReader.read(spark, dir, schema)
    val byKey = got.collect().map(r => (r.getString(0), r.getLong(1)) -> r)
      .toMap
    assert(byKey.size == 3)
    val r1 = byKey(("a", 1L))
    assert(r1.getString(2) == "x" && r1.getInt(3) == -7 &&
      r1.getShort(4) == 300 && r1.getByte(5) == -3 && r1.getInt(6) == 42 &&
      r1.getLong(7) == 9999999999L && r1.getBoolean(8) &&
      r1.getDate(9) == d("1994-02-01"))
    val r2 = byKey(("a", -2L))
    assert(r2.isNullAt(2) && r2.getInt(3) == Int.MinValue &&
      r2.getShort(4) == Short.MinValue && r2.getByte(5) == Byte.MaxValue &&
      r2.getInt(6) == 0 && r2.getLong(7) == 0L && !r2.getBoolean(8) &&
      r2.getDate(9) == d("1969-12-31"))
    val r3 = byKey(("zz", Long.MaxValue))
    (2 to 9).foreach(i => assert(r3.isNullAt(i), s"col $i"))
    got.unpersist()
  }

  test("GOLDEN bytes: hand-derived rowkeys and cells decode (sign-flip " +
      "form, 0x00 separator, '_0' empty marker — bytes the fixture " +
      "writer did NOT produce)") {
    val dir = freshDir()
    val schema = Seq(
      PhoenixColumn("a", "VARCHAR", pk = true),
      PhoenixColumn("b", "INTEGER", pk = true),
      PhoenixColumn("n", "BIGINT"),
      PhoenixColumn("name", "VARCHAR"))
    // ('abc', 1): 'abc' UTF-8 + 0x00 separator + 1 sign-flipped BE
    val rk1 = Array[Byte](0x61, 0x62, 0x63, 0x00,
      0x80.toByte, 0x00, 0x00, 0x01)
    // ('zz', -3): -3 = 0xFFFFFFFD, sign bit flipped -> 0x7FFFFFFD
    val rk2 = Array[Byte](0x7A, 0x7A, 0x00,
      0x7F, 0xFF.toByte, 0xFF.toByte, 0xFD.toByte)
    // n = 5 -> 8-byte sign-flipped BE
    val n5 = Array[Byte](0x80.toByte, 0, 0, 0, 0, 0, 0, 5)
    // n = -1 -> 0x7FFFFFFFFFFFFFFF
    val nm1 = Array.fill[Byte](8)(0xFF.toByte); nm1(0) = 0x7F
    def cell(rk: Array[Byte], q: String, v: Array[Byte]) =
      HBaseHFileReader.Cell(rk, "0", q, 1000L, 4, v, 1L)
    HBaseHFileReader.writeHFile(spark, s"$dir/f1",
      PhoenixReader.sortCells(Seq(
        cell(rk1, "_0", "x".getBytes), cell(rk1, "n", n5),
        cell(rk1, "name", "hello".getBytes("UTF-8")),
        cell(rk2, "_0", "x".getBytes), cell(rk2, "n", nm1))))
    val got = PhoenixReader.read(spark, dir, schema).collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(got == Set(("abc", 1, 5L, "hello"), ("zz", -3, -1L, null)), got)
  }

  test("DESC PK columns invert bytes (0xFF varchar separator); " +
      "rowKey() emits the documented golden form") {
    val dir = freshDir()
    val schema = Seq(
      PhoenixColumn("s", "VARCHAR", pk = true, desc = true),
      PhoenixColumn("k", "INTEGER", pk = true, desc = true),
      PhoenixColumn("v", "BIGINT"))
    // desc 'ab' = invert(61 62) = 9E 9D, then 0xFF separator;
    // desc 1 = invert(80 00 00 01) = 7F FF FF FE
    val expect = Array[Byte](0x9E.toByte, 0x9D.toByte, 0xFF.toByte,
      0x7F, 0xFF.toByte, 0xFF.toByte, 0xFE.toByte)
    val rk = PhoenixReader.rowKey(schema.filter(_.pk), Seq("ab", 1))
    assert(java.util.Arrays.equals(rk, expect),
      rk.map(b => f"$b%02X").mkString(" "))
    HBaseHFileReader.writeHFile(spark, s"$dir/f1",
      PhoenixReader.fixtureCells(schema,
        Seq((Seq("ab", 1, 10L), 1000L, 1L), (Seq("q", -5, 20L), 1000L, 1L))))
    val got = PhoenixReader.read(spark, dir, schema).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("ab", 1, 10L), ("q", -5, 20L)), got)
  }

  test("TWO_BYTE encoded qualifiers: counters from 11 in declaration " +
      "order, encoded-0 empty marker skipped") {
    val dir = freshDir()
    val schema = Seq(
      PhoenixColumn("id", "INTEGER", pk = true),
      PhoenixColumn("x", "BIGINT"),
      PhoenixColumn("y", "VARCHAR"))
    assert(java.util.Arrays.equals(
      PhoenixReader.qualifierFor("x", 0, encoded = true),
      Array[Byte](0, 11)))
    assert(java.util.Arrays.equals(
      PhoenixReader.qualifierFor("y", 1, encoded = true),
      Array[Byte](0, 12)))
    HBaseHFileReader.writeHFile(spark, s"$dir/f1",
      PhoenixReader.fixtureCells(schema,
        Seq((Seq(1, 5L, "a"), 1000L, 1L), (Seq(2, null, "b"), 1000L, 1L)),
        encodedQualifiers = true))
    val got = PhoenixReader.read(spark, dir, schema,
      encodedQualifiers = true).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2))).toSet
    assert(got == Set((1, 5L, "a"), (2, null, "b")), got)
  }

  test("HBase semantics before decode: newer generation wins, " +
      "DeleteColumn nulls one column, DeleteFamily drops the row") {
    val dir = freshDir()
    val schema = Seq(
      PhoenixColumn("id", "INTEGER", pk = true),
      PhoenixColumn("v", "BIGINT"),
      PhoenixColumn("w", "VARCHAR"))
    HBaseHFileReader.writeHFile(spark, s"$dir/gen1",
      PhoenixReader.fixtureCells(schema, Seq(
        (Seq(1, 10L, "old1"), 1000L, 1L),
        (Seq(2, 20L, "old2"), 1000L, 1L),
        (Seq(3, 30L, "old3"), 1000L, 1L))))
    val rk1 = PhoenixReader.rowKey(schema.take(1), Seq(1))
    val rk3 = PhoenixReader.rowKey(schema.take(1), Seq(3))
    HBaseHFileReader.writeHFile(spark, s"$dir/gen2",
      PhoenixReader.sortCells(
        PhoenixReader.fixtureCells(schema,
          Seq((Seq(1, 11L, "new1"), 2000L, 2L))) ++ Seq(
          // DeleteColumn on row 2's v (qualifier 'v', every version)
          HBaseHFileReader.Cell(PhoenixReader.rowKey(schema.take(1), Seq(2)),
            "0", "v", 2000L, 12, Array.emptyByteArray, 2L),
          // DeleteFamily on row 3: phoenix DELETE's shape
          HBaseHFileReader.Cell(rk3, "0", "", 2000L, 14,
            Array.emptyByteArray, 2L))))
    val got = PhoenixReader.read(spark, dir, schema).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2))).toSet
    assert(got == Set((1, 11L, "new1"), (2, null, "old2")), got)
    assert(java.util.Arrays.equals(rk1,
      Array[Byte](0x80.toByte, 0, 0, 1)))
  }

  test("DeleteFamilyVersion kills EXACTLY its ts across the family — " +
      "the older generation resurfaces (per-version semantics via the " +
      "shared resolveLatest)") {
    val dir = freshDir()
    val schema = Seq(
      PhoenixColumn("id", "INTEGER", pk = true),
      PhoenixColumn("v", "BIGINT"))
    HBaseHFileReader.writeHFile(spark, s"$dir/gen1",
      PhoenixReader.fixtureCells(schema, Seq((Seq[Any](1, 10L), 1000L, 1L))))
    HBaseHFileReader.writeHFile(spark, s"$dir/gen2",
      PhoenixReader.fixtureCells(schema, Seq((Seq[Any](1, 11L), 2000L, 2L))))
    // DFV at exactly ts 2000: gen2's cells (v AND the liveness marker)
    // die, gen1's survive — HBaseHFileReader.read semantics, now shared
    HBaseHFileReader.writeHFile(spark, s"$dir/gen3", Seq(
      HBaseHFileReader.Cell(PhoenixReader.rowKey(schema.take(1), Seq(1)),
        "0", "", 2000L, 10, Array.emptyByteArray, 3L)))
    val got = PhoenixReader.read(spark, dir, schema).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((1, 10L)), got)
  }

  test("a declared column named '_0' (the liveness marker qualifier) " +
      "refuses loudly instead of decoding all-NULL") {
    val e = intercept[IllegalArgumentException] {
      PhoenixReader.read(spark, "/nonexistent",
        Seq(PhoenixColumn("id", "INTEGER", pk = true),
          PhoenixColumn("_0", "VARCHAR")))
    }
    assert(e.getMessage.contains("liveness marker"), e.getMessage)
  }

  test("salted tables: bucket byte skipped and range-checked; unsalted " +
      "read of a salted table refuses with unparsed-bytes") {
    val dir = freshDir()
    val schema = Seq(
      PhoenixColumn("id", "BIGINT", pk = true),
      PhoenixColumn("v", "VARCHAR"))
    HBaseHFileReader.writeHFile(spark, s"$dir/f1",
      PhoenixReader.fixtureCells(schema,
        (1L to 8L).map(i => (Seq[Any](i, s"v$i"), 1000L, 1L)),
        saltBuckets = 4))
    val got = PhoenixReader.read(spark, dir, schema, saltBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (1L to 8L).map(i => (i, s"v$i")).toSet, got)
    val e = intercept[org.apache.spark.SparkException] {
      PhoenixReader.read(spark, dir, schema).collect()
    }
    assert(TestSpark.causeChain(e).contains("unparsed row-key bytes"),
      e.getMessage)
  }

  test("null VARCHAR inside and at the end of the PK round-trips " +
      "(two adjacent separators / early key end)") {
    val dir = freshDir()
    val schema = Seq(
      PhoenixColumn("a", "VARCHAR", pk = true),
      PhoenixColumn("b", "VARCHAR", pk = true),
      PhoenixColumn("c", "INTEGER", pk = true),
      PhoenixColumn("v", "BIGINT"))
    val schemaTrail = Seq(
      PhoenixColumn("k", "INTEGER", pk = true),
      PhoenixColumn("s", "VARCHAR", pk = true),
      PhoenixColumn("v", "BIGINT"))
    HBaseHFileReader.writeHFile(spark, s"$dir/f1",
      PhoenixReader.fixtureCells(schema, Seq(
        (Seq("x", null, 1, 5L), 1000L, 1L),
        (Seq("x", "y", 2, 6L), 1000L, 1L))))
    val got = PhoenixReader.read(spark, dir, schema).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull,
        r.getInt(2), r.getLong(3))).toSet
    assert(got == Set(("x", null, 1, 5L), ("x", "y", 2, 6L)), got)
    // middle-null rowkey golden form: 'x' 00 00 <int 1 flipped>
    assert(java.util.Arrays.equals(
      PhoenixReader.rowKey(schema.take(3), Seq("x", null, 1)),
      Array[Byte](0x78, 0x00, 0x00, 0x80.toByte, 0, 0, 1)))
    val dir2 = freshDir()
    HBaseHFileReader.writeHFile(spark, s"$dir2/f1",
      PhoenixReader.fixtureCells(schemaTrail, Seq(
        (Seq(1, null, 7L), 1000L, 1L), (Seq(2, "s2", 8L), 1000L, 1L))))
    val got2 = PhoenixReader.read(spark, dir2, schemaTrail).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)).orNull, r.getLong(2)))
      .toSet
    assert(got2 == Set((1, null, 7L), (2, "s2", 8L)), got2)
  }

  test("refusals: DOUBLE/DECIMAL types, desc on non-PK, NUL in varchar, " +
      "schema/rowkey width mismatch — all loud") {
    val schemaD = Seq(PhoenixColumn("id", "INTEGER", pk = true),
      PhoenixColumn("x", "DOUBLE"))
    val e1 = intercept[IllegalArgumentException] {
      PhoenixReader.read(spark, "/nonexistent", schemaD)
    }
    assert(e1.getMessage.contains("refuses") &&
      e1.getMessage.contains("BIGINT"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      PhoenixReader.read(spark, "/nonexistent",
        Seq(PhoenixColumn("id", "INTEGER", pk = true),
          PhoenixColumn("x", "DECIMAL")))
    }
    // the DECIMAL refusal names the three byte-cases that blocked a
    // verified decode (round-13 review: terminator / negative-exponent
    // fold / zero sentinel need PDecimal golden bytes)
    assert(e2.getMessage.contains("refuses") &&
      e2.getMessage.contains("terminator") &&
      e2.getMessage.contains("negative-exponent") &&
      e2.getMessage.contains("zero-sentinel"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      PhoenixReader.read(spark, "/nonexistent",
        Seq(PhoenixColumn("id", "INTEGER", pk = true),
          PhoenixColumn("x", "BIGINT", desc = true)))
    }
    assert(e3.getMessage.contains("desc applies only to PK"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      PhoenixReader.rowKey(Seq(PhoenixColumn("a", "VARCHAR", pk = true),
        PhoenixColumn("b", "INTEGER", pk = true)), Seq("a\u0000b", 1))
    }
    assert(e4.getMessage.contains("NUL"), e4.getMessage)
    // a BIGINT pk read with an INTEGER schema leaves 4 unparsed bytes
    val dir = freshDir()
    HBaseHFileReader.writeHFile(spark, s"$dir/f1",
      PhoenixReader.fixtureCells(
        Seq(PhoenixColumn("id", "BIGINT", pk = true),
          PhoenixColumn("v", "VARCHAR")),
        Seq((Seq(1L, "a"), 1000L, 1L))))
    val e5 = intercept[org.apache.spark.SparkException] {
      PhoenixReader.read(spark, dir,
        Seq(PhoenixColumn("id", "INTEGER", pk = true),
          PhoenixColumn("v", "VARCHAR"))).collect()
    }
    assert(TestSpark.causeChain(e5).contains("unparsed row-key bytes"),
      e5.getMessage)
  }
}
