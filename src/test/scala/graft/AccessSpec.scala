package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AccessReader

/** Fixtures: the .mdb/.accdb files under testfiles/access are the
  * reference's own public test files (contrib/format-access test
  * resources, ASL-2.0) and the expected values below are transcribed from
  * its TestMSAccessReader.java — an INDEPENDENT validator: the reference
  * decoded them through the Jackcess library, graft's hand-rolled Jet/ACE
  * parser must land on the same decode. One deliberate divergence:
  * CURRENCY surfaces as Decimal(19,4) with the EXACT scaled value
  * (3.5000) where the reference's default scale-0 VARDECIMAL rounds it to
  * 4 — the raw stored integer is 35000 with the public x1e-4 currency
  * scale, so the exact value is the faithful decode. */
class AccessSpec extends AnyFunSuite {
  import TestSpark._

  private def f(n: String) = s"$Fixtures/access/$n"

  test("catalog browse: user tables with created/updated dates and columns") {
    val rows = AccessReader.read(spark, f("extDateTestV2019.accdb")).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "Table1")
    // reference expected 2021-06-03T20:09:56.993Z for BOTH dates, but its
    // reader returns getCreatedDate() for updated_date too
    // (MSAccessBatchReader.java:277); graft surfaces the table's real
    // MSysObjects DateUpdate (20:25:26.483Z) alongside DateCreate
    assert(r.getTimestamp(1).getTime == 1622750996993L)
    assert(r.getTimestamp(2).getTime == 1622751926483L)
    assert(r.getInt(3) == 9) // row_count
    assert(r.getInt(4) == 6) // col_count
    assert(r.getSeq[String](5).toSeq == Seq("ID", "Field1", "DateExt",
      "DateNormal", "DateExtStr", "DateNormalCalc"))
  }

  test("ACE extended dates (V2019): classic, extended, string, calculated") {
    val df = AccessReader.readTable(spark, f("extDateTestV2019.accdb"), "Table1")
    assert(df.schema.fieldNames.toSeq == Seq("ID", "Field1", "DateExt",
      "DateNormal", "DateExtStr", "DateNormalCalc"))
    assert(df.count() == 9) // reference testSerDe COUNT(*)
    val rows = df.orderBy("ID").collect()
    def ts(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getTimestamp(i).getTime
    val expected = Seq( // (id, field1, instant millis, extStr)
      (1, "row1", 1592352000000L, "6/17/2020"),
      (2, "row2", 1623628800000L, "6/14/2021"),
      (3, "row3", 1623674700000L, "6/14/2021 12:45:00.0000000 PM"),
      (4, "row4", 1623635100000L, "6/14/2021 1:45:00.0000000 AM"))
    expected.zip(rows).foreach { case ((id, f1, millis, s), r) =>
      assert(r.getInt(0) == id && r.getString(1) == f1)
      assert(ts(r, 2) == millis, s"DateExt of $f1")        // extended date
      assert(ts(r, 3) == millis, s"DateNormal of $f1")     // classic date
      assert(r.getString(4) == s)
      assert(ts(r, 5) == millis, s"DateNormalCalc of $f1") // calculated col
    }
    val r5 = rows(4) // reference: row5 is all-null in the date columns
    assert(r5.getInt(0) == 5 && r5.getString(1) == "row5")
    assert(r5.isNullAt(2) && r5.isNullAt(3) && r5.isNullAt(4) && r5.isNullAt(5))
    // sub-second precision survives to Spark's microsecond timestamps
    // (source carries 100 ns ticks — .3456789 s — micros keep .345678)
    val r6 = rows(5)
    assert(r6.getTimestamp(2).getNanos == 345678000)
  }

  test("mixed types (V2010 accdb): text, ints, double, date, money, bool") {
    val df = AccessReader.readTable(spark, f("testV2010.accdb"), "Table1")
    assert(df.schema.fieldNames.toSeq ==
      Seq("A", "B", "C", "D", "E", "F", "G", "H", "I"))
    val rows = df.orderBy("C").collect()
    val r0 = rows(0)
    assert(r0.getString(0) == "a" && r0.getString(1) == "b")
    assert(r0.getByte(2) == 0 && r0.getShort(3) == 0 && r0.getInt(4) == 0)
    assert(r0.getDouble(5) == 0.0)
    assert(r0.getTimestamp(6).getTime == 376963200000L) // 1981-12-12Z
    assert(r0.getDecimal(7).compareTo(java.math.BigDecimal.ZERO) == 0)
    assert(!r0.getBoolean(8))
    val r1 = rows(1)
    assert(r1.getString(0) == "abcdefg" && r1.getString(1) == "hijklmnop")
    assert(r1.getByte(2) == 2 && r1.getShort(3) == 222 &&
      r1.getInt(4) == 333333333)
    assert(r1.getDouble(5) == 444.555)
    assert(r1.getTimestamp(6).getTime == 148953600000L) // 1974-09-21Z
    assert(r1.getDecimal(7).compareTo(new java.math.BigDecimal("3.5")) == 0)
    assert(r1.getBoolean(8))
  }

  test("Jet 4 .mdb flavor (V2003): same decode as the ACE files") {
    val df = AccessReader.readTable(spark, f("testV2003.mdb"), "Table1")
    val rows = df.orderBy("C").collect()
    assert(rows.length == 2)
    assert(rows(1).getString(0) == "abcdefg" && rows(1).getInt(4) == 333333333)
    assert(rows(1).getDecimal(7).compareTo(new java.math.BigDecimal("3.5")) == 0)
    // catalog of a multi-table file lists all four user tables
    val tables = AccessReader.read(spark, f("testV2003.mdb"))
      .collect().map(_.getString(0)).sorted
    assert(tables.toSeq == Seq("Table1", "Table2", "Table3", "Table4"))
  }

  test("Jet 3 (Access 97, 2048-byte pages): cross-version validator") {
    // V1997's Table1 holds the same logical rows the VALIDATED Jet4/ACE
    // decodes pin (the reference's fixtures share content across
    // versions) — a correct Jet3 decode must land on identical values
    val df = AccessReader.readTable(spark, f("testV1997.mdb"), "Table1")
    assert(df.schema.fieldNames.toSeq ==
      Seq("A", "B", "C", "D", "E", "F", "G", "H", "I"))
    val rows = df.orderBy("C").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getString(0) == "a" && r0.getByte(2) == 0 && !r0.getBoolean(8))
    assert(r0.getTimestamp(6).getTime == 376963200000L)
    val r1 = rows(1)
    assert(r1.getString(0) == "abcdefg" && r1.getString(1) == "hijklmnop")
    assert(r1.getShort(3) == 222 && r1.getInt(4) == 333333333)
    assert(r1.getDouble(5) == 444.555)
    assert(r1.getDecimal(7).compareTo(new java.math.BigDecimal("3.5")) == 0)
    assert(r1.getBoolean(8))
    val tables = AccessReader.read(spark, f("testV1997.mdb"))
      .collect().map(_.getString(0)).sorted
    assert(tables.toSeq == Seq("Table1", "Table2", "Table3", "Table4"))
  }
}
