package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SasReader

/** Both fixtures were hand-written against the public sas7bdat layout and
  * cross-validated with pandas.read_sas (an independent parser) at
  * generation time — so these assertions pin graft's reader to the same
  * decode an established reader produces. */
class SasSpec extends AnyFunSuite {
  import TestSpark._

  test("32-bit sas7bdat: names, types, doubles, space-padded chars") {
    val df = SasReader.read(spark, s"$Fixtures/sample.sas7bdat")
    assert(df.schema.fieldNames.toSeq == Seq("ID", "NAME", "SCORE"))
    assert(df.schema.fields.map(_.dataType.typeName).toSeq ==
      Seq("double", "string", "double"))
    val rows = df.orderBy("ID").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1.0, "alpha", 10.5), (2.0, "beta", -3.25), (3.0, "gamma", 99.0),
      (4.0, "delta", 0.125), (5.0, "epsilon", 7.75)))
  }

  test("64-bit sas7bdat: 8-byte ints, 24-byte pointers, 8-byte signatures") {
    val df = SasReader.read(spark, s"$Fixtures/sample64.sas7bdat")
    assert(df.schema.fieldNames.toSeq == Seq("ID", "NAME", "SCORE"))
    val rows = df.orderBy("ID").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (10.0, "first", 1.5), (20.0, "second", 2.5), (30.0, "third", -4.75)))
  }

  test("a file truncated mid-page stops at the last whole page, no failure") {
    val whole = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$Fixtures/sample.sas7bdat"))
    // header (1024) + the single 4096-byte page cut short: no complete
    // page survives => metadata-incomplete error, NOT an EOF crash
    val cut = java.util.Arrays.copyOf(whole, 1024 + 100)
    val e = intercept[IllegalArgumentException] {
      SasReader.parseMeta(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(cut)))
    }
    assert(e.getMessage.contains("incomplete sas7bdat metadata"))
    // the intact file still reads all 5 rows (control)
    val (meta, pages) = SasReader.parseMeta(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(whole)))
    assert(SasReader.rows(meta, pages).size == 5)
  }

  test("non-sas bytes raise a clear bad-magic error") {
    val junk = Array.fill[Byte](512)(0x41)
    val e = intercept[IllegalArgumentException] {
      SasReader.parseMeta(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(junk)))
    }
    assert(e.getMessage.contains("bad magic"))
  }
}
