package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AccessReader, DfdlReader, SasReader}

/** Regressions from a binary stat-reader hardening review (SAS/SPSS/
  * HDF5/Access/DFDL): name-based multi-file alignment, unsigned-long
  * binary decode, case-insensitive gz detection, and OLE pre-epoch
  * date semantics. The executor-side SerializableHadoopConf fix is
  * compile-verified (local fs needs no credentials to observe). */
class ReaderHardeningSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): java.nio.file.Path = {
    val d = java.nio.file.Paths.get(s"/tmp/graft_test/rdr_$name")
    val p = new org.apache.hadoop.fs.Path(d.toString)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    java.nio.file.Files.createDirectories(d)
    d
  }

  test("SAS directory read merges 32- and 64-bit files by column NAME") {
    val d = freshDir("sasdir")
    for (f <- Seq("sample.sas7bdat", "sample64.sas7bdat"))
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$Fixtures/$f"),
        d.resolve(f))
    val rows = SasReader.read(spark, d.toString).orderBy("ID").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2)))
    // both files share (ID, NAME, SCORE): the aligned union keeps every
    // value under its own column
    assert(rows.length == 8)
    assert(rows.contains((1.0, "alpha", 10.5)))
    assert(rows.contains((30.0, "third", -4.75)))
  }

  test("OLE date decode: pre-1899-12-30 fraction is time-of-day, not negative") {
    // OLE/Jet: -1.25 = 1899-12-29 (date part -1) at 06:00 (|fraction|)
    def ts(days: Double) = AccessReader.daysToTimestamp(days)
      .toInstant.atOffset(java.time.ZoneOffset.UTC).toString
    assert(ts(-1.25).startsWith("1899-12-29T06:00"),
      s"got ${ts(-1.25)}")
    assert(ts(0.5).startsWith("1899-12-30T12:00"))
    assert(ts(1.25).startsWith("1899-12-31T06:00"))
    assert(ts(2.0).startsWith("1900-01-01T00:00"))
  }

  private def unsignedLongSchema(dir: java.nio.file.Path): String = {
    val p = dir.resolve("ul.dfdl.xsd")
    java.nio.file.Files.write(p,
      """<?xml version="1.0" encoding="UTF-8"?>
        |<schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
        |        xmlns="http://www.w3.org/2001/XMLSchema"
        |        xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/"
        |        xmlns:ex="http://example.com"
        |        targetNamespace="http://example.com">
        |  <annotation><appinfo source="http://www.ogf.org/dfdl/">
        |    <dfdl:format ref="ex:GeneralFormat" representation="binary"/>
        |  </appinfo></annotation>
        |  <element name="row" type="ex:rowType"/>
        |  <complexType name="rowType">
        |    <sequence>
        |      <element name="big" type="xs:unsignedLong"/>
        |    </sequence>
        |  </complexType>
        |</schema>
        |""".stripMargin.getBytes("UTF-8"))
    p.toString
  }

  test("DFDL binary xs:unsignedLong decodes >= 2^63 as Decimal(20,0)") {
    val d = freshDir("dfdl_ul")
    val schema = unsignedLongSchema(d)
    // 2^63 + 5 big-endian: 0x8000000000000005
    val bytes = Array[Byte](0x80.toByte, 0, 0, 0, 0, 0, 0, 5)
    java.nio.file.Files.write(d.resolve("data.dat"), bytes)
    val df = DfdlReader.read(spark, d.resolve("data.dat").toString, schema)
    assert(df.schema.fields.head.dataType ==
      org.apache.spark.sql.types.DecimalType(20, 0))
    val got = df.collect().head.getDecimal(0)
    assert(got.toBigInteger.toString == "9223372036854775813", got)
  }

  test("DFDL gz detection is case-insensitive (DATA.GZ decompresses)") {
    val d = freshDir("dfdl_gz")
    val schema = unsignedLongSchema(d)
    val bytes = Array[Byte](0, 0, 0, 0, 0, 0, 1, 1) // 257
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    java.nio.file.Files.write(d.resolve("DATA.GZ"), bos.toByteArray)
    val df = DfdlReader.read(spark, d.resolve("DATA.GZ").toString, schema)
    assert(df.collect().head.getDecimal(0).longValueExact() == 257L)
  }
}
