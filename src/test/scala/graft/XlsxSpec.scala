package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.XlsxReader

class XlsxSpec extends AnyFunSuite {
  import TestSpark._

  test("column reference letters map to 0-based indexes") {
    assert(XlsxReader.colIndex("A1") == 0)
    assert(XlsxReader.colIndex("Z9") == 25)
    assert(XlsxReader.colIndex("AA12") == 26)
    assert(XlsxReader.colIndex("BC7") == 54)
  }

  private def xlsxBytes(sheet: String): Array[Byte] = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(("""<?xml version="1.0"?><worksheet xmlns="http://schemas.""" +
      """openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      sheet + "</sheetData></worksheet>").getBytes("UTF-8"))
    z.closeEntry(); z.close()
    bos.toByteArray
  }

  test("cells WITHOUT the optional r attribute fill sequential columns") {
    // ECMA-376: c/@r is optional (absent = next column) — minimal
    // generators omit it; dropping those cells read valid files as empty
    val (headers, rows) = XlsxReader.parseGrid(new java.io.ByteArrayInputStream(
      xlsxBytes("""<row><c t="inlineStr"><is><t>id</t></is></c>""" +
        """<c t="inlineStr"><is><t>name</t></is></c></row>""" +
        """<row><c><v>1</v></c><c t="inlineStr"><is><t>a</t></is></c></row>""" +
        // mixed: explicit C ref then implicit next (D)
        """<row r="3"><c r="C3"><v>9</v></c><c><v>8</v></c></row>""")))
    assert(headers.take(2).toSeq == Seq("id", "name"))
    assert(rows(0).take(2).toSeq == Seq("1", "a"))
    assert(rows(1).toSeq.drop(2) == Seq("9", "8")) // C then implicit D
  }

  test("multi-file directories align columns by HEADER NAME, not position") {
    // second workbook swaps the column order: positional binding would
    // silently put names into the id column
    val dir = java.nio.file.Files.createTempDirectory("xlsx_align")
    java.nio.file.Files.write(dir.resolve("a.xlsx"), xlsxBytes(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>name</t></is></c></row>""" +
        """<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>x</t></is></c></row>"""))
    java.nio.file.Files.write(dir.resolve("b.xlsx"), xlsxBytes(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c><c r="B1" t="inlineStr"><is><t>id</t></is></c></row>""" +
        """<row r="2"><c r="A2" t="inlineStr"><is><t>y</t></is></c><c r="B2"><v>2</v></c></row>"""))
    val got = XlsxReader.read(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "x"), (2L, "y")), got)
  }

  test("reads the committed workbook: schema inference, shared strings, sparse cells") {
    val df = XlsxReader.read(spark, s"$Fixtures/sample.xlsx")
    val bySchema = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(bySchema("item_id") == LongType)      // all-integral column
    assert(bySchema("item_name") == StringType)  // shared strings
    assert(bySchema("qty") == LongType)
    assert(bySchema("unit_price") == DoubleType) // mixed 19.99 / 120
    val rows = df.orderBy("item_id").collect()
    assert(rows.length == 5)
    assert(rows(0).getLong(0) == 101L && rows(0).getString(1) == "widget")
    assert(rows(2).isNullAt(rows(2).fieldIndex("category"))) // omitted cell -> null
    assert(rows(3).getDouble(rows(3).fieldIndex("unit_price")) == 120.0)
    assert(rows.map(_.getString(1)).contains("spr&ocket")) // XML entity decode
  }
}
