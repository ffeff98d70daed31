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
