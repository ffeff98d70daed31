package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DfdlReader

/** Fixtures: the DFDL schemas and .dat files under testfiles/dfdl are the
  * reference's own public test resources (contrib/format-daffodil, ASL-2.0)
  * and every expected value below is transcribed from its
  * TestDaffodilReader.java — an INDEPENDENT validator: the reference
  * parsed these files through Apache Daffodil, graft's hand-rolled DFDL
  * subset interpreter must land on the same decode. */
class DfdlSpec extends AnyFunSuite {
  import TestSpark._

  private val D = s"$Fixtures/dfdl"
  private def read(data: String, schema: String) =
    DfdlReader.read(spark, s"$D/$data", s"$D/$schema.dfdl.xsd")

  test("binary int rows, including a gz-compressed file") {
    val one = read("data01Int.dat.gz", "simple")
    assert(one.schema.fieldNames.toSeq == Seq("col"))
    assert(one.collect().map(_.getInt(0)).toSeq == Seq(257))
    val six = read("data06Int.dat", "simple")
    assert(six.collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(257, 258, 259, 260, 261, 262))
  }

  test("two-int complex rows") {
    val r1 = read("data02Int.dat", "complex1").collect()
    assert(r1.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((257, 258)))
    val r3 = read("data06Int.dat", "complex1").collect()
    assert(r3.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((257, 258), (259, 260), (261, 262)))
  }

  test("unbounded simple array field: one row holding all twelve ints") {
    val rows = read("data12Int.dat", "simpleArrayField1").collect()
    assert(rows.length == 1)
    assert(rows.head.getSeq[Int](0).toSeq ==
      Seq(257, 258, 259, 260, 261, 262, 257, 258, 259, 260, 261, 262))
  }

  test("array of maps: {257, 258, [{259, 260}, ... ]}") {
    val rows = read("data12Int.dat", "complexArray1").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getInt(0) == 257 && r.getInt(1) == 258)
    val b = r.getSeq[org.apache.spark.sql.Row](2)
      .map(m => (m.getInt(0), m.getInt(1)))
    assert(b.toSeq == Seq((259, 260), (261, 262), (257, 258), (259, 260), (261, 262)))
  }

  test("array of maps holding bounded int vectors (greedy maxOccurs=3)") {
    val rows = read("data12Int.dat", "complexArray2").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getInt(0) == 257 && r.getInt(1) == 258)
    val b = r.getSeq[org.apache.spark.sql.Row](2)
      .map(m => (m.getInt(0), m.getSeq[Int](1).toList))
    assert(b.toSeq == Seq(
      (259, List(260, 261, 262)), (257, List(258, 259, 260)), (261, List(262))))
  }

  test("delimited text: signed types, boolean reps, hexBinary, quoted string") {
    val df = read("moreTypes1.txt.dat", "moreTypes1")
    assert(df.schema.fieldNames.toSeq == Seq("int", "long", "short", "byte",
      "boolean", "double", "float", "hexBinary", "string"))
    val rows = df.collect()
    assert(rows.length == 2)
    val r0 = rows.head
    assert(r0.getInt(0) == Int.MaxValue && r0.getLong(1) == Long.MaxValue)
    assert(r0.getShort(2) == Short.MaxValue && r0.getByte(3) == Byte.MaxValue)
    assert(r0.getBoolean(4))
    assert(r0.getDouble(5) == Double.MaxValue && r0.getFloat(6) == Float.MaxValue)
    assert(r0.getAs[Array[Byte]](7).toSeq ==
      Seq(0x31, 0x32, 0x33, 0x34, 0x35, 0x36, 0x37, 0x38).map(_.toByte))
    assert(r0.getString(8) == "daffodil") // initiator/terminator quotes stripped
    val r1 = rows(1)
    assert(r1.getInt(0) == Int.MinValue && !r1.getBoolean(4))
    assert(r1.getString(8) == "drill")
    assert(r1.getAs[Array[Byte]](7).head == 0x38.toByte)
  }

  test("delimited text: unsigned/unbounded integers, decimal, date/time") {
    val rows = read("moreTypes2.txt.dat", "moreTypes2").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 4294967295L) // unsignedInt
    assert(r.getDecimal(1).toPlainString == "18446744073709551615") // unsignedLong
    assert(r.getInt(2) == 65535 && r.getShort(3) == 255)
    assert(r.getDecimal(4).toPlainString == "-18446744073709551616") // xs:integer
    assert(r.getDecimal(5).toPlainString == "18446744073709551616")
    assert(r.getString(6) == "0.18446744073709551616") // xs:decimal verbatim
    assert(r.getDate(7).toString == "1970-01-01")
    assert(r.getString(8) == "00:00:00+0000") // raw time text
    assert(r.getTimestamp(9).getTime == 0L) // 1970-01-01T00:00:00Z
  }
}
