package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.BinaryRow

/** Golden-byte assertions for the hand-rolled Flink/Paimon BinaryRow
  * codec (sources/BinaryRow.scala): exact byte arrays, hand-computed
  * from the published layout (Flink BinaryRowData/BinaryRowWriter,
  * forked as org.apache.paimon.data.BinaryRow), not just round-trips —
  * a codec bug symmetric in encode/decode round-trips clean but writes
  * manifests a real paimon reader cannot decode. Cases target the
  * compact-slot boundaries: len 7 vs len 8 strings, null bits past bit
  * 8, negative compact decimals, and the arities around the 64-bit
  * null-region boundary (8 header bits + arity bits: arity 56 is the
  * last single-word layout, 57 takes two words). */
class BinaryRowSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("golden: len-7 string packs COMPACT into the slot") {
    // arity 1: null region ((1+71)/64)*8 = 8 bytes (byte 0 = row-kind
    // header, bit 8 = field 0's null bit); slot at offset 8.
    // "abcdefg" <= 7 bytes: slot holds ((7|0x80)<<56) | data, data byte
    // k at bits 8k — under LE the mark byte 0x87 lands at slot byte 7.
    val got = BinaryRow.encode(Seq("abcdefg"), Seq(StringType))
    assert(got.toSeq == bytes(
      0, 0, 0, 0, 0, 0, 0, 0,
      0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x87).toSeq)
  }

  test("golden: len-8 string spills to the var part") {
    // 8 bytes > 7: var chunk appends after the fixed part (offset 16
    // from row start), slot = (offset << 32) | len, LE.
    val got = BinaryRow.encode(Seq("abcdefgh"), Seq(StringType))
    assert(got.toSeq == bytes(
      0, 0, 0, 0, 0, 0, 0, 0,
      0x08, 0, 0, 0, 0x10, 0, 0, 0,
      0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68).toSeq)
  }

  test("golden: var part pads to 8-byte chunks") {
    // 9 bytes round to a 16-byte chunk, zero-padded
    val got = BinaryRow.encode(Seq("abcdefghi"), Seq(StringType))
    assert(got.length == 8 + 8 + 16)
    assert(got.toSeq.drop(16) == bytes(0x61, 0x62, 0x63, 0x64, 0x65,
      0x66, 0x67, 0x68, 0x69, 0, 0, 0, 0, 0, 0, 0).toSeq)
    assert(got.toSeq.slice(8, 16) == bytes(0x09, 0, 0, 0, 0x10, 0, 0, 0).toSeq)
  }

  test("golden: null bits sit past the 8 header bits") {
    // field 0 null -> bit 8 = byte 1 bit 0; field 1 null -> bit 9 =
    // byte 1 bit 1; slots stay zero
    val g0 = BinaryRow.encode(Seq(null, java.lang.Long.valueOf(5L)),
      Seq(LongType, LongType))
    assert(g0.toSeq == bytes(
      0, 0x01, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0,
      5, 0, 0, 0, 0, 0, 0, 0).toSeq)
    val g1 = BinaryRow.encode(Seq(java.lang.Long.valueOf(5L), null),
      Seq(LongType, LongType))
    assert(g1.toSeq == bytes(
      0, 0x02, 0, 0, 0, 0, 0, 0,
      5, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0).toSeq)
  }

  test("golden: negative compact decimal is the two's-complement unscaled long") {
    // DECIMAL(5,2) -3.75 -> unscaled -375 = 0xFFFFFFFFFFFFFE89 LE
    val got = BinaryRow.encode(Seq(new java.math.BigDecimal("-3.75")),
      Seq(DecimalType(5, 2)))
    assert(got.toSeq == bytes(
      0, 0, 0, 0, 0, 0, 0, 0,
      0x89, 0xFE, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF).toSeq)
    assert(BinaryRow.decode(got, Seq(DecimalType(5, 2))).head ==
      new java.math.BigDecimal("-3.75"))
  }

  test("golden: 9-field row stays in ONE null-bits word") {
    // ((9+71)/64)*8 = 8: arity 9 does NOT cross the word boundary
    val vals = (1 to 9).map(i => java.lang.Long.valueOf(i.toLong))
    val got = BinaryRow.encode(vals, Seq.fill(9)(LongType))
    assert(got.length == 8 + 72)
    assert(got.toSeq.take(8) == bytes(0, 0, 0, 0, 0, 0, 0, 0).toSeq)
    (1 to 9).foreach { i =>
      assert(got(8 * i) == i.toByte && got.slice(8 * i + 1, 8 * i + 8).forall(_ == 0))
    }
  }

  test("golden: arity 56 vs 57 — the real 64-bit null-region boundary") {
    assert(BinaryRow.nullBitsSizeInBytes(56) == 8)
    assert(BinaryRow.nullBitsSizeInBytes(57) == 16)
    // arity 57, field 56 null: bit 56+8 = 64 -> byte 8 bit 0 (the
    // SECOND word). Slots start at 16.
    val vals: Seq[Any] =
      (0 until 56).map(i => java.lang.Long.valueOf(i.toLong)) :+ null
    val got = BinaryRow.encode(vals, Seq.fill(57)(LongType))
    assert(got.length == 16 + 57 * 8)
    assert(got(8) == 0x01.toByte)             // word-2 null bit
    assert(got.slice(0, 8).forall(_ == 0))    // word 1 untouched
    assert(got(16) == 0 && got(16 + 8) == 1)  // slot values follow at 16
    val back = BinaryRow.decode(got, Seq.fill(57)(LongType))
    assert(back(55) == 55L && back(56) == null)
  }

  test("golden: mixed tuple (int, compact string, null)") {
    val got = BinaryRow.encode(
      Seq(java.lang.Integer.valueOf(7), "x", null),
      Seq(IntegerType, StringType, StringType))
    assert(got.toSeq == bytes(
      0, 0x04, 0, 0, 0, 0, 0, 0,          // field 2 null -> bit 10
      7, 0, 0, 0, 0, 0, 0, 0,             // int at slot start, LE
      0x78, 0, 0, 0, 0, 0, 0, 0x81,       // "x" compact, mark 0x81
      0, 0, 0, 0, 0, 0, 0, 0).toSeq)
  }

  test("round-trips across every supported type") {
    val types = Seq(BooleanType, ByteType, ShortType, IntegerType,
      LongType, FloatType, DoubleType, DateType, TimestampType,
      DecimalType(10, 3), StringType, BinaryType)
    val vals: Seq[Any] = Seq(java.lang.Boolean.TRUE,
      java.lang.Byte.valueOf(7.toByte), java.lang.Short.valueOf(300.toShort),
      java.lang.Integer.valueOf(-12345), java.lang.Long.valueOf(1L << 40),
      java.lang.Float.valueOf(1.5f), java.lang.Double.valueOf(-2.25),
      java.time.LocalDate.of(2026, 2, 17),
      java.time.Instant.ofEpochMilli(1700000000123L),
      new java.math.BigDecimal("12345.678"),
      "partition value with spaces", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    val back = BinaryRow.decode(BinaryRow.encode(vals, types), types)
    vals.zip(back).zipWithIndex.foreach { case ((v, b), i) =>
      (v, b) match {
        case (a: Array[Byte], bb: Array[Byte]) => assert(a.sameElements(bb), s"field $i")
        case _ => assert(v == b, s"field $i")
      }
    }
  }

  test("non-compact decimal and nested types refuse") {
    val e = intercept[IllegalArgumentException] {
      BinaryRow.encode(Seq(new java.math.BigDecimal("1")),
        Seq(DecimalType(28, 2)))
    }
    assert(e.getMessage.contains("unsupported"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      BinaryRow.encode(Seq(null), Seq(ArrayType(LongType)))
    }
    assert(e2.getMessage.contains("unsupported"), e2.getMessage)
  }
}
