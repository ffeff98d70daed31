package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SpssReader

/** Fixture: testfiles/testdata.sav is the reference's own public test file
  * (contrib/format-spss/src/test/resources/spss/testdata.sav, ASL-2.0) and
  * every expected value below is transcribed from the reference's
  * TestSpssReader.java — an INDEPENDENT validator: the reference produced
  * these rows through the com.bedatadriven spss-reader library, graft's
  * hand-rolled parser must land on the same decode. */
class SpssSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val df = SpssReader.read(spark, s"$Fixtures/testdata.sav")

  test("sav dictionary: long names, label companions, types, column order") {
    val expected = Seq(
      "ID", "Urban", "Urban_value", "District", "District_value",
      "Province", "Province_value", "Interviewer", "Date",
      "d6_1", "d6_1_value", "d6_2", "d6_2_value", "d6_3", "d6_3_value",
      "d6_4", "d6_4_value", "s_1", "d6_5", "d6_5_value",
      "d6_6", "d6_6_value", "d6_7", "d6_7_value",
      "q1", "q1_value", "q2", "q2_value", "d7a", "d7a_value",
      "d7b", "d7b_value", "d16", "Stratum", "S1_IP", "S2_IP",
      "Sample_Weight")
    assert(df.schema.fieldNames.map(_.toLowerCase).toSeq ==
      expected.map(_.toLowerCase))
    assert(df.schema("s_1").dataType.typeName == "string")
    assert(df.schema("Sample_Weight").dataType.typeName == "double")
    assert(df.schema("Urban_value").dataType.typeName == "string")
  }

  test("sav bytecode decompression: full case count") {
    assert(df.count() == 25L) // reference testSerDe: COUNT(*) == 25
  }

  test("sav values match the reference's decoded rows (WHERE d16=4)") {
    import org.apache.spark.sql.functions.col
    val rows = df.filter(col("d16") === 4.0).orderBy("ID").collect()
    assert(rows.length == 3)
    val r = rows.head
    def d(n: String) = r.getDouble(r.fieldIndex(n))
    def s(n: String) = r.getString(r.fieldIndex(n))
    assert(d("ID") == 47.0)
    assert(d("Urban") == 1.0 && s("Urban_value") == "Urban")
    assert(d("District") == 101.0 && s("District_value") == "Kabul")
    assert(d("Province") == 1.0 && s("Province_value") == "Kabul")
    assert(d("Interviewer") == 151.0)
    assert(d("Date") == 1.34557632e10) // raw SPSS epoch seconds, no coercion
    assert(d("d6_1") == 1.0 && s("d6_1_value") == "Yes")
    assert(d("d6_2") == 2.0 && s("d6_2_value") == "No")
    assert(s("s_1") == "") // all-spaces string decodes to empty, not null
    assert(d("q1") == 1.0 && s("q1_value") == "Good")
    assert(d("d7a") == 5.0 &&
      s("d7a_value") == "Housewife (not working outside of the home)")
    assert(d("d7b") == 97.0 && s("d7b_value") == "Not Asked")
    assert(d("Stratum") == 121.0)
    assert(math.abs(d("S1_IP") - 0.007463305415042708) < 1e-15)
    assert(math.abs(d("Sample_Weight") - 20098.33333333333) < 1e-9)
    assert(rows.map(_.getDouble(rows.head.fieldIndex("ID"))).toSeq ==
      Seq(47.0, 53.0, 66.0))
    val r3 = rows(2)
    assert(r3.getString(r3.fieldIndex("d7a_value")) == "Working full time")
    assert(math.abs(r3.getDouble(r3.fieldIndex("Sample_Weight")) - 8626.0) < 1e-9)
  }

  test("zlib ($FL3) and foreign-endian files refuse with a clear error") {
    val whole = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$Fixtures/testdata.sav"))
    val z = whole.clone(); z(3) = '3'.toByte // $FL2 -> $FL3
    val e1 = intercept[IllegalArgumentException] {
      SpssReader.parseMeta(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(z)))
    }
    assert(e1.getMessage.contains("zlib"))
    val be = whole.clone()
    // big-endian layout code: 02 00 00 00 -> 00 00 00 02
    be(64) = 0; be(67) = 2
    val e2 = intercept[IllegalArgumentException] {
      SpssReader.parseMeta(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(be)))
    }
    assert(e2.getMessage.contains("big-endian"))
  }
}
