package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.sources.Hdf5Reader

/** Fixtures: the .h5 files under testfiles/hdf5 are the reference's own public test files
  * (contrib/format-hdf5/src/test/resources/hdf5/, ASL-2.0) and every
  * expected value below is transcribed from the reference's
  * TestHDF5Format.java — an INDEPENDENT validator: the reference produced
  * these rows through the jhdf library, graft's hand-rolled parser must
  * land on the same decode. Browse-mode differences from the reference are
  * deliberate Spark adaptations: a FIXED schema (typed previews in
  * int_data/double_data/string_data instead of ragged per-leaf columns,
  * attributes as map<string,string>) — the projected values are identical. */
class Hdf5Spec extends AnyFunSuite {
  import TestSpark._

  private def h5(f: String) = s"$Fixtures/hdf5/$f"

  // ---- dset.h5: 4x6 big-endian int32, contiguous ---------------------
  test("browse dset.h5: single dataset row with metadata and int preview") {
    val rows = Hdf5Reader.read(spark, h5("dset.h5")).collect()
    assert(rows.length == 1) // reference testSerDe: COUNT(*) == 1
    val r = rows.head
    assert(r.getString(r.fieldIndex("path")) == "/dset")
    assert(r.getString(r.fieldIndex("data_type")) == "DATASET")
    assert(r.getString(r.fieldIndex("file_name")) == "dset.h5")
    assert(r.getLong(r.fieldIndex("data_size")) == 96L)
    assert(r.getLong(r.fieldIndex("element_count")) == 24L)
    assert(r.getString(r.fieldIndex("dataset_data_type")) == "int")
    assert(r.getString(r.fieldIndex("dimensions")) == "[4, 6]")
    assert(!r.getBoolean(r.fieldIndex("is_link")))
    val preview = r.getSeq[scala.collection.Seq[Long]](r.fieldIndex("int_data"))
      .map(_.toList).toList
    assert(preview == List(List(1L, 2L, 3L, 4L, 5L, 6L), List(7L, 8L, 9L, 10L, 11L, 12L),
      List(13L, 14L, 15L, 16L, 17L, 18L), List(19L, 20L, 21L, 22L, 23L, 24L)))
  }

  test("project dset.h5 /dset: big-endian int32 matrix as int_col_* rows") {
    val df = Hdf5Reader.readDataset(spark, h5("dset.h5"), "/dset")
    assert(df.schema.fieldNames.toSeq ==
      (0 until 6).map(k => s"int_col_$k"))
    assert(df.schema.fields.forall(_.dataType.typeName == "integer"))
    val rows = df.collect().map(_.toSeq.map(_.asInstanceOf[Int]))
    assert(rows.toSeq == Seq(
      Seq(1, 2, 3, 4, 5, 6), Seq(7, 8, 9, 10, 11, 12),
      Seq(13, 14, 15, 16, 17, 18), Seq(19, 20, 21, 22, 23, 24)))
  }

  // ---- scalar.h5: every scalar type, chunked layouts ------------------
  test("project scalar.h5 typed 1-D datasets: extreme values decode exactly") {
    def vals[T](path: String): Seq[Any] =
      Hdf5Reader.readDataset(spark, h5("scalar.h5"), path).collect().map(_.get(0)).toSeq
    assert(vals("/datatype/int32") ==
      Seq(Int.MinValue, 1, 2, 3, 4, 5, 6, 7, 8, Int.MaxValue))
    assert(vals("/datatype/int64") ==
      Seq(Long.MinValue, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, Long.MaxValue))
    assert(vals("/datatype/float32") == Seq(Float.MinValue, 1f, 2f, 3f, 4f,
      5f, 6f, 7f, 8f, Float.MaxValue))
    assert(vals("/datatype/float64") == Seq(-Double.MaxValue, 1.0, 2.0, 3.0,
      4.0, 5.0, 6.0, 7.0, 8.0, Double.MaxValue))
    // fixed strings keep their padding contract: spaces kept, NULs trimmed
    assert(vals("/datatype/s10") ==
      Seq("a         ", "", "", "", "", "", "", "", "", "abcdefghij"))
    // vlen strings resolve through the global heap (UTF-8)
    assert(vals("/datatype/unicode") == Seq("a", "Ελληνικά", "日本語",
      "العربية", "экземпляр", "סקרן", "", "", "", "abcdefghij"))
  }

  test("project scalar.h5 /nd/*: reference flatten shapes for 1/2/3/4-D") {
    val d1 = Hdf5Reader.readDataset(spark, h5("scalar.h5"), "/nd/1D")
    assert(d1.schema.fieldNames.toSeq == Seq("1D"))
    assert(d1.collect().map(_.getInt(0)).take(5).toSeq ==
      Seq(Int.MinValue, 1, 2, 3, 4))

    val d2 = Hdf5Reader.readDataset(spark, h5("scalar.h5"), "/nd/2D")
    assert(d2.schema.fieldNames.length == 10)
    val r2 = d2.collect().map(_.toSeq.map(_.asInstanceOf[Int]))
    assert(r2.head.take(3) == Seq(Int.MinValue, 1, 2))
    assert(r2.last.last == Int.MaxValue)

    // >2-D: row i, col k = (leading block k, last-dim position i),
    // dims(0) x dims(1) — the reference's exact flatten-transpose
    val r3 = Hdf5Reader.readDataset(spark, h5("scalar.h5"), "/nd/3D")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(r3.toSeq == Seq((Int.MinValue, 5), (1, 6), (2, 7), (3, 8)))

    val r4 = Hdf5Reader.readDataset(spark, h5("scalar.h5"), "/nd/4D")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(r4.toSeq == Seq((Int.MinValue, 5), (1, 6)))
  }

  // ---- non-scalar.h5: compound datatype -------------------------------
  test("project non-scalar.h5 /compound: member columns, mixed types") {
    val df = Hdf5Reader.readDataset(spark, h5("non-scalar.h5"), "/compound")
    assert(df.schema.fieldNames.toSeq == Seq("field_1", "field_2", "field_3"))
    val rows = df.filter(col("field_1") < 5).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq((0, 0.0, "0"), (1, 1.0, "1"), (2, 2.0, "2"),
      (3, 3.0, "3"), (4, 4.0, "4")))
    assert(df.count() == 100)
  }

  // ---- browsing.h5: groups, attributes, links, scalar datasets --------
  test("browse browsing.h5: dataset listing matches the reference filter") {
    val df = Hdf5Reader.read(spark, h5("browsing.h5"))
    val datasets = df.filter(col("data_type") === "DATASET")
      .collect().map(_.getString(0)).sorted
    assert(datasets.toSeq == Seq("/groupA/date", "/groupA/string",
      "/groupB/dmat", "/groupB/inarr"))
    // attribute filter: only /groupB carries important=false
    val byAttr = df.filter(col("attributes")("important") === "false")
      .collect().map(_.getString(0))
    assert(byAttr.toSeq == Seq("/groupB"))
    // soft link surfaced, not traversed
    val links = df.filter(col("is_link")).collect()
    assert(links.map(_.getString(0)).toSeq == Seq("/groupB/groupC"))
    assert(links.head.getMap[String, String](links.head.fieldIndex("attributes"))
      .get("target").contains("/groupA/groupC"))
    // 2-D double preview (reference FLATTEN test values)
    val dmat = df.filter(col("path") === "/groupB/dmat").collect().head
    val m = dmat.getSeq[scala.collection.Seq[Double]](dmat.fieldIndex("double_data"))
      .map(_.toList).toList
    assert(m == List(List(1.1, 2.2, 3.3), List(4.4, 5.5, 6.6), List(7.7, 8.8, 9.9)))
  }

  test("foreign files refuse with clear errors") {
    val bad = java.nio.file.Files.createTempFile("nothdf", ".h5")
    val e = intercept[Exception] {
      try {
        java.nio.file.Files.write(bad, ("PAR1" + "x" * 120).getBytes)
        Hdf5Reader.read(spark, bad.toString).collect()
      } finally java.nio.file.Files.deleteIfExists(bad)
    }
    assert(e.getMessage.contains("not an HDF5 file"))
  }
}
