package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SchemaProvider

class SchemaProviderSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val base = s"/tmp/graft_test/schema_$name"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    new java.io.File(base).mkdirs()
    base
  }

  private def write(dir: String, name: String, content: String): Unit = {
    val w = new java.io.FileWriter(s"$dir/$name")
    try w.write(content) finally w.close()
  }

  test("declared schema persists and reloads (types + defaults)") {
    val base = freshDir("roundtrip")
    SchemaProvider.create(spark, base, "a BIGINT, b STRING",
      defaults = Map("b" -> "missing"))
    val d = SchemaProvider.load(spark, base).get
    assert(d.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(d.defaults == Map("b" -> "missing"))
    intercept[IllegalArgumentException](
      SchemaProvider.create(spark, base, "a INT")) // no replace
    SchemaProvider.create(spark, base, "a INT", replace = true)
    assert(SchemaProvider.load(spark, base).get.schema.fieldNames.toSeq == Seq("a"))
    assert(SchemaProvider.drop(spark, base))
    assert(SchemaProvider.load(spark, base).isEmpty)
  }

  test("bad DDL and defaults for undeclared columns are rejected, not stored") {
    val base = freshDir("reject")
    intercept[Exception](SchemaProvider.create(spark, base, "a NOTATYPE"))
    intercept[IllegalArgumentException](
      SchemaProvider.create(spark, base, "a INT", defaults = Map("zz" -> "1")))
    assert(SchemaProvider.load(spark, base).isEmpty)
  }

  test("headerless CSV: positional binding, null-on-dirty, default back-fill") {
    val base = freshDir("csv")
    write(base, "data.csv",
      "1,x,2.5\n2,y,oops\n3,z\n")
    SchemaProvider.create(spark, base, "id BIGINT, name STRING, v DOUBLE",
      defaults = Map("v" -> "0.0"))
    val rows = SchemaProvider.readCsv(spark, base)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // dirty 'oops' => null => default 0.0; short row => default 0.0
    assert(rows.toSeq == Seq((1L, "x", 2.5), (2L, "y", 0.0), (3L, "z", 0.0)))
  }

  test("JSON lines: by-name binding, absent keys take defaults, dirty cells null") {
    val base = freshDir("json")
    write(base, "data.jsonl",
      """{"id": 1, "v": "7"}""" + "\n" +
      """{"id": 2}""" + "\n" +
      """{"id": 3, "v": "NaNope"}""" + "\n")
    SchemaProvider.create(spark, base, "id BIGINT, v BIGINT, w STRING",
      defaults = Map("v" -> "-1", "w" -> "none"))
    val rows = SchemaProvider.readJson(spark, base)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 7L, "none"), (2L, -1L, "none"), (3L, -1L, "none")))
  }

  test("reading without a declared schema raises a clear error") {
    val base = freshDir("nodecl")
    write(base, "data.csv", "1,a\n")
    val e = intercept[IllegalArgumentException](SchemaProvider.readCsv(spark, base))
    assert(e.getMessage.contains("no declared schema"))
  }
}
