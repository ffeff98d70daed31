package graft

import org.scalatest.funsuite.AnyFunSuite

/** BSON dump reader (reference contrib/storage-mongo — re-expressed
  * zero-egress over the public bsonspec.org format, the bytes
  * `mongodump` writes): byte-exact fixtures through the same framing,
  * decoded back through the JSON bridge. */
class BsonSpec extends AnyFunSuite {
  import TestSpark._
  import graft.sources.BsonReader
  import graft.sources.BsonReader._

  private def freshDir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"bson_$name").toString

  test("full type-matrix document round-trips through the JSON bridge") {
    val dir = freshDir("types")
    val doc = documentBytes(Seq(
      "_id" -> ObjectId("507f1f77bcf86cd799439011"),
      "name" -> "alpha \"quoted\" \n tab\t",
      "count" -> 42,
      "big" -> 9007199254740993L,
      "ratio" -> 2.5,
      "ok" -> true,
      "nothing" -> null,
      "created" -> BsonDateTime(1700000000123L),
      "optime" -> BsonTimestamp(7L),
      "blob" -> BsonBinary(Array[Byte](1, 2, 3)),
      // subtype 2 ("old binary"): the writer wraps the inner int32
      // length per spec and decoders must strip it — callers pass the
      // LOGICAL payload
      "oldblob" -> BsonBinary(Array[Byte](9, 8, 7), subtype = 2),
      "pat" -> BsonRegex("^a.*b$", "i"),
      "price" -> BsonDecimal128(0x3040000000000000L, 12345L), // 12345 E0
      "cents" -> BsonDecimal128(0x303C000000000000L, 12345L), // 123.45
      "nested" -> Seq("x" -> 1, "y" -> Seq("deep" -> "v")),
      "arr" -> Seq(1, 2, 3),
      "lo" -> MinKey,
      "hi" -> MaxKey))
    BsonReader.writeDump(spark, dir, "stuff", Seq(doc))
    val row = BsonReader.read(spark, dir).collect()(0)
    def g(n: String) = row.get(row.fieldIndex(n))
    assert(g("_id") == "507f1f77bcf86cd799439011")
    assert(g("name") == "alpha \"quoted\" \n tab\t")
    assert(g("count") == 42L)      // JSON integers infer long
    assert(g("big") == 9007199254740993L) // survives (no double round)
    assert(g("ratio") == 2.5)
    assert(g("ok") == true)
    assert(row.isNullAt(row.fieldIndex("nothing")) ||
      !row.schema.fieldNames.contains("nothing"))
    assert(g("created") == 1700000000123L)
    assert(g("optime") == 7L)
    assert(g("blob") == java.util.Base64.getEncoder
      .encodeToString(Array[Byte](1, 2, 3)))
    assert(g("oldblob") == java.util.Base64.getEncoder
      .encodeToString(Array[Byte](9, 8, 7))) // inner length stripped
    assert(g("pat") == "/^a.*b$/i")
    assert(g("price") == "12345")  // decimal128 -> exact STRING
    assert(g("cents") == "123.45")
    val nested = row.getStruct(row.fieldIndex("nested"))
    assert(nested.get(nested.fieldIndex("x")) == 1L)
    assert(g("arr") == Seq(1L, 2L, 3L))
  }

  test("heterogeneous documents unify schema-on-read; explicit schema " +
      "skips inference; corrupt doc fails loudly") {
    val dir = freshDir("hetero")
    BsonReader.writeDump(spark, dir, "mixed", Seq(
      documentBytes(Seq("id" -> 1, "a" -> "only-here")),
      documentBytes(Seq("id" -> 2, "b" -> 9.5))))
    val df = BsonReader.read(spark, dir)
    assert(df.columns.toSet == Set("id", "a", "b"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[String]("a") == "only-here" && rows(0).isNullAt(
      rows(0).fieldIndex("b")))
    assert(rows(1).getAs[Double]("b") == 9.5)

    // pinned schema: no inference pass, declared types win
    import org.apache.spark.sql.types._
    val pinned = BsonReader.read(spark, dir, Some(StructType(Seq(
      StructField("id", LongType), StructField("b", DoubleType)))))
    assert(pinned.columns.toSeq == Seq("id", "b"))
    assert(pinned.count() == 2)

    // a document whose declared size is impossible fails loudly
    val dir2 = freshDir("corrupt")
    BsonReader.writeDump(spark, dir2, "bad",
      Seq(Array[Byte](3, 0, 0, 0, 0))) // size=3 < minimum 5
    val e = intercept[Exception] {
      BsonReader.jsonStrings(spark, dir2).collect()
    }
    assert(causeChain(e).contains("minimum 5"), causeChain(e))
  }

  test("GOLDEN bytes: the two bsonspec.org example documents decode " +
      "(bytes NOT produced by documentBytes)") {
    // Verbatim from bsonspec.org/faq.html:
    //   {"hello": "world"} and {"BSON": ["awesome", 5.05, 1986]}
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val helloWorld = hx("160000000268656c6c6f0006000000776f726c640000")
    val bsonArray = hx("310000000442534f4e00260000000230000800000061" +
      "7765736f6d65000131003333333333331440103200c20700000000")
    assert(helloWorld.length == 0x16 && bsonArray.length == 0x31)
    val dir = freshDir("golden")
    BsonReader.writeDump(spark, dir, "g", Seq(helloWorld, bsonArray))
    val js = BsonReader.jsonStrings(spark, dir).collect().toSet
    assert(js == Set("""{"hello":"world"}""",
      """{"BSON":["awesome",5.05,1986]}"""), js)
  }

  test("decimal128 non-canonical coefficients (>= 10^34) decode as zero " +
      "on BOTH encoding paths; canonical max survives exactly") {
    val dir = freshDir("dec128")
    BsonReader.writeDump(spark, dir, "d", Seq(documentBytes(Seq(
      // normal path (comb 01100), coeff = 10^34, exp 0 -> non-canonical
      "noncanon" -> BsonDecimal128(0x3041ED09BEAD87C0L, 0x378D8E6400000000L),
      // canonical max: 10^34 - 1
      "canonmax" -> BsonDecimal128(0x3041ED09BEAD87C0L, 0x378D8E63FFFFFFFFL),
      // negative non-canonical with nonzero exponent keeps sign/exp
      "negexp" -> BsonDecimal128(0xB045ED09BEAD87C0L, 0x378D8E6400000000L)))))
    val row = BsonReader.read(spark, dir).collect()(0)
    def g(n: String) = row.getString(row.fieldIndex(n))
    assert(g("noncanon") == "0")
    assert(g("canonmax") == "9999999999999999999999999999999999")
    assert(g("negexp") == "-0E2")
  }

  test("corrupt string length surfaces as a contextual IOException, " +
      "not a bare StringIndexOutOfBoundsException") {
    // doc: size 13, one string element "a" declaring 100 bytes it
    // doesn't have — new String overruns as StringIndexOutOfBounds,
    // which must wrap into the file-context IOException
    val corrupt = Array[Byte](13, 0, 0, 0, 0x02, 'a'.toByte, 0,
      100, 0, 0, 0, 'x'.toByte, 0)
    val dir = freshDir("badstr")
    BsonReader.writeDump(spark, dir, "bad", Seq(corrupt))
    val e = intercept[Exception] {
      BsonReader.jsonStrings(spark, dir).collect()
    }
    assert(causeChain(e).contains("corrupt BSON document"), causeChain(e))
  }

  test("one task per dump file; multi-collection dirs read together") {
    val dir = freshDir("multi")
    BsonReader.writeDump(spark, dir, "c1",
      (1 to 3).map(i => documentBytes(Seq("id" -> i, "src" -> "c1"))))
    BsonReader.writeDump(spark, dir, "c2",
      (4 to 5).map(i => documentBytes(Seq("id" -> i, "src" -> "c2"))))
    val df = BsonReader.read(spark, dir)
    assert(df.count() == 5)
    assert(BsonReader.jsonStrings(spark, dir).rdd.getNumPartitions == 2)
    assert(df.groupBy("src").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("c1", 3L), ("c2", 2L)))
  }
}
