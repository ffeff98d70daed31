package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SchemaOnRead

class SchemaOnReadSpec extends AnyFunSuite {
  import TestSpark._

  test("syslog parser extracts pri/host/app/pid/message (SURVEY row 64)") {
    val rows = SchemaOnRead.syslog(spark, s"$Fixtures/syslog.log")
      .orderBy("ts_raw").collect()
    assert(rows.length == 3)
    val first = rows.find(_.getAs[String]("app") == "sshd").get
    assert(first.getAs[String]("host") == "host1")
    assert(first.getAs[String]("pid") == "912")
    assert(first.getAs[String]("message").startsWith("Failed password"))
    assert(first.getAs[Int]("facility") == 34 / 8)
    assert(first.getAs[Int]("severity") == 34 % 8)
    val noPid = rows.find(_.getAs[String]("message").contains("COMMAND")).get
    assert(noPid.getAs[String]("app").trim == "sudo")
    assert(noPid.getAs[String]("pid") == "") // no [pid] on that line
  }

  test("fixed-width reader slices declared columns (SURVEY row 66)") {
    val p = java.nio.file.Files.createTempFile("fw", ".txt")
    java.nio.file.Files.writeString(p,
      "alice  0312ny\n" +
      "bob    1145la\n")
    val df = SchemaOnRead.fixedWidth(spark, p.toString,
      Seq(("name", 1, 7), ("code", 8, 4), ("city", 12, 2)))
    val rows = df.orderBy("name").collect()
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("alice", "bob"))
    assert(rows.map(_.getAs[String]("code")).toSeq == Seq("0312", "1145"))
    assert(rows.map(_.getAs[String]("city")).toSeq == Seq("ny", "la"))
  }

  test("implicit file columns: fqn/filename/filepath/suffix (SURVEY row 67)") {
    val df = SchemaOnRead.withImplicitColumns(
      SchemaOnRead.csv(spark, s"$Fixtures/sample.csv"))
    val r = df.limit(1).collect()(0)
    assert(r.getAs[String]("filename") == "sample.csv")
    assert(r.getAs[String]("suffix") == "csv")
    assert(r.getAs[String]("fqn").endsWith("testfiles/sample.csv"))
    assert(r.getAs[String]("filepath").endsWith("testfiles"))
  }

  test("describeSchema lists one row per field (SURVEY row 39)") {
    val cust = GraftSession.table(spark, SF, "customer")
    val desc = SchemaOnRead.describeSchema(cust).collect()
    assert(desc.length == cust.schema.fields.length)
    val byName = desc.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName("c_custkey") == "bigint")
    assert(byName("c_name") == "string")
    assert(byName("c_acctbal") == "double")
  }

  test("inferJsonColumn discovers embedded JSON schema (SURVEY row 40)") {
    val ev = GraftSession.table(spark, SF, "events")
    val parsed = SchemaOnRead.inferJsonColumn(ev, "props")
    assert(parsed.schema.fieldNames.contains("props_parsed"))
    assert(parsed.filter(col("props_parsed").isNotNull).count() > 0)
  }

  test("store.json.all_text_mode: scalars read as strings (Drill session option)") {
    val dir = java.nio.file.Files.createTempDirectory("alltext").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, "a.jsonl"),
      "{\"v\": 1, \"w\": true}\n{\"v\": 2.5, \"w\": \"no\"}\n")
    val typed = SchemaOnRead.json(spark, dir)
    assert(typed.schema("v").dataType ==
      org.apache.spark.sql.types.DoubleType)
    spark.sql("ALTER SESSION SET `store.json.all_text_mode` = true")
    try {
      val text = SchemaOnRead.json(spark, dir)
      assert(text.schema("v").dataType ==
        org.apache.spark.sql.types.StringType)
      assert(text.schema("w").dataType ==
        org.apache.spark.sql.types.StringType)
      assert(text.orderBy("v").collect().map(_.getString(0)).toSeq ==
        Seq("1", "2.5"))
    } finally spark.sql("ALTER SESSION RESET `store.json.all_text_mode`")
  }

  test("SchemaAlign: name-aligned multi-file degrade (reorder, missing, type flip)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val want = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("c", DoubleType)))
    // reordered + missing c + b flipped to long
    val file = StructType(Seq(StructField("b", LongType),
      StructField("a", LongType)))
    val p = graft.sources.SchemaAlign.plan(want, file)
    assert(p.isDefined)
    val out = graft.sources.SchemaAlign.align(
      Iterator(Row(7L, 1L)), p).toSeq
    assert(out == Seq(Row(1L, null, null))) // a aligned, b type-flip nulls, c missing
    // identical schema = identity fast path
    assert(graft.sources.SchemaAlign.plan(want, want).isEmpty)
  }

  test("inferJsonColumn inference pass is sample-bounded, not a full scan") {
    import spark.implicits._
    // a field that first appears beyond the sample window must be invisible
    // to the inferred schema — proof the inference read stops at the limit
    val rows = (1 to 100).map(i => (i.toLong,
      if (i <= 50) s"""{"a": $i}""" else s"""{"a": $i, "late": "x$i"}"""))
    val df = rows.toDF("id", "js")
    val narrow = SchemaOnRead.inferJsonColumn(df, "js", sampleRows = 50)
      .schema("js_parsed").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(narrow.fieldNames.toSeq == Seq("a"))
    val full = SchemaOnRead.inferJsonColumn(df, "js", sampleRows = 100)
      .schema("js_parsed").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(full.fieldNames.toSeq == Seq("a", "late"))
  }

  test("csvColumns honors quoting; ltsvToMap survives repeated/empty keys") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sor_quotes")
    java.nio.file.Files.writeString(dir.resolve("q.csv"),
      "a,\"b,c\",d\nplain,row,three\n\"he said \"\"hi\"\"\",x,y\n")
    val rows = graft.sources.SchemaOnRead.csvColumns(spark, dir.toString + "/q.csv")
      .select(col("columns")).as[Seq[String]].collect().toSet
    // a quoted delimiter does NOT split; "" collapses to "
    assert(rows.contains(Seq("a", "b,c", "d")), rows.toString)
    assert(rows.contains(Seq("plain", "row", "three")))
    assert(rows.contains(Seq("he said \"hi\"", "x", "y")), rows.toString)
    // LTSV: repeated key keeps the LAST value; empty segments drop —
    // map_from_entries used to throw on the duplicate
    val m = Seq("tag:a\ttag:b\t\thost:h1").toDF("value")
      .select(graft.sources.SchemaOnRead.ltsvToMap(col("value")).as("m"))
      .select(map_keys(col("m")), map_values(col("m"))).collect()(0)
    val kv = m.getSeq[String](0).zip(m.getSeq[String](1)).toMap
    assert(kv == Map("tag" -> "b", "host" -> "h1"), kv.toString)
  }

  test("metadata-cache readRange stays correct when the directory drifts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mdc_stale").toString
    (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "v")
      .repartition(2).write.mode("overwrite").parquet(dir)
    graft.sources.ParquetMetadataCache.refresh(spark, dir)
    // a file added AFTER the refresh: its rows must still appear
    (51 to 60).map(i => (i.toLong, s"r$i")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val got = graft.sources.ParquetMetadataCache
      .readRange(spark, dir, "k", 40, 60).count()
    assert(got == 21L, s"stale manifest dropped post-refresh rows: $got")
    // after re-refresh, pruning applies again and stays correct
    graft.sources.ParquetMetadataCache.refresh(spark, dir)
    assert(graft.sources.ParquetMetadataCache
      .readRange(spark, dir, "k", 40, 60).count() == 21L)
  }
}
