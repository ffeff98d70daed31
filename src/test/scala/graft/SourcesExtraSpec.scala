package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Federation, SnapshotTable}

class SourcesExtraSpec extends AnyFunSuite {
  import TestSpark._

  test("HTTP source: paginated REST endpoint read in parallel (storage-http)") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val page = x.getRequestURI.getQuery.stripPrefix("page=").toInt
        val body = (1 to 3)
          .map(i => s"""{"page": $page, "id": ${page * 10 + i}, "v": ${i * 1.5}}""")
          .mkString("\n").getBytes("UTF-8")
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body); x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val urls = (1 to 4).map(p => s"http://127.0.0.1:$port/data?page=$p")
      val df = Federation.httpJsonLines(spark, urls)
      assert(df.count() == 12)
      assert(df.select(sum("id")).collect()(0).getLong(0) ==
        (1 to 4).flatMap(p => (1 to 3).map(i => p * 10 + i)).sum)
      assert(df.schema.fieldNames.sorted.toSeq == Seq("id", "page", "v"))
    } finally server.stop(0)
  }

  test("avro reader decodes container files written by the avro library") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder.record("rec").fields()
      .requiredLong("id").requiredString("name").optionalDouble("score")
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("avro").toFile
    for (part <- 0 until 2) {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(dir, s"part-$part.avro"))
      for (i <- 1 to 3) {
        val r = new GenericData.Record(schema)
        r.put("id", (part * 10 + i).toLong)
        r.put("name", s"n$part-$i")
        r.put("score", if (i == 3) null else i * 0.5)
        w.append(r)
      }
      w.close()
    }
    val df = graft.sources.AvroReader.read(spark, dir.toString)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(df.count() == 6)
    assert(df.filter(col("score").isNull).count() == 2)
    assert(df.filter(col("id") === 11L).select("name").collect()(0).getString(0) == "n1-1")
    assert(df.select(sum("id")).collect()(0).getLong(0) == (1 to 3).map(_.toLong).sum + (11 to 13).map(_.toLong).sum)
  }

  test("snapshot table: versioned writes + time travel (format-iceberg role)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    assert(SnapshotTable.versions(spark, base).isEmpty)
    val v1 = SnapshotTable.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), base)
    val v2 = SnapshotTable.write(Seq((1, "a"), (2, "b2"), (3, "c")).toDF("id", "s"), base)
    assert((v1, v2) == (1, 2))
    assert(SnapshotTable.versions(spark, base) == Seq(1, 2))
    assert(SnapshotTable.read(spark, base).count() == 3) // latest
    val old = SnapshotTable.read(spark, base, Some(1))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(old == Set((1, "a"), (2, "b"))) // time travel
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, base, Some(99))
    }
  }

  test("SequenceFile: Text and BytesWritable records, Hadoop-written") {
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.io.{BytesWritable, SequenceFile, Text}
    val dir = java.nio.file.Files.createTempDirectory("seq_").toString

    // Text/Text via Spark's own saveAsSequenceFile
    spark.sparkContext.parallelize(Seq(("a", "1"), ("b", "2"), ("c", "3")), 1)
      .saveAsSequenceFile(s"$dir/text")
    val t = graft.sources.SequenceFileReader.read(spark, s"$dir/text")
      .selectExpr("cast(binary_key as string) k", "cast(binary_value as string) v")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(t === Set(("a", "1"), ("b", "2"), ("c", "3")))

    // BytesWritable/BytesWritable via Hadoop's writer directly
    val conf = spark.sparkContext.hadoopConfiguration
    val w = SequenceFile.createWriter(conf,
      SequenceFile.Writer.file(new Path(s"$dir/bytes/part-0.seq")),
      SequenceFile.Writer.keyClass(classOf[BytesWritable]),
      SequenceFile.Writer.valueClass(classOf[BytesWritable]))
    w.append(new BytesWritable(Array[Byte](1, 2)), new BytesWritable(Array[Byte](3)))
    w.append(new BytesWritable(Array[Byte](4)), new BytesWritable(Array[Byte](5, 6)))
    w.close()
    val b = graft.sources.SequenceFileReader.read(spark, s"$dir/bytes")
      .collect().map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(b === Set((Seq[Byte](1, 2), Seq[Byte](3)), (Seq[Byte](4), Seq[Byte](5, 6))))

    // and through the dfs namespace by .seq extension
    assert(spark.sql(s"SELECT * FROM dfs.`$dir/bytes/part-0.seq`").count() === 2)
  }
}
