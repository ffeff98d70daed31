package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaLogWriter, DfsSql}

/** The `dfs` SQL namespace (sources/DfsSql.scala + DfsResolveRule):
  * Drill's "query the file path from SQL" front door, format inferred by
  * extension, workspaces, directory → table-format detection. */
class DfsSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.SF
  private val fx = TestSpark.Fixtures

  test("parquet path via SQL matches the reader API") {
    val viaSql = spark.sql(s"SELECT count(*) AS n FROM dfs.`$sf/nation.parquet`")
      .collect().head.getLong(0)
    val direct = spark.read.parquet(s"$sf/nation.parquet").count()
    assert(viaSql === direct)
  }

  test("dfs relations compose: join a csv fixture with a parquet table") {
    val rows = spark.sql(
      s"""SELECT n.n_name, c.name
          FROM dfs.`$fx/sample.csv` c
          JOIN dfs.`$sf/nation.parquet` n ON c.id = n.n_nationkey
          ORDER BY c.id""").collect()
    assert(rows.length === spark.read.option("header", "true")
      .csv(s"$fx/sample.csv").count())
    assert(rows.head.getString(1) != null)
  }

  test("extension registry: xlsx, pcap, jsonl, ltsv, geojson resolve") {
    assert(spark.sql(s"SELECT * FROM dfs.`$fx/sample.xlsx`").count() === 5)
    assert(spark.sql(s"SELECT * FROM dfs.`$fx/sample.pcap`").count() === 3)
    assert(spark.sql(s"SELECT * FROM dfs.`$fx/sample.jsonl`").count() > 0)
    assert(spark.sql(s"SELECT * FROM dfs.`$fx/app.ltsv`").count() > 0)
    assert(spark.sql(s"SELECT * FROM dfs.`$fx/sample.geojson`").count() > 0)
  }

  test("tmp workspace resolves relative to java.io.tmpdir") {
    val dir = Files.createTempDirectory("dfs_ws_").toFile
    val rel = dir.getName
    spark.range(7).toDF("v").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/t.parquet")
    val n = spark.sql(s"SELECT count(*) AS n FROM dfs.tmp.`$rel/t.parquet`")
      .collect().head.getLong(0)
    assert(n === 7)
  }

  test("conf-registered workspace (bootstrap-storage-plugins analog)") {
    spark.conf.set("graft.dfs.workspace.sf", sf)
    try {
      val n = spark.sql("SELECT count(*) AS n FROM dfs.sf.`region.parquet`")
        .collect().head.getLong(0)
      assert(n === 5)
    } finally spark.conf.unset("graft.dfs.workspace.sf")
  }

  test("directory with _delta_log resolves as a Delta table") {
    val dir = Files.createTempDirectory("dfs_delta_").toString
    DeltaLogWriter.write(spark.range(5).toDF("v"), dir)
    assert(spark.sql(s"SELECT * FROM dfs.`$dir`").count() === 5)
  }

  test("directory with snapshot/+schema/ resolves as a Paimon table") {
    val dir = Files.createTempDirectory("dfs_paimon_").toString
    graft.sources.PaimonTable.write(spark.range(7).toDF("v"), dir)
    assert(spark.sql(s"SELECT * FROM dfs.`$dir`").count() === 7)
  }

  test("plain directory infers format from the first data file") {
    val dir = Files.createTempDirectory("dfs_dir_").toString
    spark.range(9).toDF("v").write.mode("overwrite").parquet(dir)
    assert(spark.sql(s"SELECT * FROM dfs.`$dir`").count() === 9)
  }

  test("psv/tbl read HEADERLESS as the columns[] array (TPC-H .tbl contract)") {
    // Drill's psv/tbl formats default extractHeader=false: row 1 is
    // DATA — the old csv mapping silently ate it as column names
    val dir = Files.createTempDirectory("dfs_tbl_")
    Files.writeString(dir.resolve("nation.tbl"),
      "0|ALGERIA|0|haggle\n1|ARGENTINA|1|al foxes\n")
    val rows = spark.sql(
      s"SELECT columns[1] AS n_name FROM dfs.`${dir.resolve("nation.tbl")}`")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("ALGERIA", "ARGENTINA")) // both rows, none consumed
    val glob = spark.sql(
      s"SELECT count(*) AS n FROM dfs.`${dir}/*.tbl`").first().getLong(0)
    assert(glob === 2L)
  }

  test("persisted views read back by their schema-qualified dfs name") {
    val dir = Files.createTempDirectory("dfs_viewrb_").toString
    spark.conf.set("graft.dfs.workspace.vrb", dir)
    try {
      spark.range(3).toDF("n").write.mode("overwrite")
        .parquet(s"$dir/base.parquet")
      spark.sql(
        s"CREATE VIEW dfs.vrb.v3 AS SELECT count(*) AS n FROM dfs.vrb.`base.parquet`")
      // the name CREATE VIEW just accepted must be readable back
      assert(spark.sql("SELECT * FROM dfs.vrb.`v3`").collect()(0).getLong(0) == 3L)
      // SHOW TABLES lists the VIEW name, not its backing file
      val names = spark.sql("SHOW TABLES IN dfs.vrb").collect()
        .map(_.getString(1)).toSet
      assert(names.contains("v3") && !names.exists(_.endsWith(".view.json")),
        names.toString)
    } finally spark.conf.unset("graft.dfs.workspace.vrb")
  }

  test("bson dumps resolve by extension; kafka segments by dfs_read " +
      "type name (.log is the text reader's)") {
    import graft.sources.{BsonReader, KafkaSegmentReader}
    val dir = java.nio.file.Files.createTempDirectory("dfs_new").toString
    BsonReader.writeDump(spark, dir, "c",
      Seq(BsonReader.documentBytes(Seq("id" -> 7, "name" -> "x"))))
    val b = spark.sql(s"SELECT id, name FROM dfs.`$dir/c.bson`").collect()
    assert(b.length == 1 && b(0).getLong(0) == 7L && b(0).getString(1) == "x")
    val kdir = java.nio.file.Files.createTempDirectory("dfs_kafka").toString
    KafkaSegmentReader.writeSegment(spark, kdir, "t", 0, Seq(
      KafkaSegmentReader.batchBytes(5L, 100L, Seq(
        ("k".getBytes("UTF-8"), """{"id": 9}""".getBytes("UTF-8"),
          Nil, 0L)))))
    val k = spark.sql(
      s"SELECT id, kafkaMsgOffset FROM dfs_read('$kdir', 'kafka')")
      .collect()
    assert(k.length == 1 && k(0).getLong(0) == 9L && k(0).getLong(1) == 5L)

    // kafka-avro: third dfs_read argument carries the writer schema
    // (the registry is a live service; the schema travels as data)
    val adir = java.nio.file.Files.createTempDirectory("dfs_kavro").toString
    val aschema = """{"type":"record","name":"R","fields":[{"name":"id","type":"long"}]}"""
    val parsed = new org.apache.avro.Schema.Parser().parse(aschema)
    val rec = new org.apache.avro.generic.GenericData.Record(parsed)
    rec.put("id", 11L)
    val bo = new java.io.ByteArrayOutputStream()
    bo.write(0); bo.write(java.nio.ByteBuffer.allocate(4).putInt(3).array())
    val aenc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bo, null)
    new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](parsed).write(rec, aenc)
    aenc.flush()
    KafkaSegmentReader.writeSegment(spark, adir, "a", 0, Seq(
      KafkaSegmentReader.batchBytes(0L, 1L, Seq(
        (null, bo.toByteArray, Nil, 0L)))))
    val av = spark.sql("SELECT id, avroSchemaId FROM dfs_read('" + adir +
      "', 'kafka-avro', '" + aschema.replace("'", "''") + "')").collect()
    assert(av.length == 1 && av(0).getLong(0) == 11L && av(0).getInt(1) == 3)

    // HBase store files carry no extension: dfs_read type name 'hfile'
    import graft.sources.HBaseHFileReader
    val hdir = java.nio.file.Files.createTempDirectory("dfs_hfile").toString
    HBaseHFileReader.writeHFile(spark, s"$hdir/store0", Seq(
      HBaseHFileReader.Cell("rk".getBytes("UTF-8"), "f", "q", 10L, 4,
        "val".getBytes("UTF-8"), 1L)))
    val h = spark.sql(
      s"SELECT cast(row_key AS STRING) AS rk, cast(f['q'] AS STRING) AS v " +
        s"FROM dfs_read('$hdir', 'hfile')").collect()
    assert(h.length == 1 && h(0).getString(0) == "rk" &&
      h(0).getString(1) == "val")

    // cassandra sstables: dfs_read type name 'sstable'
    import graft.sources.CassandraSSTableReader
    val cdir = java.nio.file.Files.createTempDirectory("dfs_sstable").toString
    CassandraSSTableReader.writeSSTable(spark, cdir,
      keyType = "Int32Type", clusteringTypes = Nil,
      regulars = Seq("v" -> "UTF8Type"),
      rows = Seq((9, Nil, Seq("cass"), 1442880000000100L)))
    val cs = spark.sql(
      s"SELECT key, v FROM dfs_read('$cdir', 'sstable')").collect()
    assert(cs.length == 1 && cs(0).getInt(0) == 9 &&
      cs(0).getString(1) == "cass")
  }

  test("dfs_read tbl/psv with an explicit delimiter stays HEADERLESS " +
      "(columns[] contract — row 1 is data, never column names)") {
    val t = Files.createTempFile("dfs_tbl_", ".dat")
    java.nio.file.Files.writeString(t, "1|ALGERIA|0\n2|ARGENTINA|1\n")
    val rows = spark.sql(
      s"SELECT columns FROM dfs_read('$t', 'tbl', '|')").collect()
    assert(rows.length == 2, rows.length.toString)
    assert(rows.map(_.getSeq[String](0).head).sorted.toSeq == Seq("1", "2"))
  }

  test("unknown extension and missing path error clearly") {
    val p = Files.createTempFile("dfs_bad_", ".zzz")
    val e1 = intercept[Exception](spark.sql(s"SELECT * FROM dfs.`$p`").collect())
    assert(e1.getMessage.contains("no format reader"))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM dfs.`/no/such/file.parquet`").collect())
    assert(e2.getMessage.contains("no such file"))
    val e3 = intercept[Exception](
      spark.sql("SELECT * FROM dfs.nope.`x.parquet`").collect())
    assert(e3.getMessage.contains("unknown workspace"))
  }

  test("pushdown survives the dfs rewrite: filter reaches the parquet scan") {
    val df = spark.sql(
      s"SELECT o_orderkey FROM dfs.`$sf/orders.parquet` WHERE o_orderkey = 7")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_orderkey"), s"expected pushed filter in:\n$plan")
  }

  test("glob paths pass through for splittable formats, error for file-granular") {
    val n = spark.sql(s"SELECT count(*) AS n FROM dfs.`$sf/nat*.parquet`")
      .collect().head.getLong(0)
    assert(n === 25) // nation matched by pattern
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM dfs.`$fx/*.xlsx`").collect())
    assert(e.getMessage.contains("glob reads support"))
  }

  test("dfs paths reach the SPSS/HDF5/Access readers by extension, and " +
      "dfs_read's third argument is the reference's defaultPath/tableName") {
    // .sav by extension
    assert(spark.sql(s"SELECT * FROM dfs.`$fx/testdata.sav`").count() === 25)
    // .h5 by extension = browse mode; dfs_read(path,'hdf5',dataset) projects
    val browse = spark.sql(
      s"SELECT path, data_type FROM dfs.`$fx/hdf5/dset.h5`").collect()
    assert(browse.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("/dset", "DATASET")))
    assert(spark.sql(
      s"SELECT int_col_0 FROM dfs_read('$fx/hdf5/dset.h5', 'hdf5', '/dset')")
      .collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 7, 13, 19))
    // .accdb by extension = catalog; dfs_read(path,'msaccess',table) projects
    assert(spark.sql(
      s"SELECT `table` FROM dfs.`$fx/access/testV2010.accdb` ORDER BY `table`")
      .collect().map(_.getString(0)).toSeq ===
      Seq("Table1", "Table2", "Table3", "Table4"))
    assert(spark.sql(
      s"SELECT E FROM dfs_read('$fx/access/testV2010.accdb', 'msaccess', 'Table1')")
      .collect().map(_.getInt(0)).sorted.toSeq === Seq(0, 333333333))
  }

  test("dfs_read table function: explicit format + delimiter override " +
      "(Drill's table(dfs.`x`(type => ..., fieldDelimiter => ...)))") {
    val dat = Files.createTempFile("dfs_tf_", ".dat")
    Files.writeString(dat, "id|name\n1|alpha\n2|beta\n")
    // extension .dat is unknown — the explicit 'text' type + '|' reads it
    val rows = spark.sql(s"SELECT * FROM dfs_read('$dat', 'text', '|')")
      .collect().map(r => (r.get(0).toString, r.getString(1)))
    assert(rows.toSet === Set(("1", "alpha"), ("2", "beta")))
    // one-arg form = the extension registry (same as dfs.`path`)
    assert(spark.sql(s"SELECT * FROM dfs_read('$fx/sample.xlsx')").count() === 5)
    // named-format form without delimiter
    assert(spark.sql(s"SELECT * FROM dfs_read('$fx/sample.pcap', 'pcap')")
      .count() === 3)
    // non-literal args are rejected with a clear message
    val e = intercept[Exception](
      spark.sql("SELECT * FROM dfs_read(concat('/a', '/b'))").collect())
    assert(e.getMessage.contains("string literal"))
  }

  test("SHOW FILES role: a directory lists as a relation") {
    val df = DfsSql.showFiles(spark, fx)
    val names = df.select("name").collect().map(_.getString(0)).toSet
    assert(names.contains("sample.csv") && names.contains("sample.pcap"))
    val csv = df.filter(col("name") === "sample.csv").collect().head
    assert(csv.getBoolean(2) && csv.getLong(3) > 0)
    intercept[IllegalArgumentException](DfsSql.showFiles(spark, "/no/such/dir"))
  }

  test("real catalog tables still win: dfs head is the only claimed name") {
    spark.range(3).toDF("x").createOrReplaceTempView("dfs_unrelated")
    assert(spark.sql("SELECT * FROM dfs_unrelated").count() === 3)
  }

  test("persistent views can be defined OVER dfs paths and reload later") {
    val base = java.nio.file.Files.createTempDirectory("dfs_views_").toString
    graft.sources.ViewCatalog.create(spark, base, "nations_by_path",
      s"SELECT n_nationkey, n_name FROM dfs.`$sf/nation.parquet` WHERE n_nationkey < 10",
      replace = true)
    assert(spark.sql("SELECT count(*) FROM nations_by_path")
      .collect().head.getLong(0) === 10)
    // a fresh session (same extensions) reloads the view and re-resolves
    // the dfs relation from its stored SQL text
    val fresh = spark.newSession()
    graft.sources.ViewCatalog.load(fresh, base)
    assert(fresh.sql("SELECT count(*) FROM nations_by_path")
      .collect().head.getLong(0) === 10)
  }

  test("ALTER SESSION SET / RESET / RESET ALL manage the session conf") {
    val r = spark.sql("ALTER SESSION SET `graft.test.opt` = 'hello'").collect().head
    assert(r.getBoolean(0) && r.getString(1).contains("graft.test.opt"))
    assert(spark.conf.get("graft.test.opt") === "hello")
    // unquoted numeric value, ALTER SYSTEM spelling
    spark.sql("ALTER SYSTEM SET `graft.test.opt2` = 42")
    assert(spark.conf.get("graft.test.opt2") === "42")
    // RESET one restores the pre-command state (unset here)
    spark.sql("ALTER SESSION RESET `graft.test.opt`")
    assert(spark.conf.getOption("graft.test.opt").isEmpty)
    // RESET ALL restores a PRE-EXISTING value, not just unsets
    spark.conf.set("graft.test.preset", "original")
    spark.sql("ALTER SESSION SET `graft.test.preset` = 'changed'")
    spark.sql("ALTER SESSION RESET ALL")
    assert(spark.conf.get("graft.test.preset") === "original")
    assert(spark.conf.getOption("graft.test.opt2").isEmpty)
  }

  test("ANALYZE TABLE ... COMPUTE STATISTICS via SQL: stats file + histograms") {
    val base = java.nio.file.Files.createTempDirectory("sql_stats_").toString
    spark.sql(s"ALTER SESSION SET `graft.stats.dir` = '$base'")
    spark.sql("ALTER SESSION SET `graft.stats.histogram.buckets` = 8")
    try {
      val r = spark.sql(
        s"ANALYZE TABLE dfs.`$sf/nation.parquet` COMPUTE STATISTICS").collect().head
      assert(r.getBoolean(0) && r.getString(1).contains("nation"))
      val st = graft.sources.StatsCatalog.loadByName(spark, base, "nation").get
      assert(st.rowCount === 25)
      val nk = st.columns.find(_.name == "n_nationkey").get
      assert(nk.histogram.size === 9) // 8 buckets -> 9 boundaries
      assert(nk.min === "0" && nk.max === "24")

      // column-list form analyzes only those columns
      spark.sql(s"""ANALYZE TABLE dfs.`$sf/region.parquet`
                    COMPUTE STATISTICS (r_regionkey, r_name)""")
      val reg = graft.sources.StatsCatalog.loadByName(spark, base, "region").get
      assert(reg.columns.map(_.name).toSet === Set("r_regionkey", "r_name"))

      // SAMPLE n PERCENT analyzes a subset (seeded Bernoulli)
      spark.sql(s"""ANALYZE TABLE dfs.`$sf/customer.parquet`
                    COMPUTE STATISTICS (c_custkey) SAMPLE 20 PERCENT""")
      val cust = graft.sources.StatsCatalog.loadByName(spark, base, "customer").get
      val full = spark.read.parquet(s"$sf/customer.parquet").count()
      assert(cust.rowCount > 0 && cust.rowCount < full)
    } finally spark.sql("ALTER SESSION RESET ALL")
  }

  test("REFRESH TABLE METADATA via SQL runs the footer sweep") {
    // the manifest is written INSIDE the table dir, so sweep a scratch
    // copy (testdata is read-only)
    val dir = java.nio.file.Files.createTempDirectory("refresh_sql_").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val r = spark.sql(s"REFRESH TABLE METADATA dfs.`$dir`").collect().head
    assert(r.getBoolean(0) && r.getString(1).contains("footers read"))
    // the cache is live: file metas load back from the manifest
    val metas = graft.sources.ParquetMetadataCache.load(spark, dir)
    assert(metas.size === 3)
  }

  test("CTAS / DROP TABLE / DESCRIBE over dfs paths") {
    val dir = java.nio.file.Files.createTempDirectory("dfs_ddl_").toString
    val t = s"$dir/big_nations"
    // CTAS: default store.format (parquet)
    val r = spark.sql(
      s"""CREATE TABLE dfs.`$t` AS
          SELECT n_nationkey, n_name, n_regionkey
          FROM dfs.`$sf/nation.parquet` WHERE n_nationkey >= 10""").collect().head
    assert(r.getBoolean(0) && r.getString(1).startsWith("15 records"))
    assert(spark.sql(s"SELECT count(*) FROM dfs.`$t`")
      .collect().head.getLong(0) === 15)
    // exists → clear error, not silent overwrite
    val dup = intercept[Exception](
      spark.sql(s"CREATE TABLE dfs.`$t` AS SELECT 1 AS one"))
    assert(dup.getMessage.contains("already exists"))

    // DESCRIBE emits Drill's (COLUMN_NAME, DATA_TYPE, IS_NULLABLE)
    val desc = spark.sql(s"DESCRIBE dfs.`$t`").collect()
    assert(desc.map(_.getString(0)).toSeq ===
      Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(desc.head.getString(1).nonEmpty && desc.head.getString(2) == "YES")

    // PARTITION BY lays out key=value directories; store.format honors
    // the session option (Drill's store.format)
    spark.sql("ALTER SESSION SET `store.format` = 'json'")
    try {
      val t2 = s"$dir/by_region"
      spark.sql(s"""CREATE TABLE dfs.`$t2` PARTITION BY (n_regionkey) AS
                    SELECT n_nationkey, n_name, n_regionkey
                    FROM dfs.`$sf/nation.parquet`""")
      val sub = new java.io.File(t2).listFiles().map(_.getName)
      assert(sub.exists(_.startsWith("n_regionkey=")))
      assert(spark.read.json(t2).count() === 25)
    } finally spark.sql("ALTER SESSION RESET `store.format`")

    // DROP TABLE deletes; IF EXISTS degrades quietly
    spark.sql(s"DROP TABLE dfs.`$t`")
    assert(!new java.io.File(t).exists())
    val miss = intercept[Exception](spark.sql(s"DROP TABLE dfs.`$t`"))
    assert(miss.getMessage.contains("not found"))
    val quiet = spark.sql(s"DROP TABLE IF EXISTS dfs.`$t`").collect().head
    assert(quiet.getBoolean(0))
  }

  test("CREATE/DROP VIEW into a dfs workspace persists via the view catalog") {
    val dir = java.nio.file.Files.createTempDirectory("dfs_view_ws_").toFile
    spark.conf.set("graft.dfs.workspace.vws", dir.getAbsolutePath)
    try {
      val r = spark.sql(
        s"""CREATE VIEW dfs.vws.`small_nations` AS
            SELECT n_nationkey, n_name FROM dfs.`$sf/nation.parquet`
            WHERE n_nationkey < 5""").collect().head
      assert(r.getBoolean(0) && r.getString(1).contains("created"))
      // registered in-session AND stored as a workspace file
      assert(spark.sql("SELECT count(*) FROM small_nations")
        .collect().head.getLong(0) === 5)
      assert(dir.listFiles().exists(_.getName.contains("small_nations")))
      // OR REPLACE re-points; DROP removes file + registration
      spark.sql(s"""CREATE OR REPLACE VIEW dfs.vws.`small_nations` AS
                    SELECT n_nationkey FROM dfs.`$sf/nation.parquet`""")
      assert(spark.sql("SELECT count(*) FROM small_nations")
        .collect().head.getLong(0) === 25)
      spark.sql("DROP VIEW dfs.vws.`small_nations`")
      assert(!dir.listFiles().exists(_.getName.contains("small_nations")))
      val miss = intercept[Exception](spark.sql("DROP VIEW dfs.vws.`small_nations`"))
      assert(miss.getMessage.contains("Unknown view"))
      assert(spark.sql("DROP VIEW IF EXISTS dfs.vws.`small_nations`")
        .collect().head.getBoolean(0))
    } finally spark.conf.unset("graft.dfs.workspace.vws")
  }

  test("EXPLAIN reaches through the dfs rewrite") {
    val plan = spark.sql(s"EXPLAIN SELECT count(*) FROM dfs.`$sf/nation.parquet`")
      .collect().head.getString(0)
    assert(plan.contains("Aggregate") || plan.contains("Relation"))
  }

  test("the REST endpoint serves dfs-path queries (composition with QueryServer)") {
    val server = graft.sources.QueryServer.start(spark)
    try {
      val remote = graft.sources.Federation.graftPeer(spark,
        s"http://127.0.0.1:${server.port}",
        s"SELECT r_regionkey, r_name FROM dfs.`$sf/region.parquet`")
      assert(remote.count() === 5)
    } finally server.stop()
  }
}
