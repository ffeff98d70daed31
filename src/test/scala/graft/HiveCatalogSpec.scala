package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hive-metastore federation (reference contrib/storage-hive/core/...
  * /HiveStoragePlugin.java): embedded Derby HMS round-trip — write
  * catalog + data, read back through the client API, the `hive` SQL
  * namespace, and a cross-source join with dfs. */
class HiveCatalogSpec extends AnyFunSuite {
  import TestSpark._
  import graft.sources.HiveMetastore

  // one embedded metastore for the whole suite (first boot pays the
  // datanucleus schema-creation cost once)
  private lazy val root: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_hms").toString
    d
  }

  test("embedded HMS round-trip: CTAS, external table, read, list") {
    // CTAS a managed-style table from a DataFrame
    val nation = GraftSession.table(spark, SF, "nation")
    HiveMetastore.createTable(spark, root, "default", "hms_nation", nation)
    assert(HiveMetastore.tables(root, "default").contains("hms_nation"))
    val back = HiveMetastore.read(spark, root, "default", "hms_nation")
    assert(back.count() == nation.count())
    assert(back.schema.fieldNames.toSet == nation.schema.fieldNames.toSet)

    // EXTERNAL table over existing parquet, in a fresh database — the
    // location must be a DIRECTORY (HMS validates it), and the sf
    // testdata tables are single files, so materialize one
    HiveMetastore.createDatabase(root, "fed")
    val region = GraftSession.table(spark, SF, "region")
    val extDir = java.nio.file.Files.createTempDirectory("hms_ext")
    region.write.mode("overwrite").parquet(extDir.toString)
    HiveMetastore.registerExternal(root, "fed", "hms_region",
      region.schema.fields.map(f => f.name -> f.dataType.catalogString).toSeq,
      extDir.toUri.toString, "parquet")
    val r = HiveMetastore.read(spark, root, "fed", "hms_region")
    assert(r.count() == 5)
    assert(HiveMetastore.databases(root).toSet
      .intersect(Set("default", "fed")) == Set("default", "fed"))

    // catalog listing frame carries location + format
    val df = HiveMetastore.tablesDf(spark, root).collect()
    val row = df.find(x => x.getString(1) == "hms_region").get
    assert(row.getString(0) == "fed" && row.getString(4) == "parquet")
  }

  test("hive SQL namespace resolves and joins dfs relations") {
    // depends on the tables created above — trigger lazily if run alone
    if (!HiveMetastore.tables(root, "default").contains("hms_nation")) {
      HiveMetastore.createTable(spark, root, "default", "hms_nation",
        GraftSession.table(spark, SF, "nation"))
    }
    spark.conf.set(HiveMetastore.ConfKey, root)
    try {
      // 2-part form = default db
      assert(spark.sql("SELECT count(*) AS n FROM hive.hms_nation")
        .collect()(0).getLong(0) == 25)
      // cross-source join: hive table x dfs parquet, one SQL statement
      val joined = spark.sql(
        s"""SELECT h.n_name, r.r_name
           |FROM hive.`default`.hms_nation h
           |JOIN dfs.`$SF/region.parquet` r ON h.n_regionkey = r.r_regionkey
           |ORDER BY h.n_name""".stripMargin).collect()
      assert(joined.length == 25 && joined.forall(_.getString(1).nonEmpty))
      // SHOW SCHEMAS lists the federated hive databases
      val schemas = spark.sql("SHOW SCHEMAS").collect()
        .map(_.getString(0)).toSet
      assert(schemas.contains("hive.default"), schemas)
      // ...and the advertised schemas are ENUMERABLE the natural way
      // claimed by regex BEFORE Spark's parser, so the reserved word
      // needs no backticks (and the claim pattern takes plain names)
      val tabs = spark.sql("SHOW TABLES IN hive.default").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(tabs.contains(("hive.default", "hms_nation")), tabs.toSeq)
      // unknown hive table raises, session stays healthy
      intercept[Exception] {
        spark.sql("SELECT * FROM hive.nope_missing").collect()
      }
      assert(spark.sql("SELECT 1").count() == 1)
    } finally spark.conf.unset(HiveMetastore.ConfKey)
  }

  test("TEXTFILE table reads with hive's default \\u0001 delimiter; " +
      "schema evolution null-fills missing parquet columns") {
    // text table, default separator (no field.delim serde param — the
    // hive-written common case)
    val tdir = java.nio.file.Files.createTempDirectory("hms_text")
    java.nio.file.Files.writeString(tdir.resolve("part-0.txt"),
      "1alpha\n2beta\n")
    HiveMetastore.registerExternal(root, "default", "hms_text",
      Seq("id" -> "bigint", "name" -> "string"), tdir.toUri.toString, "text")
    val t = HiveMetastore.read(spark, root, "default", "hms_text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(t.toSeq == Seq((1L, "alpha"), (2L, "beta")))

    // schema-on-read: declare a column the files don't have — hive's
    // contract null-fills instead of failing
    import spark.implicits._
    val pdir = java.nio.file.Files.createTempDirectory("hms_evo")
    Seq((1L, "x")).toDF("id", "v").write.mode("overwrite")
      .parquet(pdir.toString)
    HiveMetastore.registerExternal(root, "default", "hms_evo",
      Seq("id" -> "bigint", "v" -> "string", "added_later" -> "int"),
      pdir.toUri.toString, "parquet")
    val rows = HiveMetastore.read(spark, root, "default", "hms_evo").collect()
    assert(rows.length == 1 && rows(0).isNullAt(2))
  }

  test("partitioned hive table reads with partition values filled") {
    val dir = java.nio.file.Files.createTempDirectory("hms_part")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/dt=2024-01-01")
    Seq((3L, "c")).toDF("id", "v")
      .write.parquet(s"$dir/dt=2024-01-02")
    import org.apache.hadoop.hive.metastore.api.{FieldSchema, Partition, SerDeInfo, StorageDescriptor, Table}
    import scala.jdk.CollectionConverters._
    HiveMetastore.withClient(root) { c =>
      val sd = new StorageDescriptor()
      sd.setCols(Seq(new FieldSchema("id", "bigint", ""),
        new FieldSchema("v", "string", "")).asJava)
      sd.setLocation(dir.toUri.toString)
      sd.setInputFormat("org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat")
      sd.setOutputFormat("org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat")
      val si = new SerDeInfo()
      si.setSerializationLib("org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe")
      si.setParameters(new java.util.HashMap())
      sd.setSerdeInfo(si)
      sd.setParameters(new java.util.HashMap())
      val t = new Table()
      t.setDbName("default"); t.setTableName("hms_events")
      t.setTableType("EXTERNAL_TABLE"); t.setSd(sd)
      t.setPartitionKeys(Seq(new FieldSchema("dt", "string", "")).asJava)
      t.setParameters(new java.util.HashMap())
      t.getParameters.put("EXTERNAL", "TRUE")
      if (c.tableExists("default", "hms_events"))
        c.dropTable("default", "hms_events", false, true)
      c.createTable(t)
      Seq("2024-01-01", "2024-01-02").foreach { dt =>
        val p = new Partition()
        p.setDbName("default"); p.setTableName("hms_events")
        p.setValues(Seq(dt).asJava)
        val psd = new StorageDescriptor(sd)
        psd.setLocation(s"${dir.toUri}dt=$dt")
        p.setSd(psd)
        p.setParameters(new java.util.HashMap())
        c.add_partition(p)
      }
    }
    val df = HiveMetastore.read(spark, root, "default", "hms_events")
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "dt"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "2024-01-01"), (2L, "2024-01-01"),
      (3L, "2024-01-02")))

    // the scale contract: a partition predicate PRUNES the scan to the
    // matching partition DIRECTORY at plan time (the reference's
    // HivePushPartitionFilterIntoScan role) — asserted on the executed
    // plan's actual file list, not on row values
    import org.apache.spark.sql.functions.col
    val pruned = df.filter(col("dt") === "2024-01-02")
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(3L))
    val files = scannedFiles(pruned)
    assert(files.nonEmpty && files.forall(_.contains("dt=2024-01-02")),
      s"unpruned hive scan: ${files.mkString(", ")}")
  }

  /** Files the physical scan would actually read — pruned FileIndex of
    * every FileSourceScanExec in the executed plan (inside AQE too). */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collect { case s: FileSourceScanExec =>
      s.relation.location.inputFiles.toSeq
    }.flatten
  }

  test("partitioned hive CTAS round-trip prunes at >64 partitions") {
    // partitioned WRITE (createTable partitionBy) registers one HMS
    // partition per written directory; read back through the catalog
    // mirror and verify pruning holds where a literal-union plan shape
    // would have been size-switched away (80 > 64 partitions)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0 until 80).map(i => (i.toLong, s"d$i")).toDF("id", "dt")
    HiveMetastore.createTable(spark, root, "default", "hms_wide", df,
      partitionBy = Seq("dt"))
    // HMS really holds 80 partitions (any hive client would see them)
    val nParts = HiveMetastore.withClient(root)(
      _.listPartitions("default", "hms_wide", (-1).toShort).size)
    assert(nParts == 80)
    val back = HiveMetastore.read(spark, root, "default", "hms_wide")
    assert(back.count() == 80)
    val one = back.filter(col("dt") === "d7")
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(7L))
    val files = scannedFiles(one)
    assert(files.nonEmpty && files.forall(_.contains("dt=d7")),
      s"unpruned at 80 partitions: ${files.take(5).mkString(", ")}")
    // multi-partition predicate keeps exactly the matching directories
    val two = back.filter(col("dt").isin("d3", "d11"))
    assert(two.count() == 2)
    val files2 = scannedFiles(two)
    assert(files2.nonEmpty &&
      files2.forall(f => f.contains("dt=d3") || f.contains("dt=d11")),
      s"unpruned IN-list: ${files2.take(5).mkString(", ")}")
  }

  test("partitioned TEXTFILE parses exactly like unpartitioned (parse-" +
      "then-cast parity: padded numerics, dirty cells)") {
    // ' 42' in an int column: Spark's CAST trims (hive's lax semantics);
    // a typed CSV parse would PERMISSIVE-null it — the partitioned
    // mirror must go through the same all-string + cast path
    val base = java.nio.file.Files.createTempDirectory("hms_tpart")
    val p1 = base.resolve("dt=a"); java.nio.file.Files.createDirectory(p1)
    java.nio.file.Files.writeString(p1.resolve("f.txt"),
      "1, 42\n2,junk\n")
    HiveMetastore.registerExternal(root, "default", "hms_text_flat",
      Seq("id" -> "bigint", "n" -> "int"), p1.toUri.toString, "text")
    HiveMetastore.registerExternal(root, "default", "hms_text_part",
      Seq("id" -> "bigint", "n" -> "int"), base.toUri.toString, "text",
      partitionKeys = Seq("dt" -> "string"),
      partitions = Seq((Seq("a"), p1.toUri.toString)))
    // both tables declare comma separators via the serde param
    HiveMetastore.withClient(root) { c =>
      Seq("hms_text_flat", "hms_text_part").foreach { t =>
        val tbl = c.getTable("default", t)
        tbl.getSd.getSerdeInfo.getParameters.put("field.delim", ",")
        c.alter_table("default", t, tbl)
        if (t == "hms_text_part") {
          // partition SDs carry their own serde copy — align it
          import scala.jdk.CollectionConverters._
          c.listPartitions("default", t, (-1).toShort).asScala.foreach { p =>
            p.getSd.getSerdeInfo.getParameters.put("field.delim", ",")
            c.alter_partition("default", t, p)
          }
        }
      }
    }
    def vals(t: String) = HiveMetastore.read(spark, root, "default", t)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else Integer.valueOf(r.getInt(1))))
      .sortBy(_._1).toSeq
    val flat = vals("hms_text_flat")
    val part = vals("hms_text_part")
    assert(flat == part, s"flat=$flat part=$part")
    assert(flat == Seq((1L, Integer.valueOf(42)), (2L, null)), flat)
  }

  test("ragged TEXTFILE null-fills trailing declared columns") {
    // first row narrower than the declared schema: hive's
    // LazySimpleSerDe contract null-fills the tail; a zip against
    // inferred columns would silently DROP column c entirely
    val tdir = java.nio.file.Files.createTempDirectory("hms_ragged")
    java.nio.file.Files.writeString(tdir.resolve("part-0.txt"),
      "1\u0001x\n2\u0001y\u00019\n")
    HiveMetastore.registerExternal(root, "default", "hms_ragged",
      Seq("id" -> "bigint", "name" -> "string", "c" -> "int"),
      tdir.toUri.toString, "text")
    val t = HiveMetastore.read(spark, root, "default", "hms_ragged")
    assert(t.schema.fieldNames.toSeq == Seq("id", "name", "c"))
    val rows = t.collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "x" &&
      rows(0).isNullAt(2))
    assert(rows(1).getLong(0) == 2L && rows(1).getString(1) == "y" &&
      rows(1).getInt(2) == 9)
  }

  test("TEXTFILE hive semantics: quotes are LITERAL bytes, \\N is NULL, " +
      "empty stays empty string; zero-partition tables read EMPTY") {
    // LazySimpleSerDe has no quoting concept and uses \N for NULL —
    // Spark CSV defaults differ on both, so the reader pins them
    val tdir = java.nio.file.Files.createTempDirectory("hms_quotes")
    java.nio.file.Files.writeString(tdir.resolve("part-0.txt"),
      "\"hesaid\"x\n\\Ny\n")
    HiveMetastore.registerExternal(root, "default", "hms_quotes",
      Seq("a" -> "string", "b" -> "string", "c" -> "string"),
      tdir.toUri.toString, "text")
    val rows = HiveMetastore.read(spark, root, "default", "hms_quotes")
      .collect().sortBy(r => Option(r.getString(2)).getOrElse(""))
    assert(rows.length == 2)
    // quotes survive literally; the delimiter splits "inside" them
    assert(rows(0).getString(0) == "\"he" && rows(0).getString(1) ==
      "said\"" && rows(0).getString(2) == "x", rows(0).toString)
    // \N is NULL, a bare empty cell is the EMPTY STRING
    assert(rows(1).isNullAt(0) && rows(1).getString(1) == "" &&
      rows(1).getString(2) == "y", rows(1).toString)

    // zero-partition partitioned table = empty relation, not an error
    val spark2 = spark
    import spark2.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "p")
    HiveMetastore.createTable(spark, root, "default", "hms_zero",
      empty, partitionBy = Seq("p"))
    val z = HiveMetastore.read(spark, root, "default", "hms_zero")
    assert(z.schema.fieldNames.toSeq == Seq("k", "p") && z.count() == 0)
  }

  test("fault injection: metastore DOWN (thrift to a closed port) " +
      "refuses fast and clean — the same client API a remote HMS uses") {
    // the remote path is same-API/untestable for real servers here;
    // this proves the error SURFACE: bounded retries, a clean
    // MetaException chain, no hang
    val c = new org.apache.hadoop.hive.conf.HiveConf()
    c.set("hive.metastore.uris", "thrift://127.0.0.1:1") // closed port
    c.set("hive.metastore.connect.retries", "1")
    c.set("hive.metastore.client.connect.retry.delay", "0s")
    c.set("hive.metastore.client.socket.timeout", "5s")
    val t0 = System.nanoTime()
    val e = intercept[Exception] {
      val cl = new org.apache.hadoop.hive.metastore.HiveMetaStoreClient(c)
      try cl.getAllDatabases finally cl.close()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30, s"metastore-down path took ${secs}s — near-hang")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => x.getClass.getSimpleName + ":" +
          Option(x.getMessage).getOrElse("")).mkString(" | ")
    val lower = chain(e).toLowerCase
    assert(Seq("connect", "refused", "transport", "metaexception")
      .exists(lower.contains), chain(e))
  }

  test("fault injection: missing table / missing database are clean " +
      "refusals naming the object") {
    val e1 = intercept[Exception] {
      HiveMetastore.read(spark, root, "default", "no_such_table_xyz")
    }
    assert(e1.getMessage != null &&
      e1.getMessage.contains("no_such_table_xyz"), e1.getMessage)
    val e2 = intercept[Exception] {
      HiveMetastore.read(spark, root, "no_such_db_xyz", "t")
    }
    assert(e2.getMessage != null && (e2.getMessage.contains("no_such_db_xyz")
      || e2.getMessage.toLowerCase.contains("database")), e2.getMessage)
  }

  test("fault injection: a partition directory missing from disk while " +
      "HMS still records it reads as an EMPTY partition (hive semantics" +
      " — MSCK repairs the catalog), deterministically and without hang") {
    val spark2 = spark
    import spark2.implicits._
    val src = Seq((1L, "a"), (2L, "b"), (3L, "a"))
      .toDF("k", "p")
    HiveMetastore.createTable(spark, root, "default", "hms_fault_part",
      src, partitionBy = Seq("p"))
    // remove one partition's directory out from under the catalog
    val loc = HiveMetastore.tablesDf(spark, root).collect()
      .find(r => r.getString(1) == "hms_fault_part").get.getString(3)
    val pdir = new java.io.File(
      new java.net.URI(loc).getPath, "p=b")
    assert(pdir.exists, s"fixture: $pdir should exist")
    pdir.listFiles.foreach(_.delete()); assert(pdir.delete())
    val rows = HiveMetastore.read(spark, root, "default", "hms_fault_part")
      .collect()
    // hive reads a dir-less partition as empty — the other partitions'
    // rows all arrive, nothing hangs, nothing from p=b is fabricated
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
      rows.mkString(","))
  }
}
