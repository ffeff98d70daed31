package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drill's session schema context: USE dfs.ws + bare-name resolution,
  * SHOW SCHEMAS / SHOW TABLES, and paimon CTAS through store.format. */
class SessionSchemaSpec extends AnyFunSuite {
  import TestSpark._

  test("USE dfs.ws makes bare names resolve in the workspace") {
    import spark.implicits._
    val dir = "/tmp/graft_test/session_ws"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true); fs.mkdirs(p)
    Seq((1, "a"), (2, "b")).toDF("k", "v")
      .write.parquet(s"$dir/people.parquet")
    spark.conf.set("graft.dfs.workspace.sess", dir)
    try {
      val r = spark.sql("USE dfs.sess").collect()(0)
      assert(r.getBoolean(0) &&
        r.getString(1).contains("Default schema changed to [dfs.sess]"))
      assert(spark.sql("SELECT * FROM `people.parquet`").count() == 2)
      // unknown names still get Spark's normal error, not a dfs one
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM `no_such_table`")
      }
      assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        e.getMessage.toLowerCase.contains("cannot be found"))
      // unknown workspace refuses at USE time
      val e2 = intercept[Exception] { spark.sql("USE dfs.nope") }
      assert(e2.getMessage.contains("unknown workspace"))
    } finally {
      spark.conf.unset("graft.dfs.defaultWorkspace")
      spark.conf.unset("graft.dfs.workspace.sess")
    }
  }

  test("USE <catalog db> clears the sticky dfs workspace context") {
    val dir = "/tmp/graft_test/session_ws2"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true); fs.mkdirs(p)
    spark.conf.set("graft.dfs.workspace.sticky", dir)
    try {
      spark.sql("USE dfs.sticky").collect()
      assert(spark.conf.getOption("graft.dfs.defaultWorkspace").contains("sticky"))
      // Drill's USE REPLACES the session schema — switching back to a
      // catalog database must drop the dfs context
      spark.sql("USE default").collect()
      assert(spark.conf.getOption("graft.dfs.defaultWorkspace").isEmpty,
        "dfs workspace context survived USE <db>")
    } finally {
      spark.conf.unset("graft.dfs.defaultWorkspace")
      spark.conf.unset("graft.dfs.workspace.sticky")
      spark.sql("USE default").collect()
    }
  }

  test("bare names resolve persisted views; failing USE keeps context; " +
      "EXPLAIN of USE has no side effect") {
    val dir = "/tmp/graft_test/session_ws3"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true); fs.mkdirs(p)
    spark.conf.set("graft.dfs.workspace.sv", dir)
    try {
      spark.sql("CREATE VIEW dfs.sv.v3 AS SELECT 42 AS x").collect()
      spark.sql("USE dfs.sv").collect()
      // SHOW TABLES lists v3, so SELECT by BARE NAME must work too
      val got = spark.sql("SELECT x FROM v3").collect()
      assert(got.map(_.getInt(0)).toSeq == Seq(42))
      // a FAILING USE leaves the session schema unchanged (Drill)
      intercept[Exception] { spark.sql("USE no_such_db_xyz").collect() }
      assert(spark.conf.getOption("graft.dfs.defaultWorkspace").contains("sv"),
        "failing USE wiped the dfs workspace context")
      // EXPLAIN of a USE must not execute its session mutation
      val e = intercept[Exception] {
        spark.sql("EXPLAIN PLAN FOR USE default").collect()
      }
      assert(e.getMessage.contains("command"))
      assert(spark.conf.getOption("graft.dfs.defaultWorkspace").contains("sv"),
        "EXPLAIN PLAN FOR USE executed the workspace unset")
    } finally {
      spark.conf.unset("graft.dfs.defaultWorkspace")
      spark.conf.unset("graft.dfs.workspace.sv")
      spark.sql("USE default").collect()
    }
  }

  test("ALTER SESSION SET on a static conf fails without poisoning RESET ALL") {
    val e = intercept[Exception] {
      spark.sql("ALTER SESSION SET `spark.sql.warehouse.dir` = '/nope'").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cannot") ||
      e.getMessage.toLowerCase.contains("static"))
    // the failed SET must not have recorded the key: RESET ALL succeeds
    spark.sql("ALTER SESSION SET `graft.test.opt` = 'x'").collect()
    val r = spark.sql("ALTER SESSION RESET ALL").collect()(0)
    assert(r.getBoolean(0))
    assert(spark.conf.getOption("graft.test.opt").isEmpty)
  }

  test("CTTAS drop is case-insensitive, like Spark temp view resolution") {
    spark.sql("CREATE TEMPORARY TABLE CttasCase AS SELECT 1 AS one").collect()
    assert(spark.sql("SELECT * FROM cttascase").count() == 1)
    val r = spark.sql("DROP TABLE cttascase").collect()(0)
    assert(r.getBoolean(0), "differently-cased DROP must claim the CTTAS")
    assert(!spark.catalog.tableExists("CttasCase"))
  }

  test("DESCRIBE SCHEMA returns the workspace's (schema, properties) row") {
    spark.conf.set("graft.dfs.workspace.descws", "/tmp")
    try {
      val r = spark.sql("DESCRIBE SCHEMA dfs.descws").collect().head
      assert(r.getString(0) == "dfs.descws")
      val props = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(r.getString(1))
      assert(props.get("location").asText == "/tmp")
      assert(props.get("type").asText == "file")
      val e = intercept[Exception] {
        spark.sql("DESCRIBE SCHEMA dfs.nope_ws").collect()
      }
      assert(e.getMessage.contains("unknown workspace"), e.getMessage)
    } finally spark.conf.unset("graft.dfs.workspace.descws")
  }

  test("SHOW SCHEMAS lists dfs workspaces + sys + information_schema") {
    spark.conf.set("graft.dfs.workspace.lake", "/tmp")
    try {
      val names = spark.sql("SHOW SCHEMAS").collect()
        .map(_.getString(0)).toSet
      assert(Set("dfs.root", "dfs.tmp", "dfs.lake", "sys",
        "information_schema").subsetOf(names))
    } finally spark.conf.unset("graft.dfs.workspace.lake")
  }

  test("SHOW TABLES IN dfs.ws lists workspace entries") {
    import spark.implicits._
    val dir = "/tmp/graft_test/session_show"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true); fs.mkdirs(p)
    Seq((1, "a")).toDF("k", "v").write.parquet(s"$dir/t1")
    Seq((1, "a")).toDF("k", "v").write.json(s"$dir/t2.json")
    spark.conf.set("graft.dfs.workspace.shw", dir)
    try {
      val rows = spark.sql("SHOW TABLES IN dfs.shw").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set("dfs.shw" -> "t1", "dfs.shw" -> "t2.json"))
      // bare SHOW TABLES after USE
      spark.sql("USE dfs.shw")
      assert(spark.sql("SHOW TABLES").collect()
        .map(_.getString(1)).toSet == Set("t1", "t2.json"))
    } finally {
      spark.conf.unset("graft.dfs.workspace.shw")
      spark.conf.unset("graft.dfs.defaultWorkspace")
    }
  }

  test("CTTAS: session-scoped materialized temp table, drop reclaims") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .createOrReplaceTempView("cttas_src")
    try {
      val r = spark.sql(
        "CREATE TEMPORARY TABLE my_tmp AS SELECT * FROM cttas_src WHERE k <= 2")
        .collect()(0)
      assert(r.getBoolean(0) && r.getString(1).contains("Temporary table"))
      // visible as a bare name, joins like any table, and is MATERIALIZED
      assert(spark.sql("SELECT count(*) FROM my_tmp").collect()(0)
        .getLong(0) == 2)
      val dir = r.getString(1).split(", ")(1).stripSuffix(")")
      assert(new java.io.File(dir).exists)
      // duplicate name refuses; DROP TABLE reclaims view + files
      val e = intercept[Exception] {
        spark.sql("CREATE TEMPORARY TABLE my_tmp AS SELECT 1")
      }
      assert(e.getMessage.contains("already exists"))
      val d = spark.sql("DROP TABLE my_tmp").collect()(0)
      assert(d.getString(1).contains("dropped"))
      assert(!spark.catalog.tableExists("my_tmp"))
      assert(!new java.io.File(dir).exists)
    } finally spark.catalog.dropTempView("cttas_src")
  }

  test("CTAS with store.format = paimon commits a paimon snapshot") {
    val dir = "/tmp/graft_test/session_ctas_paimon"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.conf.set("graft.dfs.workspace.cts", "/tmp/graft_test")
    spark.conf.set("store.format", "paimon")
    try {
      val r = spark.sql(
        """CREATE TABLE dfs.cts.`session_ctas_paimon` AS
          |SELECT 1 AS k, 'a' AS v UNION ALL SELECT 2, 'b'""".stripMargin)
        .collect()(0)
      assert(r.getString(1).contains("2 records written"))
      assert(graft.sources.PaimonTable.read(spark, dir).count() == 2)
      // and the dfs namespace reads it back by layout
      assert(spark.sql("SELECT * FROM dfs.cts.`session_ctas_paimon`")
        .count() == 2)
    } finally {
      spark.conf.unset("graft.dfs.workspace.cts")
      spark.conf.unset("store.format")
    }
  }
}
