package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AliasRegistry

/** Drill 1.21 alias registry (sources/AliasRegistry.scala + the
  * DfsParser resolution hook): CREATE/DROP [PUBLIC] ALIAS FOR
  * TABLE/STORAGE, persistent across sessions, catalog names always win. */
class AliasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.SF

  private def withCleanRegistry(f: => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("aliases_").toString
    spark.conf.set("graft.alias.dir", dir)
    try f finally {
      spark.conf.unset("graft.alias.dir")
    }
  }

  test("table alias for a dfs path resolves through SQL") {
    withCleanRegistry {
      val r = spark.sql(
        s"CREATE ALIAS nations FOR TABLE dfs.`$sf/nation.parquet`")
        .collect().head
      assert(r.getBoolean(0) && r.getString(1).contains("created successfully"))
      assert(spark.sql("SELECT count(*) AS n FROM nations")
        .collect().head.getLong(0) === 25)
      // composes: joins, filters
      assert(spark.sql(
        """SELECT count(*) FROM nations a JOIN nations b
           ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey""")
        .collect().head.getLong(0) > 0)
    }
  }

  test("table alias for a catalog table; real tables shadow aliases") {
    withCleanRegistry {
      spark.range(5).toDF("v").createOrReplaceTempView("alias_target_t")
      spark.sql("CREATE ALIAS at1 FOR TABLE alias_target_t")
      assert(spark.sql("SELECT count(*) FROM at1").collect().head.getLong(0) === 5)
      // an alias colliding with a REAL view never engages
      spark.range(3).toDF("v").createOrReplaceTempView("real_wins")
      spark.sql(s"CREATE ALIAS real_wins FOR TABLE dfs.`$sf/nation.parquet`")
      assert(spark.sql("SELECT count(*) FROM real_wins")
        .collect().head.getLong(0) === 3)
      // a CTE with the alias name shadows it too
      spark.sql(s"CREATE ALIAS cte_shadow FOR TABLE dfs.`$sf/nation.parquet`")
      assert(spark.sql(
        """WITH cte_shadow AS (SELECT 1 AS one)
           SELECT count(*) FROM cte_shadow""").collect().head.getLong(0) === 1)
    }
  }

  test("storage alias: aliased head resolves as dfs") {
    withCleanRegistry {
      spark.sql("CREATE ALIAS warehouse FOR STORAGE dfs")
      assert(spark.sql(s"SELECT count(*) FROM warehouse.`$sf/region.parquet`")
        .collect().head.getLong(0) === 5)
    }
  }

  test("OR REPLACE, duplicate error, DROP, DROP ALL, PUBLIC scope") {
    withCleanRegistry {
      spark.sql(s"CREATE ALIAS dup FOR TABLE dfs.`$sf/nation.parquet`")
      val e = intercept[Exception](
        spark.sql(s"CREATE ALIAS dup FOR TABLE dfs.`$sf/region.parquet`"))
      assert(e.getMessage.contains("already exists"))
      spark.sql(s"CREATE OR REPLACE ALIAS dup FOR TABLE dfs.`$sf/region.parquet`")
      assert(spark.sql("SELECT count(*) FROM dup").collect().head.getLong(0) === 5)

      spark.sql(s"CREATE PUBLIC ALIAS pub1 FOR TABLE dfs.`$sf/nation.parquet`")
      // scope must match on drop: user-scope drop misses the public alias
      val miss = intercept[Exception](spark.sql("DROP ALIAS pub1"))
      assert(miss.getMessage.contains("No alias found"))
      spark.sql("DROP PUBLIC ALIAS pub1")
      assert(AliasRegistry.tableAlias(spark, "pub1").isEmpty)

      spark.sql("DROP ALIAS dup")
      assert(AliasRegistry.tableAlias(spark, "dup").isEmpty)

      spark.sql(s"CREATE ALIAS a1 FOR TABLE dfs.`$sf/nation.parquet`")
      spark.sql("CREATE ALIAS s1 FOR STORAGE dfs")
      val r = spark.sql("DROP ALL ALIASES").collect().head
      assert(r.getString(1).startsWith("2 aliases"))
      assert(AliasRegistry.load(spark)._1.isEmpty &&
        AliasRegistry.load(spark)._2.isEmpty)
    }
  }

  test("alias matching is case-insensitive end to end (Drill identifiers)") {
    withCleanRegistry {
      spark.range(3).toDF("v").createOrReplaceTempView("ci_target")
      spark.sql("CREATE ALIAS ci_alias FOR TABLE ci_target")
      // duplicate under different case refuses without OR REPLACE
      val e = intercept[Exception](
        spark.sql("CREATE ALIAS CI_ALIAS FOR TABLE ci_target"))
      assert(e.getMessage.contains("already exists"), e.getMessage)
      // resolution and DROP both match case-insensitively
      assert(spark.sql("SELECT count(*) FROM CI_ALIAS")
        .collect().head.getLong(0) === 3)
      val r = spark.sql("DROP ALIAS CI_ALIAS").collect().head
      assert(r.getBoolean(0))
      assert(graft.sources.AliasRegistry.tableAlias(spark, "ci_alias").isEmpty)
    }
  }

  test("a view definition that is a command refuses instead of executing") {
    val base = java.nio.file.Files.createTempDirectory("vcmd").toString
    spark.range(4).toDF("v").createOrReplaceTempView("vc_cmd_src")
    val e = intercept[Exception] {
      graft.sources.ViewCatalog.create(spark, base, "vbad",
        "DROP TABLE IF EXISTS vc_cmd_src")
    }
    assert(e.getMessage.contains("command"), e.getMessage)
    assert(spark.catalog.tableExists("vc_cmd_src"),
      "the command must not have executed")
  }

  test("sys.table_aliases / sys.storage_aliases list the registry") {
    withCleanRegistry {
      spark.sql(s"CREATE PUBLIC ALIAS t1 FOR TABLE dfs.`$sf/nation.parquet`")
      spark.sql("CREATE ALIAS s1 FOR STORAGE dfs")
      val t = graft.sources.SysTables.tableAliases(spark).collect()
      assert(t.length === 1 && t.head.getString(0) === "t1" &&
        t.head.getBoolean(3))
      val s = graft.sources.SysTables.storageAliases(spark).collect()
      assert(s.length === 1 && s.head.getString(0) === "s1" &&
        s.head.getString(1) === "dfs" && !s.head.getBoolean(3))
    }
  }

  test("aliases persist: a fresh session resolves them from storage") {
    val dir = java.nio.file.Files.createTempDirectory("aliases_p_").toString
    spark.conf.set("graft.alias.dir", dir)
    try {
      spark.sql(s"CREATE ALIAS persisted FOR TABLE dfs.`$sf/nation.parquet`")
      val fresh = spark.newSession()
      fresh.conf.set("graft.alias.dir", dir)
      assert(fresh.sql("SELECT count(*) FROM persisted")
        .collect().head.getLong(0) === 25)
    } finally spark.conf.unset("graft.alias.dir")
  }
}
