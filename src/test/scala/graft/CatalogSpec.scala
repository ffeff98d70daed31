package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, ViewCatalog}

class CatalogSpec extends AnyFunSuite {
  import TestSpark._

  test("INFORMATION_SCHEMA tables/columns reflect registered views") {
    GraftSession.table(spark, SF, "region").createOrReplaceTempView("cat_region")
    val tabs = GraftCatalog.tables(spark)
    assert(tabs.filter(tabs("table_name") === "cat_region").count() == 1)

    val cols = GraftCatalog.columns(spark, "cat_region").collect()
    val byName = cols.map(r => r.getAs[String]("column_name") -> r.getAs[String]("data_type")).toMap
    assert(Set("r_regionkey", "r_name").subsetOf(byName.keySet))
    assert(Set("int", "bigint").contains(byName("r_regionkey")))
    assert(byName("r_name") == "string")
  }

  test("INFORMATION_SCHEMA.FILES lists workspace files (Drill 1.15 files table)") {
    val dir = java.nio.file.Files.createTempDirectory("isfiles")
    java.nio.file.Files.writeString(dir.resolve("a.csv"), "x\n1\n")
    java.nio.file.Files.createDirectory(dir.resolve("sub"))
    java.nio.file.Files.writeString(dir.resolve("sub").resolve("b.json"), "{}\n")
    spark.conf.set("graft.dfs.workspace.isf", dir.toString)
    try {
      val flat = GraftCatalog.files(spark)
        .filter(org.apache.spark.sql.functions.col("workspace_name") === "isf")
        .collect()
      val names = flat.map(_.getAs[String]("file_name")).toSet
      assert(names == Set("a.csv", "sub"), names)
      val a = flat.find(_.getAs[String]("file_name") == "a.csv").get
      assert(a.getAs[Boolean]("is_file") && !a.getAs[Boolean]("is_directory"))
      assert(a.getAs[Long]("length") == 4L)
      assert(a.getAs[String]("schema_name") == "dfs.isf")
      val deep = GraftCatalog.files(spark, recursive = true)
        .filter(org.apache.spark.sql.functions.col("workspace_name") === "isf")
        .collect().map(_.getAs[String]("relative_path")).toSet
      assert(deep.contains("sub/b.json"), deep)
    } finally spark.conf.unset("graft.dfs.workspace.isf")
  }

  test("catalogs and schemata are queryable as DataFrames") {
    val cats = GraftCatalog.catalogs(spark).collect().map(_.getString(0))
    assert(cats.contains("spark_catalog"))
    val schemas = GraftCatalog.schemata(spark).collect()
      .map(_.getAs[String]("schema_name"))
    assert(schemas.contains("default"))
  }

  test("sys tables expose options/version/bits/memory as DataFrames") {
    import graft.sources.SysTables
    val opts = SysTables.options(spark)
    assert(opts.columns.toSeq == Seq("name", "value"))
    assert(opts.filter(opts("name") === "spark.sql.shuffle.partitions").count() == 1)
    val v = SysTables.version(spark).collect()(0)
    assert(v.getString(0).startsWith("4."))
    assert(v.getString(2).startsWith("2.13"))
    assert(SysTables.bits(spark).count() >= 1)
    val m = SysTables.memory(spark).collect()(0)
    assert(m.getLong(0) >= m.getLong(1) && m.getLong(1) >= m.getLong(2))
    val th = SysTables.threads(spark)
    assert(th.count() >= 2) // at least main + some runtime thread
    assert(th.filter(th("name") === "main").count() == 1)
  }

  test("persistent views survive into a new session (Drill ViewHandler)") {
    val base = java.nio.file.Files.createTempDirectory("graft_views").toString
    GraftSession.table(spark, SF, "nation").createOrReplaceTempView("vc_nation")
    ViewCatalog.create(spark, base, "small_nations",
      "SELECT n_nationkey, n_name FROM vc_nation WHERE n_nationkey < 5")
    assert(spark.sql("SELECT count(*) FROM small_nations").collect()(0).getLong(0) == 5)

    // a broken definition must be rejected, not stored
    intercept[Exception] {
      ViewCatalog.create(spark, base, "broken", "SELECT nope FROM vc_nation")
    }
    assert(ViewCatalog.list(spark, base).map(_.name) == Seq("small_nations"))

    // fresh session: only the durable layer can bring the view back
    val fresh = spark.newSession()
    assert(fresh.catalog.tableExists("small_nations") == false)
    GraftSession.table(fresh, SF, "nation").createOrReplaceTempView("vc_nation")
    ViewCatalog.load(fresh, base)
    assert(fresh.sql("SELECT count(*) FROM small_nations").collect()(0).getLong(0) == 5)

    // INFORMATION_SCHEMA.VIEWS reads from storage
    val v = ViewCatalog.views(fresh, base).collect()
    assert(v.length == 1 && v(0).getString(0) == "small_nations")
    assert(v(0).getString(1).toLowerCase.contains("n_nationkey < 5"))

    assert(ViewCatalog.drop(fresh, base, "small_nations"))
    assert(ViewCatalog.list(fresh, base).isEmpty)
  }

  test("load resolves view-on-view regardless of name order") {
    val base = java.nio.file.Files.createTempDirectory("graft_views2").toString
    GraftSession.table(spark, SF, "region").createOrReplaceTempView("vc_region")
    // "a_small" depends on "z_regions" but sorts FIRST — load must retry
    ViewCatalog.create(spark, base, "z_regions",
      "SELECT r_regionkey, r_name FROM vc_region")
    ViewCatalog.create(spark, base, "a_small",
      "SELECT * FROM z_regions WHERE r_regionkey < 2")
    val fresh = spark.newSession()
    GraftSession.table(fresh, SF, "region").createOrReplaceTempView("vc_region")
    ViewCatalog.load(fresh, base)
    assert(fresh.sql("SELECT count(*) FROM a_small").collect()(0).getLong(0) == 2)
  }

  test("sys.functions lists built-ins AND graft-native kernels with classes") {
    val fns = graft.sources.SysTables.functions(spark)
      .collect().map(r => r.getString(0) -> r).toMap
    // graft kernels injected by GraftExtensions resolve with their classes
    for (name <- Seq("cosine_sim", "md5_hash32", "simhash_text64", "metaphone")) {
      assert(fns.contains(name), s"missing $name")
      assert(fns(name).getBoolean(3), s"$name should be graft_native")
      assert(fns(name).getString(1).startsWith("graft."))
    }
    // spark built-ins are present and not claimed as graft's
    assert(fns.contains("abs") && !fns("abs").getBoolean(3))
    assert(fns.size > 300) // the whole registry, not a curated list
  }

  test("sys.profiles records completed actions via the listener (bounded)") {
    import graft.sources.QueryProfiles
    QueryProfiles.enable(spark, capacity = 50)
    try {
      spark.range(100).selectExpr("sum(id)").collect()
      // listener events are delivered asynchronously — poll briefly
      var tries = 0
      def done(): Boolean = QueryProfiles.profiles(spark)
        .filter("status = 'success'").count() >= 1
      while (!done() && tries < 100) { Thread.sleep(100); tries += 1 }
      val rows = QueryProfiles.profiles(spark)
        .select("action", "status", "duration_ms", "error").collect()
      assert(rows.exists(r => r.getString(1) == "success"))
      assert(rows.length <= 50)
    } finally QueryProfiles.disable(spark)
  }

  test("sys.profile_stages carries per-stage rows/bytes/duration, joinable to profiles") {
    import graft.sources.QueryProfiles
    QueryProfiles.enable(spark, capacity = 50)
    try {
      // a shuffling query over a real scan: input AND shuffle metrics
      val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      df.groupBy("l_returnflag").count().collect()
      var tries = 0
      def stages() = QueryProfiles.stageProfiles(spark)
      while (stages().filter("input_records > 0").count() == 0 && tries < 100) {
        Thread.sleep(100); tries += 1
      }
      val rows = stages().collect()
      // scan stage read real records/bytes; some stage shuffled
      assert(rows.exists(r => r.getAs[Long]("input_records") > 0
        && r.getAs[Long]("input_bytes") > 0))
      assert(rows.exists(r => r.getAs[Long]("shuffle_write_records") > 0))
      // stage rows tie back to a SQL execution present in sys.profiles
      val execIds = QueryProfiles.profiles(spark)
        .select("execution_id").collect().map(_.getLong(0)).toSet
      assert(rows.exists(r => execIds.contains(r.getAs[Long]("execution_id"))))
    } finally QueryProfiles.disable(spark)
  }

  test("sys.profile_operators carries per-operator metrics (rows out, " +
      "shuffle writes), joinable to profiles") {
    import graft.sources.QueryProfiles
    QueryProfiles.enable(spark, capacity = 50)
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      df.groupBy("l_returnflag").count().collect()
      var tries = 0
      def ops() = QueryProfiles.operatorProfiles(spark)
      while (ops().count() == 0 && tries < 100) {
        Thread.sleep(100); tries += 1
      }
      val rows = ops().collect()
      // the aggregate's operators declare "number of output rows"; a
      // scan node and an exchange node must both have recorded metrics
      assert(rows.exists(r => r.getAs[String]("metric") == "number of output rows"
        && r.getAs[Long]("value") > 0))
      assert(rows.exists(r =>
        r.getAs[String]("node").toLowerCase.contains("scan")))
      assert(rows.exists(r =>
        r.getAs[String]("node").toLowerCase.contains("exchange") ||
        r.getAs[String]("metric").toLowerCase.contains("shuffle")))
      // only the sum-shaped metric types are emitted (an averaged metric
      // summed across tasks would lie)
      assert(rows.forall(r => Set("sum", "size", "timing", "nsTiming")
        .contains(r.getAs[String]("metric_type"))))
      // operator rows tie back to a SQL execution present in sys.profiles
      val execIds = QueryProfiles.profiles(spark)
        .select("execution_id").collect().map(_.getLong(0)).toSet
      assert(rows.exists(r => execIds.contains(r.getAs[Long]("execution_id"))))
    } finally QueryProfiles.disable(spark)
  }
}
