package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Writer

/** Bucketed co-located joins (Writer.bucketedCtas) and Drill's
  * `EXPLAIN PLAN FOR` SQL form (ref exec/.../planner/sql/handlers/
  * ExplainHandler.java). The bucketing assertion is the scale claim
  * itself: co-bucketed fact tables join AND aggregate with zero
  * shuffle exchanges in the executed plan. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("co-bucketed tables: join + same-key aggregate run with ZERO exchanges") {
    val li = GraftSession.table(spark, SF, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = GraftSession.table(spark, SF, "orders")
      .select("o_orderkey", "o_totalprice")
    Writer.bucketedCtas(li, "b_lineitem", 8, Seq("l_orderkey"), Seq("l_orderkey"))
    Writer.bucketedCtas(ord, "b_orders", 8, Seq("o_orderkey"), Seq("o_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("price"))
      val rows = j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ: $p")
      // the whole point: bucket layout feeds the join AND the follow-up
      // groupBy (outputPartitioning = HashPartitioning(bucket cols)), so
      // neither shuffles — at 100 TB this is the shuffle you never pay
      assert(!p.contains("Exchange"), s"co-bucketed plan must not shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount"), "scan should be bucket-aware")

      // correctness: identical to the plain (shuffled) join
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("price"))
        .collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet ==
        plain.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("bucket-pruned point lookup reads one bucket") {
    val ord = GraftSession.table(spark, SF, "orders")
      .select("o_orderkey", "o_totalprice")
    Writer.bucketedCtas(ord, "b_orders_prune", 8, Seq("o_orderkey"))
    // filter-only scans have no clustering requirement, so the planner
    // auto-degrades to a plain scan — force the bucketed read so the
    // bucket-pruning path engages
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = spark.table("b_orders_prune").filter(col("o_orderkey") === 1L)
      one.collect()
      val p = one.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
      assert(m.isDefined, s"bucket pruning info missing: $p")
      assert(m.get.group(1).toInt == 1 && m.get.group(2).toInt == 8,
        s"point lookup should prune to 1 of 8 buckets: ${m.get.matched}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS b_orders_prune")
    }
  }

  test("bucketedCtas refuses to clear a path that is not a previous table") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("notatable")
    java.nio.file.Files.writeString(d.resolve("precious.txt"), "user data")
    val df = Seq((1L, "a")).toDF("k", "v")
    spark.sql("DROP TABLE IF EXISTS b_refuse")
    val e = intercept[IllegalArgumentException] {
      Writer.bucketedCtas(df, "b_refuse", 2, Seq("k"), path = Some(d.toString))
    }
    assert(e.getMessage.contains("refusing"))
    assert(java.nio.file.Files.exists(d.resolve("precious.txt")))
  }

  test("EXPLAIN PLAN FOR returns (text, json); WITHOUT IMPLEMENTATION = logical") {
    val r = spark.sql(
      s"EXPLAIN PLAN FOR SELECT count(*) AS n FROM dfs.`$SF/orders.parquet`")
      .collect().head
    val text = r.getString(r.fieldIndex("text"))
    assert(text.contains("HashAggregate") || text.contains("Scan parquet"),
      s"physical plan expected: $text")
    val json = r.getString(r.fieldIndex("json"))
    assert(json.startsWith("["), "json plan dump expected")

    val lr = spark.sql(
      s"EXPLAIN PLAN WITHOUT IMPLEMENTATION FOR " +
        s"SELECT count(*) AS n FROM dfs.`$SF/orders.parquet`")
      .collect().head
    val ltext = lr.getString(lr.fieldIndex("text"))
    assert(ltext.contains("Aggregate") && !ltext.contains("HashAggregate"),
      s"optimized logical plan expected: $ltext")

    val ar = spark.sql(
      s"EXPLAIN PLAN INCLUDING ALL ATTRIBUTES FOR " +
        s"SELECT count(*) AS n FROM dfs.`$SF/orders.parquet`")
      .collect().head
    assert(ar.getString(ar.fieldIndex("text")).contains("Physical Plan"),
      "formatted explain expected for INCLUDING ALL ATTRIBUTES")
  }

  test("EXPLAIN PLAN FOR never executes what it explains") {
    import spark.implicits._
    // graft-claimed DML refuses (claiming it would run the delete)
    val dir = java.nio.file.Files.createTempDirectory("explaindml").toString
    graft.sources.DeltaLogWriter.write(
      (1 to 10).map(i => (i.toLong, i * 2.0)).toDF("k", "v"), s"$dir/t")
    spark.conf.set("graft.dfs.workspace.explws", dir)
    try {
      val e = intercept[Exception] {
        spark.sql("EXPLAIN PLAN FOR DELETE FROM dfs.explws.`t` WHERE k > 0")
      }
      assert(e.getMessage.contains("command"), e.getMessage)
      assert(graft.sources.DeltaLogReader.read(spark, s"$dir/t").count() == 10,
        "EXPLAIN must not have deleted anything")
      // Spark-native commands plan without running: the table must NOT
      // be created by explaining its CTAS
      spark.sql("DROP TABLE IF EXISTS expl_ctas_probe")
      val r = spark.sql(
        "EXPLAIN PLAN FOR CREATE TABLE expl_ctas_probe AS SELECT 1 AS x")
        .collect().head
      assert(r.getString(r.fieldIndex("text")).contains("CreateTable") ||
        r.getString(r.fieldIndex("text")).contains("CTAS") ||
        r.getString(r.fieldIndex("text")).nonEmpty)
      assert(!spark.catalog.tableExists("expl_ctas_probe"),
        "EXPLAIN must not have created the table")
    } finally spark.conf.unset("graft.dfs.workspace.explws")
  }
}
