package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.StatsCatalog

class StatsCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val base = s"/tmp/graft_test/stats_$name"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    base
  }

  test("analyze persists stats; load round-trips; ndv exact at small cardinality") {
    val base = freshDir("roundtrip")
    val nation = GraftSession.table(spark, SF, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val computed = StatsCatalog.analyze(spark, base, "nation", nation)
    val loaded = StatsCatalog.load(spark, base, "nation").get
    assert(loaded == computed)
    assert(loaded.rowCount == nation.count())
    val byName = loaded.columns.map(c => c.name -> c).toMap
    // ndv is an HLL++ sketch (rsd 0.01): assert within the error bound
    def close(got: Long, exact: Long): Boolean =
      math.abs(got - exact) <= math.max(1L, math.ceil(exact * 0.05).toLong)
    assert(close(byName("n_nationkey").ndv,
      nation.select("n_nationkey").distinct().count()))
    assert(close(byName("n_regionkey").ndv,
      nation.select("n_regionkey").distinct().count()))
    assert(byName("n_nationkey").nulls == 0)
    assert(byName("n_nationkey").min == "0")
    assert(StatsCatalog.load(spark, base, "never_analyzed").isEmpty)
  }

  test("withBroadcastHint: stored small size => broadcast planned; no stats => untouched") {
    val base = freshDir("hint")
    val nation = GraftSession.table(spark, SF, "nation")
      .select("n_nationkey", "n_name")
    val customer = GraftSession.table(spark, SF, "customer")
      .select("c_custkey", "c_nationkey")
    StatsCatalog.analyze(spark, base, "nation", nation)
    assert(StatsCatalog.load(spark, base, "nation").get.sizeBytes > 0)

    // force the planner away from size-based auto-broadcast so the HINT
    // is the only thing that can produce a broadcast join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unhinted = customer.join(nation,
        col("c_nationkey") === col("n_nationkey"))
      unhinted.collect()
      assert(!unhinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))

      // threshold is explicit here because the session conf above is -1
      val hinted = customer.join(
        StatsCatalog.withBroadcastHint(spark, base, "nation", nation,
          threshold = 10L * 1024 * 1024),
        col("c_nationkey") === col("n_nationkey"))
      hinted.collect()
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "stored stats under threshold must produce a broadcast hint")

      // stats stored but OVER the threshold => no hint
      val big = StatsCatalog.withBroadcastHint(spark, base, "nation", nation,
        threshold = 1L)
      val bigJoin = customer.join(big, col("c_nationkey") === col("n_nationkey"))
      bigJoin.collect()
      assert(!bigJoin.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))

      // never analyzed => untouched
      val none = StatsCatalog.withBroadcastHint(spark, base, "nope", nation,
        threshold = 10L * 1024 * 1024)
      val noneJoin = customer.join(none, col("c_nationkey") === col("n_nationkey"))
      noneJoin.collect()
      assert(!noneJoin.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (64L * 1024 * 1024).toString)
  }

  test("equi-depth histograms: boundaries, selectivity, filtered broadcast") {
    import spark.implicits._
    val base = freshDir("hist")
    // uniform 0..9999 plus a heavy value: equi-depth must adapt depth
    val df = ((0 until 10000).map(_.toLong) ++ Seq.fill(10000)(42L))
      .toDF("x").withColumn("label", concat(lit("r"), col("x")))
    val stats = StatsCatalog.analyze(spark, base, "hist_t", df,
      histogramBuckets = 10)
    val xs = stats.columns.find(_.name == "x").get
    assert(xs.histogram.size === 11)
    assert(xs.histogram === xs.histogram.sorted)
    // non-numeric column gets no histogram
    assert(stats.columns.find(_.name == "label").get.histogram.isEmpty)
    // persisted: reload carries the boundaries
    assert(StatsCatalog.load(spark, base, "hist_t").get
      .columns.find(_.name == "x").get.histogram === xs.histogram)
    // half the rows are the single value 42 — some bucket must be
    // zero-width there (equi-depth, not equi-width)
    assert(xs.histogram.sliding(2).exists(p => p(0) == p(1)))

    // selectivity: [0, 10000) covers everything; [5000, 10000) holds
    // ~25% of rows (heavy 42 pulls mass down); [20000, 30000) nothing
    def sel(lo: Double, hi: Double) =
      StatsCatalog.rangeSelectivity(xs, lo, hi).get
    assert(sel(-1, 10001) === 1.0)
    assert(math.abs(sel(5000, 10001) - 0.25) < 0.05,
      s"got ${sel(5000, 10001)}")
    assert(sel(20000, 30000) === 0.0001)
    // no histogram stored -> None
    assert(StatsCatalog.rangeSelectivity(
      stats.columns.find(_.name == "label").get, 0, 1).isEmpty)

    // filtered broadcast: whole table over the threshold, tight range
    // under it — the histogram turns the hint on
    val whole = StatsCatalog.withBroadcastHint(spark, base, "hist_t", df,
      threshold = stats.sizeBytes / 2)
    assert(whole.queryExecution.logical.collectFirst {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.isEmpty)
    val filtered = StatsCatalog.withFilteredBroadcastHint(spark, base,
      "hist_t", df, "x", lo = 100, hi = 120,
      threshold = stats.sizeBytes / 2)
    assert(filtered.queryExecution.analyzed.collectFirst {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.nonEmpty)
  }

  test("selectivity: point bucket AT the range start counts; suffixed thresholds parse") {
    import spark.implicits._
    val base = freshDir("selpt")
    // 90% of rows are the single value 5 -> histogram holds zero-width
    // buckets at 5; [5, 10) must estimate ~0.9, never the 0.0001 floor
    val df = (Seq.fill(9000)(5L) ++ (0 until 1000).map(_.toLong))
      .toDF("x")
    val stats = StatsCatalog.analyze(spark, base, "selpt_t", df,
      histogramBuckets = 10)
    val xs = stats.columns.find(_.name == "x").get
    val sel = StatsCatalog.rangeSelectivity(xs, 5.0, 10.0).get
    assert(sel > 0.8, s"heavy value at lo must count: $sel")
    // and the open-below range excludes it
    val selBelow = StatsCatalog.rangeSelectivity(xs, 6.0, 10.0).get
    assert(selBelow < 0.2, s"heavy value before lo must not count: $selBelow")
    // size-suffixed threshold strings (Spark's own format) parse
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      val hinted = StatsCatalog.withBroadcastHint(spark, base, "selpt_t", df)
      assert(hinted.queryExecution.analyzed.toString.contains("hint") ||
        hinted.count() == 10000) // no crash is the contract
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      StatsCatalog.withBroadcastHint(spark, base, "selpt_t", df).count()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("snapshot write survives a crashed writer's uncommitted leftover") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val base = freshDir("snapwedge")
    SnapshotTable.write(Seq(1L).toDF("v"), base) // v=1 committed
    // simulate a crash: v=2 exists without _SUCCESS
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(base, "v=2"))
    val v = SnapshotTable.write(Seq(2L).toDF("v"), base)
    assert(v == 3, s"next version must skip the uncommitted leftover: $v")
    assert(SnapshotTable.read(spark, base).collect().map(_.getLong(0)).toSeq
      == Seq(2L))
  }

  test("analyze handles an empty table (fresh partition) without failing") {
    import spark.implicits._
    val base = freshDir("empty")
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val s = StatsCatalog.analyze(spark, base, "empty_t", empty)
    assert(s.rowCount == 0)
    assert(s.columns.forall(c => c.nulls == 0 && c.min == null && c.max == null))
    assert(StatsCatalog.load(spark, base, "empty_t").contains(s))
  }

  test("statsTable lists every analyzed table as a queryable relation") {
    val base = freshDir("table")
    val nation = GraftSession.table(spark, SF, "nation").select("n_nationkey")
    val region = GraftSession.table(spark, SF, "region").select("r_regionkey")
    StatsCatalog.analyze(spark, base, "nation", nation)
    StatsCatalog.analyze(spark, base, "region", region)
    val t = StatsCatalog.statsTable(spark, base)
    assert(t.select("table_name").distinct().collect()
      .map(_.getString(0)).toSet == Set("nation", "region"))
    t.createOrReplaceTempView("graft_stats")
    assert(spark.sql(
      "SELECT count(*) FROM graft_stats WHERE table_name = 'nation'")
      .collect()(0).getLong(0) == 1L)
  }

  test("parquet metadata cache: footer sweep + file-level range pruning " +
      "(REFRESH TABLE METADATA role)") {
    import spark.implicits._
    import graft.sources.ParquetMetadataCache
    val dir = java.nio.file.Files.createTempDirectory("pq_meta_").toString
    // one file per key range so pruning is observable
    val df = (0L until 50L).map(i => (i, s"name_$i", i * 1.5)).toDF("k", "s", "v")
    df.repartitionByRange(5, col("k")).write.mode("overwrite").parquet(dir)

    val n = ParquetMetadataCache.refresh(spark, dir)
    assert(n === 5, s"expected 5 part files indexed, got $n")

    val metas = ParquetMetadataCache.load(spark, dir)
    assert(metas.map(_.rows).sum === 50)
    assert(metas.forall(_.cols.contains("k")))
    // string stats captured too
    assert(metas.exists(_.cols("s").typ == "string"))

    // range [12, 17] lives in at most 2 of the 5 range-partitioned files
    val pruned = ParquetMetadataCache.prunedFiles(spark, dir, "k", 12, 17)
    assert(pruned.size < 5, s"pruning must drop files: kept ${pruned.size}/5")

    val viaCache = ParquetMetadataCache.readRange(spark, dir, "k", 12, 17)
      .select("k").as[Long].collect().sorted
    val full = spark.read.parquet(dir).filter(col("k").between(12, 17))
      .select("k").as[Long].collect().sorted
    assert(viaCache.toSeq === full.toSeq)
    assert(viaCache.toSeq === (12L to 17L))

    // a miss range: zero files, empty result, schema intact
    val empty = ParquetMetadataCache.readRange(spark, dir, "k", 500, 600)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("k", "s", "v"))

    // INCREMENTAL refresh: unchanged directory → zero footers re-read,
    // manifest intact
    assert(ParquetMetadataCache.refresh(spark, dir) === 0)
    assert(ParquetMetadataCache.load(spark, dir).map(_.rows).sum === 50)

    // replace one part file in place → exactly that footer re-read
    val stage = java.nio.file.Files.createTempDirectory("pq_meta_one_").toString
    Seq((999L, "changed", 0.0)).toDF("k", "s", "v")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val replacement = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .minBy(_.getName)
    val victimRows = ParquetMetadataCache.load(spark, dir)
      .find(_.path.endsWith(victim.getName)).get.rows
    java.nio.file.Files.copy(replacement.toPath, victim.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the stale Hadoop checksum sidecar left by the in-place swap
    new java.io.File(victim.getParent, "." + victim.getName + ".crc").delete()
    assert(ParquetMetadataCache.refresh(spark, dir) === 1)
    val after = ParquetMetadataCache.load(spark, dir)
    assert(after.size === 5)
    assert(after.map(_.rows).sum === 50 - victimRows + 1)
  }
}
