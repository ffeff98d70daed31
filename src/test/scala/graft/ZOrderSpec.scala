package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder
import graft.sources.{DeltaLogReader, DeltaLogWriter}

/** Z-order clustering: bit-interleave correctness, the data-skipping
  * property it exists for (file min/max ranges tight on EVERY zorder
  * column, vs a single-column sort where the second column's ranges are
  * useless), and the Delta `OPTIMIZE ... ZORDER BY` rewrite. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  test("withZValue interleaves quantized bits dimension-major") {
    // explicit mid-value cuts -> bucket == value; hand-computed morton
    // codes for each (a,b) pair
    val df = Seq((0.0, 0.0), (1.0, 3.0), (2.0, 1.0), (3.0, 2.0))
      .toDF("a", "b")
    val cuts = Map("a" -> Array(0.5, 1.5, 2.5), "b" -> Array(0.5, 1.5, 2.5))
    val z = ZOrder.withZValue(df, Seq("a", "b"), bits = 2, cuts = cuts)
      .select("a", "b", "zval").collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap
    def morton(x: Long, y: Long): Long =
      (0 until 2).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    assert(z((0.0, 0.0)) == morton(0, 0))
    assert(z((1.0, 3.0)) == morton(1, 3))
    assert(z((2.0, 1.0)) == morton(2, 1))
    assert(z((3.0, 2.0)) == morton(3, 2))
    // computed equi-depth boundaries: 2^bits-1 cuts per column, sorted
    val auto = ZOrder.boundaries(df, Seq("a", "b"), bits = 2)
    assert(auto("a").length == 3 && auto("a").sorted.sameElements(auto("a")))
  }

  test("zval is monotone in each dimension when others are fixed; nulls land at 0") {
    val df = (0 until 1000).map(i => (i.toDouble, (i * 37 % 1000).toDouble))
      .toDF("a", "b")
    val z = ZOrder.withZValue(df, Seq("a", "b"), bits = 4)
    // fix b-bucket by filtering to a narrow b range, a-order must hold
    val series = z.filter(col("b") < 50).orderBy("a")
      .select("zval").collect().map(_.getLong(0))
    assert(series.zip(series.tail).forall { case (x, y) => x <= y },
      "zval must be non-decreasing in a within a fixed b bucket")
    val withNull = Seq((Option.empty[Double], Option(5.0))).toDF("a", "b")
      .unionByName(df)
    val nz = ZOrder.withZValue(withNull, Seq("a", "b"), bits = 4)
      .filter(col("a").isNull).select("zval").collect().head.getLong(0)
    // null a -> bucket 0 in dimension a: every a-bit of zval clear
    assert((0 until 4).forall(i => ((nz >> (2 * i)) & 1L) == 0L))
  }

  test("z-ordered layout skips files on BOTH columns; single-sort only on one") {
    // two independent uniform columns; 16 files
    val n = 20000
    val df = (0 until n).map { i =>
      val r = new scala.util.Random(i)
      (r.nextDouble() * 1000, r.nextDouble() * 1000, i.toLong)
    }.toDF("x", "y", "id")

    def fileRanges(path: String): Array[(Double, Double, Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))

    // a mid-range 5%-wide predicate on each column
    def overlapping(ranges: Array[(Double, Double, Double, Double)],
                    onX: Boolean): Int = {
      val (lo, hi) = (500.0, 550.0)
      ranges.count { case (x0, x1, y0, y1) =>
        if (onX) x1 >= lo && x0 <= hi else y1 >= lo && y0 <= hi }
    }

    val zPath = tmp("zorder") + "/t"
    ZOrder.layout(df, Seq("x", "y"), files = 16)
      .write.parquet(zPath)
    val zr = fileRanges(zPath)
    assert(zr.length >= 12, s"expected ~16 files, got ${zr.length}")
    assert(overlapping(zr, onX = true) <= zr.length / 2,
      s"x-predicate should skip >=half the z-ordered files: " +
        s"${overlapping(zr, onX = true)} of ${zr.length}")
    assert(overlapping(zr, onX = false) <= zr.length / 2,
      s"y-predicate should skip >=half the z-ordered files: " +
        s"${overlapping(zr, onX = false)} of ${zr.length}")

    // contrast: sorting by x alone leaves y ranges ~full-width
    val sPath = tmp("singlesort") + "/t"
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(sPath)
    val sr = fileRanges(sPath)
    assert(overlapping(sr, onX = true) <= 2, "x-sort skips on x")
    assert(overlapping(sr, onX = false) >= sr.length - 1,
      "x-sort cannot skip on y — the gap zorder closes")

    // layout is a permutation, never a filter
    assert(spark.read.parquet(zPath).count() == n)
    assert(spark.read.parquet(zPath).agg(sum("id")).head.getLong(0) ==
      df.agg(sum("id")).head.getLong(0))
  }

  test("OPTIMIZE ... ZORDER BY on Delta: contents identical, dataChange=false, travel intact") {
    val path = tmp("deltaz") + "/t"
    val df = (0 until 5000).map { i =>
      val r = new scala.util.Random(i + 7)
      (r.nextDouble() * 100, r.nextDouble() * 100, i.toLong)
    }.toDF("x", "y", "id")
    // several files so the rewrite has something to cluster
    DeltaLogWriter.write(df.repartition(8), path,
      org.apache.spark.sql.SaveMode.Overwrite)
    val before = DeltaLogReader.read(spark, path)
      .agg(count(lit(1)), sum("id")).head
    spark.conf.set("graft.dfs.workspace.zws",
      new java.io.File(path).getParent)
    val msg = spark.sql("OPTIMIZE dfs.zws.`t` ZORDER BY (x, y)")
      .collect().head.getString(1)
    assert(msg.contains("z-ordered by (x, y)"), msg)
    val after = DeltaLogReader.read(spark, path)
    assert(after.agg(count(lit(1)), sum("id")).head == before)
    // clustering held: a filter on either column overlaps a minority of files
    val ranges = after.groupBy(input_file_name())
      .agg(min("x"), max("x"), min("y"), max("y")).collect()
    if (ranges.length >= 4) {
      val hitY = ranges.count(r => r.getDouble(4) >= 50 && r.getDouble(3) <= 55)
      assert(hitY < ranges.length,
        "y-predicate should not overlap every z-ordered file")
    }
    // the rewrite is logically a no-op: v1 travel still sees originals
    val v0 = DeltaLogReader.read(spark, path, Some(0L))
    assert(v0.count() == 5000)
    // and the commit marked dataChange=false throughout
    val logDir = new java.io.File(path, "_delta_log")
    val last = logDir.listFiles().filter(_.getName.endsWith(".json"))
      .map(_.getName.stripSuffix(".json").toLong).max
    val lines = scala.io.Source.fromFile(
      new java.io.File(logDir, f"$last%020d.json")).getLines().mkString("\n")
    assert(!lines.contains("\"dataChange\":true"), "zorder commit must be dataChange=false")
  }

  test("string columns zorder by byte-prefix rank; all-null and empty inputs are safe") {
    // strings: ordering-preserving 7-byte prefix key — zval monotone in
    // the string within a fixed numeric bucket
    val df = (0 until 260).map(i => (f"k$i%04d", i.toDouble))
      .toDF("s", "v")
    val z = ZOrder.withZValue(df, Seq("s", "v"), bits = 4)
    val series = z.filter(col("v") < 10).orderBy("s")
      .select("zval").collect().map(_.getLong(0))
    assert(series.zip(series.tail).forall { case (a, b) => a <= b },
      "zval must be non-decreasing in the string dimension")
    // unsupported type errors clearly
    val e = intercept[IllegalArgumentException] {
      ZOrder.withZValue(df.select(col("s"), array(col("v")).as("a")),
        Seq("a"), bits = 4)
    }
    assert(e.getMessage.contains("unsupported type"), e.getMessage)
    // all-null column: no cuts, bucket 0 everywhere, no NPE
    val nulls = df.select(col("s"), lit(null).cast("double").as("n"))
    val zn = ZOrder.withZValue(nulls, Seq("n"), bits = 4)
    assert(zn.select("zval").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(0L))
    // empty input: boundaries collect an empty row without NPE
    val empty = ZOrder.withZValue(df.limit(0), Seq("v"), bits = 4)
    assert(empty.count() == 0)
  }

  test("OPTIMIZE ... ZORDER BY on Iceberg: replace snapshot, contents identical") {
    val dir = tmp("icez")
    val df = (0 until 4000).map { i =>
      val r = new scala.util.Random(i + 11)
      (r.nextDouble() * 100, r.nextDouble() * 100, i.toLong)
    }.toDF("x", "y", "id")
    graft.sources.IcebergTable.write(df.repartition(6), s"$dir/t",
      org.apache.spark.sql.SaveMode.Overwrite)
    spark.conf.set("graft.dfs.workspace.izws", dir)
    val msg = spark.sql("OPTIMIZE dfs.izws.`t` ZORDER BY (x, y)")
      .collect().head.getString(1)
    assert(msg.contains("z-ordered by (x, y)"), msg)
    val after = graft.sources.IcebergTable.read(spark, s"$dir/t")
    assert(after.count() == 4000)
    assert(after.agg(sum("id")).head.getLong(0) ==
      df.agg(sum("id")).head.getLong(0))
    // the rewrite committed as a replace snapshot: incremental consumers
    // see no new rows from it
    val meta = graft.sources.IcebergTable.read(spark, s"$dir/t#snapshots")
    assert(meta.filter(col("operation") === "replace").count() >= 1)
  }

  test("ZORDER BY refuses paimon targets and unknown columns") {
    val dir = tmp("paimz")
    graft.sources.PaimonTable.write((1 to 10).toDF("v"), s"$dir/t",
      org.apache.spark.sql.SaveMode.Overwrite)
    spark.conf.set("graft.dfs.workspace.pzws", dir)
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE dfs.pzws.`t` ZORDER BY (v)").collect()
    }
    assert(e.getMessage.contains("Delta and Iceberg targets only"), e.getMessage)

    val path = tmp("deltazbad") + "/t"
    DeltaLogWriter.write((1 to 10).map(i => (i, i * 2)).toDF("a", "b"), path,
      org.apache.spark.sql.SaveMode.Overwrite)
    val e2 = intercept[Exception] {
      DeltaLogWriter.optimize(spark, path, zorderBy = Seq("nope"))
    }
    assert(e2.getMessage.contains("not in table schema"), e2.getMessage)
  }
}
