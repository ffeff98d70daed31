package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Writer

class WriterSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  private lazy val src = {
    import spark.implicits._
    Seq((1L, "a", 1.5), (2L, "b", 2.25), (3L, "a", -0.75))
      .toDF("id", "tag", "v")
  }

  test("CTAS roundtrips parquet/orc/json/csv (SURVEY row 69)") {
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      // csv type inference may narrow small ints — normalize before compare
      val back = Writer.ctas(src, s"${tmp("ctas")}/t_$fmt", fmt)
        .select(col("id").cast("long"), col("tag"), col("v").cast("double"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(back == Set((1L, "a", 1.5), (2L, "b", 2.25), (3L, "a", -0.75)), fmt)
    }
  }

  test("partitioned CTAS produces hive layout and prunes on read (SURVEY row 68)") {
    val path = s"${tmp("ctaspart")}/t"
    val back = Writer.ctas(src, path, "parquet", partitionBy = Seq("tag"))
    assert(new java.io.File(s"$path/tag=a").isDirectory)
    assert(new java.io.File(s"$path/tag=b").isDirectory)
    val pruned = back.filter(col("tag") === "a")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tag"))
    assert(!plan.matches("(?s).*PushedFilters: \\[[^\\]]*tag.*"),
      "partition filter must not fall through to data filters")
    assert(pruned.count() == 2)
  }

  test("unnamed dir0/dir1 columns from directory layout (Drill PartitionExplorer)") {
    val base = tmp("dirs")
    src.filter(col("id") === 1).write.parquet(s"$base/2024/01")
    src.filter(col("id") === 2).write.parquet(s"$base/2024/02")
    val df = Writer.withDirColumns(
      spark.read.option("recursiveFileLookup", "true").parquet(base), base)
    val got = df.select("id", "dir0", "dir1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "2024", "01"), (2L, "2024", "02")))
  }

  test("dirN anchors on the FULL base path: an ancestor directory with " +
      "the base's leaf name must not shift the levels") {
    // .../logs/logs: a leaf-name-only anchor matched the OUTER /logs/
    // and emitted dir0="logs" instead of the real first level
    val outer = tmp("logs")
    val base = s"$outer/logs"
    src.filter(col("id") === 1).write.parquet(s"$base/2025/07")
    val df = Writer.withDirColumns(
      spark.read.option("recursiveFileLookup", "true").parquet(base), base)
    val got = df.select("dir0", "dir1").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("2025", "07")), got)
  }
}
