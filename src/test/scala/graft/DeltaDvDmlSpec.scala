package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeltaDml, DeltaLogReader, DeltaLogWriter}

/** DELETE via deletion vectors on Delta tables — the delta-spark default
  * delete shape once the feature is on: affected files re-added with a
  * DV descriptor, never rewritten. */
class DeltaDvDmlSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val base = s"/tmp/graft_test/deltadv_$name"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    base
  }

  private def keys(base: String) = DeltaLogReader.read(spark, base)
    .select("k").collect().map(_.getLong(0)).toSet

  test("deleteDv: rows vanish, data files untouched, protocol declares " +
      "the feature") {
    import spark.implicits._
    val base = freshDir("basic")
    DeltaLogWriter.write(
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), base)
    def parquetFiles(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).toSet
    }
    val dataFilesBefore = parquetFiles()
    val (v, n) = DeltaDml.deleteDv(spark, base, col("k") % 10 === 0)
    assert(v == 1L && n == 10L)
    assert(keys(base) == (1L to 100L).filterNot(_ % 10 == 0).toSet)
    // merge-on-read: no data file was rewritten — the commit added only
    // the DV bin file
    assert(parquetFiles() == dataFilesBefore,
      "DV delete must not rewrite data files")
    // the commit carries the protocol feature declaration
    val log = scala.io.Source.fromFile(
      s"$base/_delta_log/00000000000000000001.json").mkString
    assert(log.contains("\"deletionVectors\""))
    assert(log.contains("\"minReaderVersion\":3"))
  }

  test("second deleteDv merges the existing DV (replacement carries all " +
      "prior positions); dead rows don't re-count") {
    import spark.implicits._
    val base = freshDir("merge")
    DeltaLogWriter.write(
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), base)
    val (_, n1) = DeltaDml.deleteDv(spark, base, col("k") <= 20)
    // overlapping predicate: k <= 30 — rows 1..20 are already dead and
    // must not re-count
    val (_, n2) = DeltaDml.deleteDv(spark, base, col("k") <= 30)
    assert(n1 == 20L && n2 == 10L)
    assert(keys(base) == (31L to 100L).toSet)
    // one descriptor per file: the replacement superseded the first DV
    val (_, _, files) = DeltaLogReader.activeStateDv(spark, base)
    assert(files.size == 1 && files.head._3.isDefined)
    assert(files.head._3.get.cardinality == 30L)
  }

  test("updateDv: old versions die under a DV, new versions append; " +
      "file rewrite avoided") {
    import spark.implicits._
    val base = freshDir("upd")
    DeltaLogWriter.write(
      (1L to 100L).map(i => (i, "x", i * 1.0)).toDF("k", "tag", "score")
        .coalesce(1), base)
    def parquetFiles(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).toSet
    }
    val before = parquetFiles()
    val (v, n) = DeltaDml.updateDv(spark, base, col("k") % 10 === 0,
      Map("tag" -> lit("hit"), "score" -> (col("score") * 2)))
    assert(v == 1L && n == 10L)
    // original file untouched; only the appended update versions are new
    assert(before.subsetOf(parquetFiles()))
    val rows = DeltaLogReader.read(spark, base)
      .select("k", "tag", "score").as[(Long, String, Double)].collect()
    assert(rows.length == 100)
    rows.foreach { case (k, tag, score) =>
      if (k % 10 == 0) assert(tag == "hit" && score == k * 2.0)
      else assert(tag == "x" && score == k * 1.0)
    }
    // a second DV update over an overlapping predicate: prior DV merges,
    // already-updated rows re-match on their NEW (appended) versions
    val (_, n2) = DeltaDml.updateDv(spark, base, col("k") <= 20,
      Map("tag" -> lit("low")))
    assert(n2 == 20L)
    val tags = DeltaLogReader.read(spark, base)
      .select("k", "tag").as[(Long, String)].collect().toMap
    assert(tags.size == 100)
    (1L to 100L).foreach { k =>
      val want = if (k <= 20) "low" else if (k % 10 == 0) "hit" else "x"
      assert(tags(k) == want, s"k=$k got ${tags(k)} want $want")
    }
  }

  test("no-match deleteDv commits nothing; works across multi-file tables") {
    import spark.implicits._
    val base = freshDir("multi")
    DeltaLogWriter.write(
      (1L to 200L).map(i => (i, i % 5)).toDF("k", "g").repartition(4), base)
    val (v0, n0) = DeltaDml.deleteDv(spark, base, col("k") > 999)
    assert(v0 == 0L && n0 == 0L)
    val (_, n) = DeltaDml.deleteDv(spark, base, col("g") === 2)
    assert(n == 40L)
    assert(keys(base) == (1L to 200L).filterNot(_ % 5 == 2).toSet)
    // only files holding g==2 rows got DVs... every file does here, but
    // each carries exactly its own dead positions
    val (_, _, files) = DeltaLogReader.activeStateDv(spark, base)
    assert(files.flatMap(_._3).map(_.cardinality).sum == 40L)
  }
}
