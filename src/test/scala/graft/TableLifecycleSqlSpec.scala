package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeltaDml, DeltaLogReader, DeltaLogWriter,
  IcebergTable, PaimonTable}

/** SQL time travel (`VERSION|TIMESTAMP AS OF` over dfs lakehouse
  * tables), VACUUM and RESTORE — the table-lifecycle SQL surface. */
class TableLifecycleSqlSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val base = s"/tmp/graft_test/lc_$name"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    base
  }

  private def withWs[A](body: => A): A = {
    spark.conf.set("graft.dfs.workspace.lc", "/tmp/graft_test")
    try body finally spark.conf.unset("graft.dfs.workspace.lc")
  }

  test("SQL time travel: VERSION AS OF on all three formats") {
    import spark.implicits._
    val delta = freshDir("ttd")
    DeltaLogWriter.write(Seq((1L, "a")).toDF("k", "v"), delta)
    DeltaLogWriter.write(Seq((2L, "b")).toDF("k", "v"), delta)
    val ice = freshDir("tti")
    IcebergTable.write(Seq((1L, "a")).toDF("k", "v"), ice)
    IcebergTable.write(Seq((2L, "b")).toDF("k", "v"), ice)
    val pk = freshDir("ttp")
    PaimonTable.writePk(Seq((1L, "a")).toDF("k", "v"), pk, Seq("k"))
    PaimonTable.writePk(Seq((1L, "A2")).toDF("k", "v"), pk, Seq("k"))
    withWs {
      assert(spark.sql("SELECT * FROM dfs.lc.`lc_ttd` VERSION AS OF 0")
        .count() == 1)
      assert(spark.sql("SELECT * FROM dfs.lc.`lc_ttd`").count() == 2)
      assert(spark.sql("SELECT * FROM dfs.lc.`lc_tti` VERSION AS OF 1")
        .count() == 1)
      assert(spark.sql(
        "SELECT v FROM dfs.lc.`lc_ttp` VERSION AS OF 1 WHERE k = 1")
        .collect()(0).getString(0) == "a")
      assert(spark.sql("SELECT v FROM dfs.lc.`lc_ttp` WHERE k = 1")
        .collect()(0).getString(0) == "A2")
      // TIMESTAMP AS OF far in the future = current state
      assert(spark.sql(
        "SELECT * FROM dfs.lc.`lc_tti` TIMESTAMP AS OF '2099-01-01'")
        .count() == 2)
      // a plain path refuses clearly
      val plain = freshDir("ttplain")
      Seq((1, "x")).toDF("a", "b").write.parquet(plain)
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM dfs.lc.`lc_ttplain` VERSION AS OF 0")
          .collect()
      }
      assert(e.getMessage.contains("versioned table"))
    }
  }

  test("VACUUM reclaims rewritten files; live reads + recent retained") {
    import spark.implicits._
    val base = freshDir("vac")
    DeltaLogWriter.write((1L to 6L).map(i => (i, s"r$i")).toDF("k", "v"),
      base)
    // rewrite everything: DELETE half (copy-on-write leaves dead files)
    DeltaDml.delete(spark, base, org.apache.spark.sql.functions.col("k") <= 3L)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetCount = fs.listStatus(new org.apache.hadoop.fs.Path(base))
      .count(s => s.getPath.getName.endsWith(".parquet"))
    val before = parquetCount
    withWs {
      // default retention (7 days): nothing is old enough to delete
      val kept = spark.sql("VACUUM dfs.lc.`lc_vac`").collect()(0)
      assert(kept.getString(1).startsWith("0 files"))
      assert(parquetCount == before)
      // RETAIN 0 HOURS: dead pre-rewrite files go
      val r = spark.sql("VACUUM dfs.lc.`lc_vac` RETAIN 0 HOURS").collect()(0)
      assert(r.getBoolean(0))
      val deleted = r.getString(1).split(" ")(0).toLong
      assert(deleted > 0 && parquetCount == before - deleted)
    }
    // current state unaffected
    assert(DeltaLogReader.read(spark, base).collect()
      .map(_.getLong(0)).toSet == Set(4L, 5L, 6L))
    // time travel to the vacuumed version now fails (delta semantics)
    intercept[Exception] {
      DeltaLogReader.read(spark, base, Some(0L)).collect()
    }
  }

  test("RESTORE flips the file set back; history stays travelable") {
    import spark.implicits._
    val base = freshDir("res")
    DeltaLogWriter.write((1L to 4L).map(i => (i, s"r$i")).toDF("k", "v"),
      base)                                                       // v0
    DeltaDml.update(spark, base,
      org.apache.spark.sql.functions.col("k") <= 2L,
      Map("v" -> org.apache.spark.sql.functions.lit("X")))        // v1
    DeltaLogWriter.write(Seq((9L, "new")).toDF("k", "v"), base)   // v2
    withWs {
      val r = spark.sql(
        "RESTORE TABLE dfs.lc.`lc_res` TO VERSION AS OF 0").collect()(0)
      assert(r.getBoolean(0) && r.getString(1).contains("version 0"))
    }
    assert(DeltaLogReader.read(spark, base).collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet ==
      (1L to 4L).map(i => (i, s"r$i")).toSet)
    // the restore is v3; v2 (pre-restore) still serves its state
    assert(DeltaLogReader.tableVersions(spark, base).max == 3L)
    assert(DeltaLogReader.read(spark, base, Some(2L)).count() == 5)
    // beyond-current refuses
    val e = intercept[Exception] {
      withWs {
        spark.sql("RESTORE TABLE dfs.lc.`lc_res` TO VERSION AS OF 99")
      }
    }
    assert(e.getMessage.contains("not in log"))
  }

  test("RESTORE routes to iceberg/paimon rollback_to_snapshot") {
    import spark.implicits._
    val ice = freshDir("rbi")
    IcebergTable.write(Seq((1L, "a")).toDF("k", "v"), ice)    // snap 1
    IcebergTable.write(Seq((2L, "b")).toDF("k", "v"), ice)    // snap 2
    val pk = freshDir("rbp")
    PaimonTable.writePk(Seq((1L, "a")).toDF("k", "v"), pk, Seq("k"))
    PaimonTable.writePk(Seq((1L, "A2"), (2L, "b")).toDF("k", "v"), pk,
      Seq("k"))
    withWs {
      val r = spark.sql(
        "RESTORE TABLE dfs.lc.`lc_rbi` TO VERSION AS OF 1").collect()(0)
      assert(r.getString(1).contains("rollback_to_snapshot"))
      assert(IcebergTable.read(spark, ice).collect()
        .map(_.getLong(0)).toSet == Set(1L))
      // the abandoned snapshot stays travelable (iceberg semantics)
      assert(IcebergTable.read(spark, ice, snapshotId = Some(2L))
        .count() == 2)
      // appends after a rollback continue from the rolled-back state
      IcebergTable.write(Seq((3L, "c")).toDF("k", "v"), ice)
      assert(IcebergTable.read(spark, ice).collect()
        .map(_.getLong(0)).toSet == Set(1L, 3L))

      val p = spark.sql(
        "RESTORE TABLE dfs.lc.`lc_rbp` TO VERSION AS OF 1").collect()(0)
      assert(p.getString(1).contains("paimon rollback"))
      assert(PaimonTable.read(spark, pk).collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet == Set(1L -> "a"))
      // unknown snapshot refuses
      val e = intercept[Exception] {
        spark.sql("RESTORE TABLE dfs.lc.`lc_rbp` TO VERSION AS OF 42")
      }
      assert(e.getMessage.contains("not in"))
    }
  }
}
