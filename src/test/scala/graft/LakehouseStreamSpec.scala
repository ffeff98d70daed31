package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergTable, PaimonTable}

/** Streaming sources over the Iceberg and Paimon logs
  * (sources/LakehouseStreamSources.scala) — with graft-delta this is the
  * read-side triad matching the exactly-once sink triad. */
class LakehouseStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def collectBatches(format: String, path: String,
                             opts: Map[String, String] = Map.empty)
      (between: => Unit): Seq[org.apache.spark.sql.Row] = {
    val rows = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val reader = opts.foldLeft(spark.readStream.format(format)) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(path).writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }
        ()
      }.start()
    try { q.processAllAvailable(); between; q.processAllAvailable() }
    finally q.stop()
    rows.toSeq
  }

  test("graft-iceberg: snapshot then appends; replace never re-emits") {
    val dir = Files.createTempDirectory("ice_stream_").toString + "/t"
    IcebergTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir,
      SaveMode.Overwrite)
    val rows = collectBatches("graft-iceberg", dir) {
      IcebergTable.write(Seq((3L, "c")).toDF("k", "v"), dir, SaveMode.Append)
      // compaction: a replace snapshot rewrites files but adds no rows
      IcebergTable.rewriteDataFiles(spark, dir)
      IcebergTable.write(Seq((4L, "d")).toDF("k", "v"), dir, SaveMode.Append)
    }
    assert(rows.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1) ===
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("graft-iceberg: delete snapshot fails; skipChangeCommits skips") {
    val dir = Files.createTempDirectory("ice_stream_d_").toString + "/t"
    IcebergTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir,
      SaveMode.Overwrite)
    IcebergTable.deleteFrom(spark, dir,
      org.apache.spark.sql.functions.col("k") === 1L)
    val err = intercept[Exception] {
      val q = spark.readStream.format("graft-iceberg")
        .option("startingSnapshotId",
          IcebergTable.loadMeta(spark, dir).snapshots.head.snapshotId.toString)
        .load(dir).writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(err).exists(_.contains("skipChangeCommits")))

    IcebergTable.write(Seq((3L, "c")).toDF("k", "v"), dir, SaveMode.Append)
    val rows = collectBatches("graft-iceberg", dir, Map(
      "startingSnapshotId" ->
        IcebergTable.loadMeta(spark, dir).snapshots.head.snapshotId.toString,
      "skipChangeCommits" -> "true")) {}
    // the delete snapshot is skipped wholesale: (1,a) still streams from
    // its append snapshot, (3,c) follows
    assert(rows.map(_.getLong(0)).sorted === Seq(1L, 2L, 3L))
  }

  test("graft-iceberg: maxFilesPerTrigger respects the latest anchor on a fresh start") {
    val dir = Files.createTempDirectory("ice_stream_cap_").toString + "/t"
    // 4 pre-anchor snapshots; a capped fresh start with latest must NOT
    // replay them one per batch
    IcebergTable.write(Seq((1L, "a")).toDF("k", "v"), dir, SaveMode.Overwrite)
    (2L to 4L).foreach(i =>
      IcebergTable.write(Seq((i, "x")).toDF("k", "v"), dir, SaveMode.Append))
    val rows = collectBatches("graft-iceberg", dir, Map(
      "startingSnapshotId" -> "latest", "maxFilesPerTrigger" -> "1")) {
      IcebergTable.write(Seq((9L, "n")).toDF("k", "v"), dir, SaveMode.Append)
    }
    assert(rows.map(_.getLong(0)) === Seq(9L),
      s"pre-anchor history must not replay: ${rows.map(_.getLong(0))}")
  }

  test("graft-iceberg: startingSnapshotId=latest ANCHOR persists across " +
      "restart (a crashed batch replays against the ORIGINAL anchor)") {
    import graft.sources.IcebergStreamSource
    val dir = Files.createTempDirectory("ice_anchor_").toString + "/t"
    IcebergTable.write(Seq((1L, "base")).toDF("k", "v"), dir,
      SaveMode.Overwrite) // the anchor snapshot
    val meta = Files.createTempDirectory("ice_anchor_meta_").toString
    val params = Map("path" -> dir, "startingSnapshotId" -> "latest",
      "maxFilesPerTrigger" -> "1")
    new IcebergStreamSource(spark.sqlContext, params, meta) // anchors
    IcebergTable.write(Seq((2L, "v1")).toDF("k", "v"), dir, SaveMode.Append)
    IcebergTable.write(Seq((3L, "v2")).toDF("k", "v"), dir, SaveMode.Append)
    // "crash": a fresh source over the SAME metadata dir must admit
    // from the PERSISTED anchor — snapshot 2 of 3 — not re-anchor at 3
    val restarted = new IcebergStreamSource(spark.sqlContext, params, meta)
    val expected = IcebergTable.loadMeta(spark, dir).snapshots(1).snapshotId
    assert(restarted.getOffset.map(_.json) == Some(expected.toString),
      restarted.getOffset.toString)
  }

  test("graft-iceberg: startingSnapshotId initial batch = STATE at id + later appends") {
    val dir = Files.createTempDirectory("ice_stream_sid_").toString + "/t"
    IcebergTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir,
      SaveMode.Overwrite)                                     // snap 1
    IcebergTable.write(Seq((3L, "c")).toDF("k", "v"), dir, SaveMode.Append) // snap 2
    IcebergTable.write(Seq((4L, "d")).toDF("k", "v"), dir, SaveMode.Append) // snap 3
    val snap2 = IcebergTable.loadMeta(spark, dir).snapshots(1).snapshotId
    val rows = collectBatches("graft-iceberg", dir, Map(
      "startingSnapshotId" -> snap2.toString)) {}
    // the documented contract: table state AT snap2 ({1,2,3}) plus the
    // later append ({4}) — appends-only-of-[snap2..end] would lose 1,2
    assert(rows.map(_.getLong(0)).sorted === Seq(1L, 2L, 3L, 4L))
  }

  test("graft-paimon append-only: appends stream, COMPACT never re-emits") {
    val dir = Files.createTempDirectory("pai_stream_").toString + "/t"
    PaimonTable.write(Seq((1L, "a")).toDF("k", "v"), dir, SaveMode.Overwrite)
    val rows = collectBatches("graft-paimon", dir) {
      PaimonTable.write(Seq((2L, "b")).toDF("k", "v"), dir, SaveMode.Append)
      PaimonTable.compact(spark, dir)
      PaimonTable.write(Seq((3L, "c")).toDF("k", "v"), dir, SaveMode.Append)
    }
    assert(rows.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1) ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("graft-paimon PK: the CHANGELOG streams with row_kind, initial state as +I") {
    val dir = Files.createTempDirectory("pai_stream_pk_").toString + "/t"
    PaimonTable.writePk(Seq((1L, "v1"), (2L, "v1")).toDF("k", "v"), dir,
      primaryKeys = Seq("k"))
    val rows = collectBatches("graft-paimon", dir) {
      PaimonTable.writePk(Seq((2L, "v2")).toDF("k", "v"), dir,
        primaryKeys = Seq("k"), kind = "+U")
      PaimonTable.writePk(Seq((1L, "")).toDF("k", "v"), dir,
        primaryKeys = Seq("k"), kind = "-D")
    }
    val tagged = rows.map(r => (r.getString(0), r.getLong(1))).sorted
    // initial +I for both keys, then the +U and the -D change rows
    assert(tagged === Seq(("+I", 1L), ("+I", 2L), ("+U", 2L), ("-D", 1L)))
    // _snapshot_id gives the APPLY ORDER a CDC consumer needs when one
    // micro-batch spans snapshots: initial state at 1, then 2, then 3
    val bySnap = rows.map(r => (r.getString(0),
        r.getLong(r.fieldIndex("_snapshot_id")))).sorted
    assert(bySnap === Seq(("+I", 1L), ("+I", 1L), ("+U", 2L), ("-D", 3L)))
  }
}
