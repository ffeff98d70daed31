package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeltaLogWriter

/** Streaming SOURCE over the Delta log (sources/DeltaStreamSource.scala):
  * readStream.format("graft-delta") — initial snapshot, per-commit
  * appends, change-commit refusal/skip, checkpoint-exact restarts. */
class DeltaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("delta_stream_").toString
    DeltaLogWriter.write(rows.toDF("k", "v"), dir, SaveMode.Append)
    dir
  }

  private def runBatches(path: String, opts: Map[String, String] = Map.empty)
      (between: Int => Unit): Map[Int, Seq[(Long, String)]] = {
    val collected = scala.collection.mutable.Map[Int, Seq[(Long, String)]]()
    val reader = opts.foldLeft(spark.readStream.format("graft-delta")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(path).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        collected.synchronized {
          collected(id.toInt) =
            df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      between(0)
      q.processAllAvailable()
    } finally q.stop()
    collected.toMap
  }

  test("initial snapshot then per-commit appends") {
    val dir = freshTable(Seq((1L, "a"), (2L, "b")))
    val out = runBatches(dir) { _ =>
      DeltaLogWriter.write(Seq((3L, "c")).toDF("k", "v"), dir)
      DeltaLogWriter.write(Seq((4L, "d")).toDF("k", "v"), dir)
    }
    val all = out.values.flatten.toSeq.sortBy(_._1)
    assert(all === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // the snapshot batch carried exactly the pre-stream state
    assert(out(0).map(_._1).sorted === Seq(1L, 2L))
  }

  test("PARTITIONED table streams with log-recorded partition values " +
      "(they live in the log, not the data files; null value stays null)") {
    import graft.sources.DeltaLogReader
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val dir = Files.createTempDirectory("delta_stream_part_").toString
    val df1 = Seq((1L, "a")).toDF("k", "v")
    val sz1 = DeltaLogReader.writeDataFile(df1, dir, "f1.parquet")
    val full = StructType(df1.schema.fields :+ StructField("p", StringType))
    DeltaLogReader.writeCommit(spark, dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      DeltaLogReader.metaDataAction(full, Seq("p")),
      s"""{"add":{"path":"f1.parquet","partitionValues":{"p":"p0"},"size":$sz1,"modificationTime":1,"dataChange":true}}"""))
    val collected =
      scala.collection.mutable.Map[Int, Seq[(Long, String, String)]]()
    val q = spark.readStream.format("graft-delta").load(dir).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        collected.synchronized {
          collected(id.toInt) = df.collect().map(r =>
            (r.getLong(0), r.getString(1),
              if (r.isNullAt(2)) null else r.getString(2))).toSeq
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      // incremental commit: two files in DIFFERENT partitions, one with
      // a NULL partition value (NullNode must not become the string
      // "null")
      val sz2 = DeltaLogReader.writeDataFile(
        Seq((2L, "b")).toDF("k", "v"), dir, "f2.parquet")
      val sz3 = DeltaLogReader.writeDataFile(
        Seq((3L, "c")).toDF("k", "v"), dir, "f3.parquet")
      DeltaLogReader.writeCommit(spark, dir, 1, Seq(
        s"""{"add":{"path":"f2.parquet","partitionValues":{"p":"p1"},"size":$sz2,"modificationTime":2,"dataChange":true}}""",
        s"""{"add":{"path":"f3.parquet","partitionValues":{"p":null},"size":$sz3,"modificationTime":3,"dataChange":true}}"""))
      q.processAllAvailable()
    } finally q.stop()
    val all = collected.values.flatten.toSeq.sortBy(_._1)
    assert(all == Seq((1L, "a", "p0"), (2L, "b", "p1"), (3L, "c", null)),
      all)
  }

  test("partition column declared FIRST in the schema binds positionally " +
      "(V1 batches bind by position — the reorder must match the " +
      "declared source schema)") {
    import graft.sources.DeltaLogReader
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val dir = Files.createTempDirectory("delta_stream_pfirst_").toString
    val df1 = Seq((1L, "a")).toDF("k", "v")
    val sz1 = DeltaLogReader.writeDataFile(df1, dir, "f1.parquet")
    // declared order: (p, k, v) — partition column NOT last
    val full = StructType(StructField("p", StringType) +: df1.schema.fields)
    DeltaLogReader.writeCommit(spark, dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      DeltaLogReader.metaDataAction(full, Seq("p")),
      s"""{"add":{"path":"f1.parquet","partitionValues":{"p":"px"},"size":$sz1,"modificationTime":1,"dataChange":true}}"""))
    val collected =
      scala.collection.mutable.Map[Int, Seq[(String, Long, String)]]()
    val q = spark.readStream.format("graft-delta").load(dir).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        collected.synchronized {
          collected(id.toInt) = df.collect().map(r =>
            (r.getString(0), r.getLong(1), r.getString(2))).toSeq
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(collected.values.flatten.toSeq == Seq(("px", 1L, "a")),
      collected.toMap)
  }

  test("startingVersion=latest streams only post-start appends") {
    val dir = freshTable(Seq((1L, "old")))
    val out = runBatches(dir, Map("startingVersion" -> "latest")) { _ =>
      DeltaLogWriter.write(Seq((2L, "new")).toDF("k", "v"), dir)
    }
    assert(out.values.flatten.toSeq === Seq((2L, "new")))
  }

  test("startingVersion=latest ANCHOR persists across restart — a " +
      "crashed first batch replays against the ORIGINAL anchor, not a " +
      "re-resolved one (which silently dropped its commits)") {
    import graft.sources.DeltaStreamSource
    val dir = freshTable(Seq((1L, "base"))) // version 0 = the anchor
    val meta = Files.createTempDirectory("delta_anchor_meta_").toString
    val params = Map("path" -> dir, "startingVersion" -> "latest",
      "maxFilesPerTrigger" -> "1")
    // stream starts: anchor resolves (and persists) at version 0
    new DeltaStreamSource(spark.sqlContext, params, meta)
    // commits land, then the process "crashes" — a fresh source with
    // the SAME metadata dir must admit from the PERSISTED anchor
    DeltaLogWriter.write(Seq((2L, "v1")).toDF("k", "v"), dir)
    DeltaLogWriter.write(Seq((3L, "v2")).toDF("k", "v"), dir)
    val restarted = new DeltaStreamSource(spark.sqlContext, params, meta)
    // anchored at 0 with budget 1 → admits exactly version 1; a
    // re-resolved anchor would report 2 and never emit versions 1-2
    assert(restarted.getOffset.map(_.json) == Some("1"),
      restarted.getOffset.toString)
  }

  test("CAPPED startingVersion=latest never replays pre-anchor history") {
    // several pre-stream versions, then a capped stream from `latest`:
    // the admission budget must start counting at the anchor — it used
    // to start at -1, so once the first (empty) batch committed, the
    // whole pre-anchor history streamed out one budget-window at a time
    val dir = freshTable(Seq((1L, "old1")))
    DeltaLogWriter.write(Seq((2L, "old2")).toDF("k", "v"), dir)
    DeltaLogWriter.write(Seq((3L, "old3")).toDF("k", "v"), dir)
    val out = runBatches(dir,
      Map("startingVersion" -> "latest", "maxFilesPerTrigger" -> "1")) { _ =>
      DeltaLogWriter.write(Seq((4L, "new")).toDF("k", "v"), dir)
    }
    assert(out.values.flatten.toSeq === Seq((4L, "new")),
      s"pre-anchor rows leaked: ${out.values.flatten.toSeq}")
  }

  test("a data-removing commit fails the stream; skipChangeCommits skips it") {
    val dir = freshTable(Seq((1L, "a")))
    DeltaLogWriter.write(Seq((9L, "ow")).toDF("k", "v"), dir, SaveMode.Overwrite)
    val err = intercept[Exception] {
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "0").load(dir)
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(Option(err.getMessage).getOrElse(err.getCause.getMessage)
      .contains("skipChangeCommits") ||
      err.getCause != null &&
        err.getCause.getMessage.contains("skipChangeCommits"))

    // skip posture: the overwrite commit vanishes, later appends stream
    DeltaLogWriter.write(Seq((3L, "after")).toDF("k", "v"), dir)
    val out = runBatches(dir,
      Map("startingVersion" -> "0", "skipChangeCommits" -> "true")) { _ => () }
    assert(out.values.flatten.toSeq.sortBy(_._1) ===
      Seq((1L, "a"), (3L, "after")))
  }

  test("checkpointed restart resumes at the committed version (exactly-once)") {
    val dir = freshTable(Seq((1L, "a")))
    val ckpt = Files.createTempDirectory("delta_stream_ck_").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    def start() = spark.readStream.format("graft-delta").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.collect()
          .map(r => (r.getLong(0), r.getString(1))) }
        ()
      }.start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(seen.toSeq === Seq((1L, "a")))
    DeltaLogWriter.write(Seq((2L, "b")).toDF("k", "v"), dir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // no re-emission of the initial snapshot, only the new commit
    assert(seen.toSeq.sortBy(_._1) === Seq((1L, "a"), (2L, "b")))
  }

  test("maxFilesPerTrigger paces catch-up into multiple batches") {
    val dir = freshTable(Seq((1L, "a")))
    (2L to 5L).foreach(i =>
      DeltaLogWriter.write(Seq((i, s"v$i")).toDF("k", "v"), dir))
    val batches = scala.collection.mutable.ArrayBuffer[Int]()
    val q = spark.readStream.format("graft-delta")
      .option("startingVersion", "0").option("maxFilesPerTrigger", "2")
      .load(dir).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count().toInt }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // 5 single-file commits at 2 files/trigger: at least 3 batches, all
    // rows exactly once, no batch over budget
    assert(batches.sum === 5)
    assert(batches.count(_ > 0) >= 3)
    assert(batches.forall(_ <= 2))
  }

  test("dataChange=false compaction commits do not re-emit (OPTIMIZE-safe)") {
    val dir = freshTable(Seq((1L, "a"), (2L, "b")))
    DeltaLogWriter.write(Seq((3L, "c")).toDF("k", "v"), dir)
    val out = runBatches(dir) { _ =>
      DeltaLogWriter.optimize(spark, dir)
      DeltaLogWriter.write(Seq((4L, "d")).toDF("k", "v"), dir)
    }
    val all = out.values.flatten.toSeq.sortBy(_._1)
    assert(all === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("readChangeFeed: snapshot as inserts, DML commits stream row-exact") {
    val dir = freshTable(Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val collected =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        collected.synchronized {
          collected ++= df.collect().map(r =>
            (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      // a DML delete with CDF on: the change commit does NOT fail the
      // stream — it emits the exact deleted row
      spark.conf.set("graft.delta.cdf", "true")
      try graft.sources.DeltaDml.delete(spark, dir,
        org.apache.spark.sql.functions.col("k") === 2L)
      finally spark.conf.unset("graft.delta.cdf")
      DeltaLogWriter.write(Seq((4L, "d")).toDF("k", "v"), dir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = collected.toSeq
    assert(rows.filter(_._4 == 0L).map(x => (x._1, x._3)).sorted ==
      Seq((1L, "insert"), (2L, "insert"), (3L, "insert")))
    assert(rows.filter(_._4 == 1L) == Seq((2L, "b", "delete", 1L)))
    assert(rows.filter(_._4 == 2L) == Seq((4L, "d", "insert", 2L)))
  }

  test("admission control never regresses across a restart (persisted " +
      "progress in the checkpoint metadata dir)") {
    import graft.sources.DeltaStreamSource
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val dir = freshTable(Seq((1L, "a")))
    (2L to 6L).foreach(i =>
      DeltaLogWriter.write(Seq((i, s"v$i")).toDF("k", "v"), dir))
    val metaDir = Files.createTempDirectory("delta_stream_meta_").toString
    val params = Map("path" -> dir, "maxFilesPerTrigger" -> "2",
      "startingVersion" -> "0")
    val s1 = new DeltaStreamSource(spark.sqlContext, params, metaDir)
    // engine committed through version 4 before stopping
    s1.commit(LongOffset(4L))
    // a RESTARTED source (fresh instance, same checkpoint metadata dir)
    // must resume the admission count from the persisted offset — an
    // in-memory-only tracker would return an offset below 4 and regress
    // the engine's checkpoint, re-emitting versions 0-4
    val s2 = new DeltaStreamSource(spark.sqlContext, params, metaDir)
    val off = s2.getOffset.get.asInstanceOf[LongOffset].offset
    assert(off >= 4L, s"restarted source offered offset $off < committed 4")
    assert(off <= 5L + 1L) // still budget-capped going forward
  }
}
