package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KafkaSegmentReader

/** Streaming SOURCE over Kafka log segments
  * (sources/KafkaStreamSource.scala): readStream.format("graft-kafka") —
  * per-partition offset maps, earliest/latest anchors, checkpoint-exact
  * restarts, maxOffsetsPerTrigger pacing, new-partition admission. */
class KafkaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** One batch of `n` records (k0..k(n-1) / topic:v<base+i>) based at
    * `base`, written as a segment file named by `segBase`. */
  private def append(dir: String, topic: String, part: Int, base: Long,
                     n: Int, segBase: Long): Unit = {
    val recs = (0 until n).map(i =>
      (b(s"k${base + i}"), b(s"$topic:v${base + i}"),
        Seq.empty[(String, Array[Byte])], i.toLong))
    KafkaSegmentReader.writeSegment(spark, dir, topic, part,
      Seq(KafkaSegmentReader.batchBytes(base, 1000L + base, recs)),
      segmentBase = segBase)
  }

  private def collectBatches(dir: String, opts: Map[String, String],
                             checkpoint: String)
      (between: Int => Unit): Map[Int, Seq[(String, Int, Long, String)]] = {
    val collected =
      scala.collection.mutable.Map[Int, Seq[(String, Int, Long, String)]]()
    val reader = opts.foldLeft(spark.readStream.format("graft-kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(dir).writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        collected.synchronized {
          collected(id.toInt) = df.collect().map(r =>
            (r.getString(0), r.getInt(1), r.getLong(2),
              new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).toSeq
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

  test("earliest: existing segments stream, appended segments follow, " +
      "offsets and partitions decode") {
    val dir = Files.createTempDirectory("kstream_").toString
    val cp = Files.createTempDirectory("kstream_cp_").toString
    append(dir, "events", 0, base = 0L, n = 3, segBase = 0L)
    append(dir, "events", 1, base = 0L, n = 2, segBase = 0L)
    val out = collectBatches(dir,
      Map("startingOffsets" -> "earliest"), cp) { _ =>
      append(dir, "events", 0, base = 3L, n = 2, segBase = 3L)
    }
    val all = out.values.flatten.toSeq.sorted
    assert(all === Seq(
      ("events", 0, 0L, "events:v0"), ("events", 0, 1L, "events:v1"),
      ("events", 0, 2L, "events:v2"), ("events", 0, 3L, "events:v3"),
      ("events", 0, 4L, "events:v4"),
      ("events", 1, 0L, "events:v0"), ("events", 1, 1L, "events:v1")))
    // the pre-stream state came in the initial batch, the append later
    assert(out(0).size === 5)
  }

  test("latest: pre-stream records are NOT emitted, appends are; a " +
      "restart on the same checkpoint re-emits nothing (anchor persists)") {
    val dir = Files.createTempDirectory("kstream_latest_").toString
    val cp = Files.createTempDirectory("kstream_latest_cp_").toString
    append(dir, "t", 0, base = 0L, n = 4, segBase = 0L)
    val out = collectBatches(dir, Map.empty, cp) { _ =>
      append(dir, "t", 0, base = 4L, n = 2, segBase = 4L)
    }
    val all = out.values.flatten.toSeq.sorted
    assert(all === Seq(("t", 0, 4L, "t:v4"), ("t", 0, 5L, "t:v5")))
    // restart on the SAME checkpoint: nothing new → nothing re-emitted;
    // then a fresh append streams from where the first run left off
    val out2 = collectBatches(dir, Map.empty, cp) { _ =>
      append(dir, "t", 0, base = 6L, n = 1, segBase = 6L)
    }
    assert(out2.values.flatten.toSeq.sorted === Seq(("t", 0, 6L, "t:v6")))
  }

  test("maxOffsetsPerTrigger paces a backlog over several batches, " +
      "prorated across partitions, with no loss and no duplicates") {
    val dir = Files.createTempDirectory("kstream_paced_").toString
    val cp = Files.createTempDirectory("kstream_paced_cp_").toString
    append(dir, "big", 0, base = 0L, n = 8, segBase = 0L)
    append(dir, "big", 1, base = 0L, n = 4, segBase = 0L)
    val out = collectBatches(dir, Map(
      "startingOffsets" -> "earliest", "maxOffsetsPerTrigger" -> "3"), cp) {
      _ => ()
    }
    val all = out.values.flatten.toSeq
    assert(all.size === 12)
    assert(all.distinct.size === 12)
    // 12 records at <=3/trigger is at least 4 batches, and every batch
    // respects the cap
    assert(out.size >= 4)
    assert(out.values.forall(_.size <= 3))
    // proration: the first batch draws from BOTH lagging partitions
    assert(out(0).map(_._2).toSet === Set(0, 1))
  }

  test("a partition appearing AFTER launch streams from its earliest " +
      "offset even under startingOffsets=latest") {
    val dir = Files.createTempDirectory("kstream_newpart_").toString
    val cp = Files.createTempDirectory("kstream_newpart_cp_").toString
    append(dir, "n", 0, base = 0L, n = 2, segBase = 0L)
    val out = collectBatches(dir, Map.empty, cp) { _ =>
      append(dir, "n", 1, base = 0L, n = 2, segBase = 0L)
    }
    assert(out.values.flatten.toSeq.sorted ===
      Seq(("n", 1, 0L, "n:v0"), ("n", 1, 1L, "n:v1")))
  }

  test("topics option restricts the subscribe list") {
    val dir = Files.createTempDirectory("kstream_topics_").toString
    val cp = Files.createTempDirectory("kstream_topics_cp_").toString
    append(dir, "keep", 0, base = 0L, n = 2, segBase = 0L)
    append(dir, "drop", 0, base = 0L, n = 2, segBase = 0L)
    val out = collectBatches(dir,
      Map("startingOffsets" -> "earliest", "topics" -> "keep"), cp)(_ => ())
    assert(out.values.flatten.map(_._1).toSet === Set("keep"))
    assert(out.values.flatten.size === 2)
  }

  test("active-segment realities: a partial in-flight tail frame never " +
      "crashes or admits, and appends inside a PREALLOCATED zero-padded " +
      "segment (constant file length) still advance the watermark") {
    val dir = Files.createTempDirectory("kstream_tail_").toString
    val cp = Files.createTempDirectory("kstream_tail_cp_").toString
    def rec(i: Long) = (b(s"k$i"), b(s"p:v$i"),
      Seq.empty[(String, Array[Byte])], 0L)
    val b1 = KafkaSegmentReader.batchBytes(0L, 1000L, Seq(rec(0), rec(1)))
    val b2 = KafkaSegmentReader.batchBytes(2L, 1002L, Seq(rec(2)))
    val b3 = KafkaSegmentReader.batchBytes(3L, 1003L, Seq(rec(3)))
    val segDir = new java.io.File(s"$dir/p-0"); segDir.mkdirs()
    val seg = new java.io.File(segDir, "0" * 20 + ".log")
    val total = b1.length + b2.length + b3.length + 64
    def writeState(parts: Array[Byte]*): Unit = {
      // constant-length file: payload + zero padding (log.preallocate)
      val buf = new Array[Byte](total)
      var off = 0
      parts.foreach { p => System.arraycopy(p, 0, buf, off, p.length); off += p.length }
      val os = new java.io.FileOutputStream(seg)
      try os.write(buf) finally os.close()
    }
    // state 1: batch1 complete + the first 20 bytes of batch2 in flight
    writeState(b1, b2.take(20))
    val collected = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = spark.readStream.format("graft-kafka")
      .option("startingOffsets", "earliest").load(dir).writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        collected.synchronized {
          collected ++= df.collect().map(r => (r.getLong(2),
            new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(collected.sorted.toSeq === Seq((0L, "p:v0"), (1L, "p:v1")))
      // state 2: batch2 completes IN PLACE — file length unchanged
      writeState(b1, b2)
      q.processAllAvailable()
      assert(collected.sorted.toSeq ===
        Seq((0L, "p:v0"), (1L, "p:v1"), (2L, "p:v2")))
      // state 3: batch3 lands after it, still constant length
      writeState(b1, b2, b3)
      q.processAllAvailable()
      assert(collected.sorted.toSeq ===
        Seq((0L, "p:v0"), (1L, "p:v1"), (2L, "p:v2"), (3L, "p:v3")))
    } finally q.stop()
  }

  test("a corrupt frame in a CLOSED segment fails LOUDLY (strict decode " +
      "+ strict watermark walk) instead of silently truncating") {
    val dir = Files.createTempDirectory("kstream_corrupt_").toString
    val cp = Files.createTempDirectory("kstream_corrupt_cp_").toString
    // closed segment 0 (two batches, the second CRC-flipped) + a newer
    // active segment so segment 0 is in the closed regime
    val b1 = KafkaSegmentReader.batchBytes(0L, 1000L,
      Seq((b("k0"), b("v0"), Nil, 0L)))
    val b2 = KafkaSegmentReader.batchBytes(1L, 1001L,
      Seq((b("k1"), b("v1"), Nil, 0L)))
    b2(30) = (b2(30) ^ 0x7).toByte // flip payload bits: CRC now wrong
    val segDir = new java.io.File(s"$dir/c-0"); segDir.mkdirs()
    val os = new java.io.FileOutputStream(new java.io.File(segDir, "0" * 20 + ".log"))
    try { os.write(b1); os.write(b2) } finally os.close()
    append(dir, "c", 0, base = 2L, n = 1, segBase = 2L)
    val q = spark.readStream.format("graft-kafka")
      .option("startingOffsets", "earliest").load(dir).writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count() // force execution — an un-acted-on frame decodes nothing
        ()
      }
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("CRC mismatch"))
  }

  test("startingTimestamp: record-exact offsetsForTimes anchoring; no " +
      "match means start-at-end; JSON startingOffsets map with kafka " +
      "sentinels") {
    val dir = Files.createTempDirectory("kstream_ts_").toString
    def recs(vals: Seq[Long]) = vals.zipWithIndex.map { case (v, i) =>
      (b(s"k$v"), b(s"ts:v$v"), Seq.empty[(String, Array[Byte])], i.toLong) }
    // batch 1: offsets 0-2 at ts 1000,1001,1002; batch 2: 3-4 at 2000,2001
    KafkaSegmentReader.writeSegment(spark, dir, "ts", 0, Seq(
      KafkaSegmentReader.batchBytes(0L, 1000L, recs(Seq(0, 1, 2))),
      KafkaSegmentReader.batchBytes(3L, 2000L, recs(Seq(3, 4)))))
    def run(opts: Map[String, String])(between: => Unit = ()): Seq[Long] = {
      val cp = Files.createTempDirectory("kstream_ts_cp_").toString
      val got = scala.collection.mutable.ArrayBuffer[Long]()
      val reader = opts.foldLeft(spark.readStream.format("graft-kafka")) {
        case (r, (k, v)) => r.option(k, v) }
      val q = reader.load(dir).writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= df.collect().map(_.getLong(2)) }
          ()
        }.start()
      try { q.processAllAvailable(); between; q.processAllAvailable() }
      finally q.stop()
      got.sorted.toSeq
    }
    // mid-batch timestamp: ts=1002 is record offset 2, not batch base 0
    assert(run(Map("startingTimestamp" -> "1002"))() === Seq(2L, 3L, 4L))
    // between the batches: first record of batch 2
    assert(run(Map("startingTimestamp" -> "1500"))() === Seq(3L, 4L))
    // beyond every record: start at end (kafka's no-match rule) — only
    // post-launch appends stream
    assert(run(Map("startingTimestamp" -> "9999")) {
      KafkaSegmentReader.writeSegment(spark, dir, "ts", 0, Seq(
        KafkaSegmentReader.batchBytes(5L, 9000L, recs(Seq(5)))),
        segmentBase = 5L)
    } === Seq(5L))
    // explicit per-partition JSON start map
    assert(run(Map("startingOffsets" -> """{"ts-0": 4}"""))() === Seq(4L, 5L))
    // kafka sentinel -2 = earliest
    assert(run(Map("startingOffsets" -> """{"ts-0": -2}"""))() ===
      Seq(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("end-to-end pipeline: kafka segments -> JSON decode -> streaming " +
      "dedup at ingest -> exactly-once Delta ingest, across a restart") {
    import org.apache.spark.sql.functions.{col, from_json}
    import org.apache.spark.sql.types.StructType
    import spark.implicits._
    val dir = Files.createTempDirectory("kstream_e2e_").toString
    val cp = Files.createTempDirectory("kstream_e2e_cp_").toString
    val table = Files.createTempDirectory("kstream_e2e_tbl_").toString
    def jrec(id: Long, text: String) =
      (b(id.toString), b(s"""{"id":$id,"text":"$text"}"""),
        Seq.empty[(String, Array[Byte])], id)
    KafkaSegmentReader.writeSegment(spark, dir, "docs", 0, Seq(
      KafkaSegmentReader.batchBytes(0L, 1700000000000L, Seq(
        jrec(0L, "alpha words here"),
        jrec(1L, "boilerplate banner"),
        jrec(2L, "boilerplate banner")))), segmentBase = 0L)
    def runOnce(): Unit = {
      val raw = spark.readStream.format("graft-kafka")
        .option("startingOffsets", "earliest").load(dir)
      val parsed = raw.select(
          from_json(col("value").cast("string"),
            StructType.fromDDL("id LONG, text STRING")).as("j"),
          col("timestamp").as("ts"))
        .select(col("j.id").as("id"), col("j.text").as("text"), col("ts"))
      val deduped = graft.streaming.Events
        .dedupStream(parsed, "text", "10 minutes")
        .select("id", "text")
      val q = graft.streaming.Events.deltaSink(deduped, table, cp,
        appId = "kafka-e2e")
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val round1 = graft.sources.DeltaLogReader.read(spark, table)
      .as[(Long, String)].collect().toSet
    assert(round1 === Set((0L, "alpha words here"), (1L, "boilerplate banner")))
    // more records land (one a dup of state the RESTARTED query must
    // still remember), then the pipeline restarts on the same checkpoint
    KafkaSegmentReader.writeSegment(spark, dir, "docs", 0, Seq(
      KafkaSegmentReader.batchBytes(3L, 1700000000050L, Seq(
        jrec(3L, "boilerplate banner"),
        jrec(4L, "fresh closing words")))), segmentBase = 3L)
    runOnce()
    val round2 = graft.sources.DeltaLogReader.read(spark, table)
      .as[(Long, String)].collect().toSeq
    // the dup dropped via restored dedup state, the replayed batch
    // skipped via the Delta txn action, the fresh row landed once
    assert(round2.sorted === Seq((0L, "alpha words here"),
      (1L, "boilerplate banner"), (4L, "fresh closing words")))
  }

  test("cold-start planning I/O: a backlog of CLOSED segments plans from " +
      "the file listing alone — endOffsets derives closed ends from each " +
      "successor's base-offset name and opens ONLY the active segment; " +
      "decoded rows are unchanged") {
    val dir = Files.createTempDirectory("kstream_count_").toString
    // 5 closed segments + 1 active, 3 records each → end offset 18
    (0 until 6).foreach(i =>
      append(dir, "bk", 0, base = i * 3L, n = 3, segBase = i * 3L))
    spark.sparkContext.hadoopConfiguration.set("fs.countfs.impl",
      classOf[CountingFileSystem].getName)
    val src = new graft.sources.KafkaStreamSource(spark.sqlContext,
      Map("path" -> s"countfs://$dir", "startingOffsets" -> "earliest"))
    CountingFileSystem.reset()
    val off = src.getOffset
    assert(off.map(_.json) === Some("""{"bk-0":18}"""))
    val openedAtPlan = CountingFileSystem.openedPaths
    assert(openedAtPlan.nonEmpty) // the active segment's watermark walk
    assert(openedAtPlan.distinct ===
      Seq(s"$dir/bk-0/${"0" * 18}15.log"))
    // steady state: nothing grew, the second trigger opens NOTHING
    CountingFileSystem.reset()
    assert(src.getOffset.map(_.json) === Some("""{"bk-0":18}"""))
    assert(CountingFileSystem.openedPaths === Seq.empty)
    // the admitted range decodes to exactly the planted records
    val cp = Files.createTempDirectory("kstream_count_cp_").toString
    val out = collectBatches(dir,
      Map("startingOffsets" -> "earliest"), cp)(_ => ())
    val all = out.values.flatten.toSeq.sorted
    assert(all === (0 until 18).map(i =>
      ("bk", 0, i.toLong, s"bk:v$i")))
  }

  test("tolerant decode is NOT silent truncation: a corrupt frame MID " +
      "active segment (complete frames after it) fails loudly; only a " +
      "true in-flight tail is swallowed") {
    val dir = Files.createTempDirectory("kstream_midcorrupt_").toString
    val cp = Files.createTempDirectory("kstream_midcorrupt_cp_").toString
    val b1 = KafkaSegmentReader.batchBytes(0L, 1000L,
      Seq((b("k0"), b("v0"), Nil, 0L)))
    val b2 = KafkaSegmentReader.batchBytes(1L, 1001L,
      Seq((b("k1"), b("v1"), Nil, 0L)))
    val b3 = KafkaSegmentReader.batchBytes(2L, 1002L,
      Seq((b("k2"), b("v2"), Nil, 0L)))
    b2(30) = (b2(30) ^ 0x7).toByte // payload bits flipped: CRC wrong
    // ONE segment (the active one → tolerant decode) with the corrupt
    // frame in the MIDDLE — the watermark walk frames through it and
    // admits offset 3, so a decode that stops at frame 1 would lose
    // offset 2 silently inside the admitted range
    val segDir = new java.io.File(s"$dir/m-0"); segDir.mkdirs()
    val os = new java.io.FileOutputStream(
      new java.io.File(segDir, "0" * 20 + ".log"))
    try { os.write(b1); os.write(b2); os.write(b3) } finally os.close()
    val q = spark.readStream.format("graft-kafka")
      .option("startingOffsets", "earliest").load(dir).writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count(); ()
      }.start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("complete frames after it"))
  }

  test("a corrupt frame followed by an IN-FLIGHT (complete but " +
      "CRC-invalid) frame fails loudly — any complete successor proves " +
      "the invalid frame was fully written, CRC-valid or not") {
    val dir = Files.createTempDirectory("kstream_corrupt2_").toString
    val cp = Files.createTempDirectory("kstream_corrupt2_cp_").toString
    val b1 = KafkaSegmentReader.batchBytes(0L, 1000L,
      Seq((b("k0"), b("v0"), Nil, 0L)))
    val b2 = KafkaSegmentReader.batchBytes(1L, 1001L,
      Seq((b("k1"), b("v1"), Nil, 0L)))
    val b3 = KafkaSegmentReader.batchBytes(2L, 1002L,
      Seq((b("k2"), b("v2"), Nil, 0L)))
    b2(30) = (b2(30) ^ 0x7).toByte // corrupt: CRC wrong
    b3(30) = (b3(30) ^ 0x7).toByte // "in-flight": complete but invalid
    val segDir = new java.io.File(s"$dir/f-0"); segDir.mkdirs()
    val os = new java.io.FileOutputStream(
      new java.io.File(segDir, "0" * 20 + ".log"))
    try { os.write(b1); os.write(b2); os.write(b3) } finally os.close()
    val q = spark.readStream.format("graft-kafka")
      .option("startingOffsets", "earliest").load(dir).writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count(); ()
      }.start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("complete frames after it"), msgs)
  }

  test("mid-stream restart is exactly-once: records delivered before the " +
      "stop are not re-emitted, records after it arrive") {
    val dir = Files.createTempDirectory("kstream_restart_").toString
    val cp = Files.createTempDirectory("kstream_restart_cp_").toString
    append(dir, "r", 0, base = 0L, n = 3, segBase = 0L)
    val out1 = collectBatches(dir,
      Map("startingOffsets" -> "earliest"), cp)(_ => ())
    assert(out1.values.flatten.size === 3)
    append(dir, "r", 0, base = 3L, n = 2, segBase = 3L)
    val out2 = collectBatches(dir,
      Map("startingOffsets" -> "earliest"), cp)(_ => ())
    assert(out2.values.flatten.toSeq.sorted ===
      Seq(("r", 0, 3L, "r:v3"), ("r", 0, 4L, "r:v4")))
  }
}
