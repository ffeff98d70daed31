package graft.sources

import java.io.DataInputStream

import scala.collection.immutable.TreeMap

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{broadcast, col, concat, lit, when}
import org.apache.spark.sql.graftshim.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming SOURCE over Kafka log segments —
  * `readStream.format("graft-kafka").load(<log dir>)` — the
  * spark-sql-kafka source contract re-expressed zero-egress over the
  * on-disk RecordBatch format [[KafkaSegmentReader]] decodes (reference
  * contrib/storage-kafka reads the same topics through a live consumer;
  * Drill itself has no streaming surface — this is the Spark-native
  * row).
  *
  * The contract mirrors spark-sql-kafka-0-10's:
  *   - offsets are per-partition NEXT-offset maps, serialized as sorted
  *     JSON (`{"events-0":42,...}`) — checkpoint-exact restarts replay
  *     precisely the admitted ranges;
  *   - `startingOffsets` = `latest` (default, matching the Kafka source)
  *     or `earliest`; the `latest` anchor resolves ONCE at stream launch
  *     and PERSISTS under the checkpoint (the Delta/Iceberg-source
  *     lesson: a restart that re-resolved "latest" silently dropped the
  *     records the crashed batch was carrying);
  *   - partitions APPEARING after launch stream from their earliest
  *     offset (the Kafka source's new-partition rule);
  *   - `maxOffsetsPerTrigger` paces catch-up: the record budget prorates
  *     across partitions by available lag (every lagging partition
  *     advances by at least one record per trigger, so no partition
  *     starves — a documented sharpening of the Kafka source's pure
  *     proration, which can floor a small lag to zero);
  *   - `topics` (comma-separated) restricts which `<topic>-<partition>`
  *     dirs are tailed (the subscribe list).
  *
  * Scale shape: a trigger's planning cost is one directory listing plus
  * a frame walk of each partition's ACTIVE tail's NEW bytes only —
  * closed segments cost NO planning I/O ever, because kafka's naming
  * contract (file name = base offset = first contained offset) makes a
  * closed segment's end exactly its successor's parsed base; this is
  * the zero-egress equivalent of asking a broker for end offsets,
  * O(partitions) not O(bytes), so a 10 TB retained backlog plans its
  * first trigger from the listing alone. Per-path scan state resumes
  * the active walk at the last complete frame, whose CRC is verified
  * before it counts (kafka's own log-recovery rule: an in-flight or
  * torn frame — which under log.preallocate reads as zero-filled, not
  * short — is only distinguishable from data by its checksum). getBatch
  * prunes segments by base-offset range driver-side (the filename IS
  * the base offset — kafka's naming contract), then decodes one task
  * per admitted segment with a broadcast range join; a 10 TB backlog
  * paces through maxOffsetsPerTrigger instead of planning as one batch.
  */
class KafkaStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), KafkaSegmentReader.schema)
  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new KafkaStreamSource(sqlContext, parameters, metadataPath)
}

private[sources] object KafkaStreamSource {
  private val mapper = new ObjectMapper()

  /** Sorted-key JSON so offset equality (the engine compares serialized
    * offsets) never depends on map iteration order. */
  def toJson(parts: Map[String, Long]): String = {
    val node = mapper.createObjectNode()
    TreeMap.from(parts).foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }

  def fromJson(s: String): Map[String, Long] = {
    val node = mapper.readTree(s)
    require(node.isObject, s"graft-kafka offset is not a JSON object: $s")
    val b = Map.newBuilder[String, Long]
    node.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asLong())
    b.result()
  }

  case class KafkaSegmentsOffset(parts: Map[String, Long]) extends Offset {
    override val json: String = toJson(parts)
  }

  /** One segment file with its partition key and base offset (from the
    * broker's `<padded base offset>.log` naming; None when the name is
    * not the broker convention — such partitions decode fine but opt
    * out of base-offset pruning, see getBatch). */
  case class Seg(file: String, tp: String, fileBase: Option[Long],
                 length: Long)
}

class KafkaStreamSource(sqlContext: SQLContext,
                        parameters: Map[String, String],
                        metadataPath: String = "") extends Source {
  import KafkaStreamSource._

  private val spark = sqlContext.sparkSession
  private val path = parameters.getOrElse("path",
    throw new IllegalArgumentException(
      "graft-kafka source requires .load(<broker log dir>)"))
  private val topicFilter: Option[Set[String]] =
    parameters.get("topics").map(_.split(",").map(_.trim).toSet)
  private val startingOffsets =
    parameters.getOrElse("startingOffsets", "latest") match {
      case s @ ("latest" | "earliest") => s
      case json if json.trim.startsWith("{") => json // per-partition map
      case other => throw new IllegalArgumentException(
        "graft-kafka: startingOffsets must be earliest|latest or a " +
          s"""{"topic-0":offset} JSON map, got $other""")
    }
  // startingTimestamp (epoch ms): the kafka offsetsForTimes contract —
  // each partition starts at the EARLIEST record whose timestamp >= ts
  // (record-exact, not batch-granular); partitions with no such record
  // start at their end offset (kafka's "no match -> latest" rule)
  private val startingTimestamp = parameters.get("startingTimestamp").map(_.toLong)
  require(startingTimestamp.isEmpty || !parameters.contains("startingOffsets"),
    "graft-kafka: startingTimestamp and startingOffsets are mutually exclusive")
  private val maxOffsetsPerTrigger =
    parameters.get("maxOffsetsPerTrigger").map(_.toLong)

  override val schema: StructType = KafkaSegmentReader.schema

  private val hconf = spark.sparkContext.hadoopConfiguration

  // ---- progress files under the checkpoint metadata dir (the v1 Source
  // API gives a restarted source no look at the engine's committed
  // offset before its first getOffset — see DeltaStreamSource.Progress)
  private def fsFor(p: Path) = p.getFileSystem(hconf)
  private def readMapFile(name: String): Option[Map[String, Long]] =
    if (metadataPath.isEmpty) None
    else try {
      val p = new Path(metadataPath, name)
      val fs = fsFor(p)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(fromJson(
          scala.io.Source.fromInputStream(in, "UTF-8").mkString))
        finally in.close()
      }
    } catch { case _: java.io.IOException => None }
  private def writeMapFile(name: String, m: Map[String, Long],
                           overwrite: Boolean): Unit =
    if (metadataPath.nonEmpty) {
      val p = new Path(metadataPath, name)
      val fs = fsFor(p)
      if (overwrite || !fs.exists(p)) {
        val tmp = new Path(metadataPath, s".$name.tmp")
        val os = fs.create(tmp, true)
        try os.write(toJson(m).getBytes("UTF-8")) finally os.close()
        // FileContext rename-OVERWRITE is atomic where the FS supports
        // it (HDFS semantics); the FileSystem-API fallback of
        // delete-then-rename leaves a crash window where the progress
        // file is GONE and a restart pacing-resets to the anchor
        try {
          org.apache.hadoop.fs.FileContext
            .getFileContext(fs.makeQualified(p).toUri, hconf)
            .rename(fs.makeQualified(tmp), fs.makeQualified(p),
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            // no AbstractFileSystem binding for this scheme: last
            // resort, the non-atomic path (documented crash window)
            if (!fs.rename(tmp, p)) { fs.delete(p, false); fs.rename(tmp, p) }
        }
      }
    }

  // ---------------------------------------------------- segment scan

  /** All segment files under the log dir, grouped per partition key and
    * sorted by base offset. Partition key = the `<topic>-<partition>`
    * dir name (what [[KafkaSegmentReader.topicPartition]] splits). */
  private def segments(): Map[String, Seq[Seg]] = {
    val root = new Path(path)
    val fs = fsFor(root)
    if (!fs.exists(root)) return Map.empty
    val dirs =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).toSeq.filter(_.isDirectory)
          .filterNot(_.getPath.getName.startsWith("."))
      else Seq.empty
    val out = dirs.flatMap { d =>
      val tp = d.getPath.getName
      val topic = KafkaSegmentReader.topicPartition(tp)._1
      if (topicFilter.exists(f => !f.contains(topic))) Nil
      else fs.listStatus(d.getPath).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".log"))
        .filterNot(st => st.getPath.getName.startsWith(".") ||
          st.getPath.getName.startsWith("_"))
        .map { st =>
          val name = st.getPath.getName.stripSuffix(".log")
          // brokers zero-pad to 20 digits — strip the padding BEFORE the
          // Long-range length check or every real segment name fails it
          val digits = name.dropWhile(_ == '0')
          val base =
            if (name.nonEmpty && name.forall(c => c >= '0' && c <= '9') &&
                digits.length <= 18)
              Some(if (digits.isEmpty) 0L else digits.toLong)
            else None // unparseable name: still readable, never pruned
          Seg(st.getPath.toString, tp, base, st.getLen)
        }
    }.groupBy(_.tp).view
      .mapValues(_.sortBy(_.fileBase.getOrElse(0L))).toMap
    // retention deleted segments must not pin scan state forever
    val live = new java.util.HashSet[String]()
    out.valuesIterator.foreach(_.foreach(s => live.add(s.file)))
    scanStates.keySet.retainAll(live)
    out
  }

  /** Incremental per-path scan state: byte position AFTER the last
    * complete frame and the running end offset. Each trigger resumes the
    * header walk at scannedPos, so cost is proportional to NEW bytes
    * only — not O(segment) per trigger — and the state is keyed by path
    * alone (bounded: one entry per live file, pruned against each
    * listing). Position-based resume also survives log.preallocate=true
    * brokers, where appends land INSIDE a constant-length preallocated
    * file (a length-keyed cache read a stale end forever and silently
    * stalled the stream). A shrunk file (truncation/replacement)
    * resets to a full rescan. */
  private case class ScanState(scannedPos: Long, end: Option[Long])
  private val scanStates =
    new java.util.concurrent.ConcurrentHashMap[String, ScanState]()

  /** Watermark walk over an ACTIVE segment — the only file that pays
    * any planning I/O (closed segments derive their ends from the
    * successor's parsed base, see endOffsets). An active segment
    * legitimately ends in ambiguity: an in-flight frame, or — under
    * log.preallocate=true — a zero-filled tail where a half-written
    * frame can look header-complete. Frames FOLLOWED by more frames
    * are complete (brokers append sequentially), so only the FINAL
    * frame of the walk needs its CRC verified (kafka's own
    * log-recovery rule) before it counts into the watermark; if
    * invalid, the walk backs off one frame and retries next trigger. A
    * tail frame that stays invalid across many triggers is
    * indistinguishable from tail corruption — the source warns once
    * rather than silently idling. Driver cost per trigger: headers of
    * new frames + ONE frame body. */
  private def scanEnd(seg: Seg): Option[Long] = {
    val prev0 = Option(scanStates.get(seg.file))
      .getOrElse(ScanState(0L, None))
    val prev = if (seg.length < prev0.scannedPos) ScanState(0L, None)
               else prev0
    if (prev.scannedPos + 12 > seg.length) {
      scanStates.put(seg.file, prev)
      return prev.end
    }
    val p = new Path(seg.file)
    val in = fsFor(p).open(p)
    try {
      if (prev.scannedPos > 0) in.seek(prev.scannedPos)
      var end: Option[Long] = prev.end
      var pos = prev.scannedPos
      // the final frame's coordinates, CRC-checked after the walk
      var lastFrame: Option[(Long, Int, Long, Option[Long])] = None
      var done = false
      while (!done) {
        if (pos >= seg.length) done = true // clean end at a boundary
        else if (pos + 12 > seg.length) {
          // 1-11 trailing bytes: an in-flight header (or zero padding)
          // — not yet data, stop at the last complete frame
          done = true
        } else {
          val head = new Array[Byte](27)
          val want = math.min(27L, seg.length - pos).toInt
          in.readFully(head, 0, want)
          val batchLength =
            if (want >= 12) KafkaSegmentReader.be32(head, 8) else 0
          if (batchLength == 0) done = true // zero padding tail
          else if (batchLength < 49 || want < 27 ||
              pos + 12 + batchLength > seg.length) {
            done = true // torn/in-flight frame: not yet admitted
          } else {
            val magic = head(16)
            if (magic != 2) {
              // mid-log wrong magic is definitive (a v0/v1 segment or
              // corruption), ACTIVE tail included: an in-flight v2
              // frame never carries a wrong magic at a complete length
              throw new IllegalStateException(
                s"${seg.file}: message format v$magic at byte $pos — " +
                  "only v2 RecordBatch segments are supported")
            }
            val baseOffset = KafkaSegmentReader.be64(head, 0)
            val lastOffsetDelta = KafkaSegmentReader.be32(head, 23)
            lastFrame = Some((pos, batchLength, baseOffset + lastOffsetDelta + 1, end))
            end = Some(baseOffset + lastOffsetDelta + 1)
            pos += 12L + batchLength
            var left = batchLength - 15L
            while (left > 0) {
              val sk = in.skip(left)
              if (sk <= 0) throw new java.io.EOFException(
                s"${seg.file}: truncated batch body")
              left -= sk
            }
          }
        }
      }
      // active tail: the last frame could be half-written over zeros
      // and still look header-complete — verify its CRC before
      // counting it (closed segments defer to the strict decode)
      lastFrame.foreach { case (fpos, flen, _, endBefore) =>
        in.seek(fpos + 12)
        val buf = new Array[Byte](flen)
        in.readFully(buf, 0, flen)
        val crcStored = KafkaSegmentReader.be32(buf, 5) & 0xFFFFFFFFL
        val crc = new java.util.zip.CRC32C()
        crc.update(buf, 9, buf.length - 9)
        if (crc.getValue != crcStored) {
          pos = fpos
          end = endBefore
          val tries = invalidTail.merge(seg.file, Integer.valueOf(1),
            (a: Integer, b: Integer) => Integer.valueOf(a + b))
          if (tries == 20) System.err.println(
            s"[graft-kafka] ${seg.file}: tail frame at byte $fpos has " +
              "failed CRC for 20 consecutive triggers — an in-flight " +
              "write this old usually means tail corruption; the " +
              "partition's watermark is held at offset " +
              s"${end.getOrElse(-1L)} (kafka log recovery would " +
              "truncate here too)")
        } else invalidTail.remove(seg.file)
      }
      scanStates.put(seg.file, ScanState(pos, end))
      end
    } finally in.close()
  }
  private val invalidTail =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Per-partition log-end offsets (next offset a producer would get).
    *
    * CLOSED segments (every segment but the partition's last) cost NO
    * I/O at all: kafka's naming contract says a segment file is named
    * by its base offset — the first offset it contains — so a closed
    * segment's end is exactly its SUCCESSOR's parsed base. This is the
    * zero-egress equivalent of a consumer asking the broker for end
    * offsets (O(partitions), never O(bytes)): a 10 TB retained backlog
    * plans its first trigger from the file listing alone. Only the
    * ACTIVE segment (the last one — the only file a broker appends to)
    * pays the incremental frame walk. Closed-segment corruption stays
    * LOUD where it is actually detected: the strict distributed decode
    * in getBatch CRC-verifies every frame of every closed segment.
    *
    * When any name in a partition is unparseable the ordering is
    * unknown, so no segment can be called closed and every file keeps
    * the walk (tolerant regime, same rule as getBatch's pruning). */
  private def endOffsets(segs: Map[String, Seq[Seg]]): Map[String, Long] =
    segs.flatMap { case (tp, ss) =>
      val anyUnparsed = ss.exists(_.fileBase.isEmpty)
      val ends: Seq[Long] =
        if (anyUnparsed) ss.flatMap(scanEnd)
        else ss.drop(1).map(_.fileBase.get) ++ scanEnd(ss.last)
      if (ends.isEmpty) None else Some(tp -> ends.max)
    }

  /** Per-partition earliest offsets (first retained record). A
    * partition whose first segment has a non-convention name falls back
    * to 0 — safe: offsets below the real first record match nothing. */
  private def earliestOffsets(segs: Map[String, Seq[Seg]]): Map[String, Long] =
    segs.flatMap { case (tp, ss) =>
      ss.headOption.map(h => tp -> h.fileBase.getOrElse(0L))
    }

  // the startingOffsets anchor: resolved EAGERLY at stream launch (a
  // lazy anchor forced at the first trigger would silently drop records
  // appended between start and that trigger — the Iceberg-source
  // lesson), persisted (immutable single-shot) so restarts replay the
  // same initial range
  private val anchor: Map[String, Long] =
    readMapFile("graft-kafka-anchor").getOrElse {
      val segs = segments()
      val a = startingTimestamp match {
        case Some(ts) => offsetsForTime(segs, ts)
        case None => startingOffsets match {
          case "latest" => endOffsets(segs)
          case "earliest" => earliestOffsets(segs)
          case json =>
            // explicit per-partition map; kafka's sentinel values apply
            // (-1 = latest, -2 = earliest), unlisted partitions start
            // earliest (they were subscribed, not excluded)
            val m = fromJson(json)
            val ends = endOffsets(segs)
            val earliest = earliestOffsets(segs)
            (earliest.keySet ++ m.keySet).iterator.map { tp =>
              tp -> (m.get(tp) match {
                case Some(-1L) => ends.getOrElse(tp, 0L)
                case Some(-2L) | None => earliest.getOrElse(tp, 0L)
                case Some(v) => v
              })
            }.toMap
        }
      }
      writeMapFile("graft-kafka-anchor", a, overwrite = false)
      a
    }

  /** offsetsForTimes over segment files: a cheap frame walk finds the
    * FIRST batch per partition whose maxTimestamp reaches `ts` (batches
    * are append-ordered, so every earlier batch holds only older
    * records), then ONE spark job over just those candidate segments
    * refines to the exact first record offset with timestamp >= ts.
    * Runs once per stream (the anchor persists). */
  private def offsetsForTime(segs: Map[String, Seq[Seg]],
                             ts: Long): Map[String, Long] = {
    val ends = endOffsets(segs)
    // candidate = (file, isActive): tolerant decode ONLY for each
    // partition's last segment (a live broker's in-flight tail);
    // CLOSED candidates decode STRICTLY — silent truncation there
    // would make the partition look matchless and fall back to
    // start-at-end, skipping records after the timestamp with no
    // signal (the same silent-loss class getBatch's split refuses)
    val candidates: Seq[(String, Boolean)] = segs.toSeq.flatMap {
      case (_, ss) =>
        val anyUnparsed = ss.exists(_.fileBase.isEmpty)
        ss.zipWithIndex.find { case (seg, _) => maxTsReached(seg, ts) }
          .map { case (seg, i) =>
            (seg.file, anyUnparsed || i == ss.size - 1) }
    }.distinct
    val refined: Map[String, Long] =
      if (candidates.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.{col, min => fmin, concat, lit, when}
        val (activeC, closedC) = candidates.partition(_._2)
        Seq((closedC.map(_._1), false), (activeC.map(_._1), true))
          .filter(_._1.nonEmpty)
          .map { case (fs, tol) =>
            KafkaSegmentReader.readFiles(spark, fs, tolerateTail = tol) }
          .reduce(_ unionByName _)
          .filter(col("timestamp") >= ts)
          .withColumn("__tp",
            when(col("partition").isNull, col("topic"))
              .otherwise(concat(col("topic"), lit("-"), col("partition"))))
          .groupBy("__tp").agg(fmin(col("offset")).as("o"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    segs.keysIterator.map { tp =>
      tp -> refined.getOrElse(tp, ends.getOrElse(tp, 0L))
    }.toMap
  }

  /** Does any batch of this segment carry maxTimestamp >= ts? Stops at
    * the first hit; same frame walk as scanEnd minus the CRC (a false
    * positive only widens the candidate set the exact job then refines,
    * and in-flight tails stop the walk). */
  private def maxTsReached(seg: Seg, ts: Long): Boolean = {
    val p = new Path(seg.file)
    val in = fsFor(p).open(p)
    try {
      var pos = 0L
      while (pos + 12 <= seg.length) {
        val head = new Array[Byte](12)
        in.readFully(head, 0, 12)
        val batchLength = KafkaSegmentReader.be32(head, 8)
        if (batchLength < 49 || pos + 12 + batchLength > seg.length)
          return false
        val body = new Array[Byte](31) // through maxTimestamp @ 23..31
        in.readFully(body, 0, 31)
        if (KafkaSegmentReader.be64(body, 23) >= ts) return true
        var left = batchLength - 31L
        while (left > 0) {
          val sk = in.skip(left)
          if (sk <= 0) return false
          left -= sk
        }
        pos += 12L + batchLength
      }
      false
    } finally in.close()
  }

  @volatile private var committed: Option[Map[String, Long]] =
    readMapFile("graft-kafka-progress")
  override def commit(end: Offset): Unit = {
    val m = parts(end)
    committed = Some(m)
    writeMapFile("graft-kafka-progress", m, overwrite = true)
  }

  private def parts(o: Offset): Map[String, Long] = o match {
    case k: KafkaSegmentsOffset => k.parts
    case other => fromJson(other.json)
  }

  override def getOffset: Option[Offset] = {
    val segs = segments()
    if (segs.isEmpty && committed.isEmpty) return None
    val ends = endOffsets(segs)
    val earliest = earliestOffsets(segs)
    val from = committed.getOrElse(anchor)
    // a partition in a committed offset but gone from disk (deleted
    // topic dir) must not REGRESS out of the offset map — keep its
    // committed position
    val keys = ends.keySet ++ from.keySet
    val target = keys.iterator.map { tp =>
      val lo = from.getOrElse(tp, earliest.getOrElse(tp, 0L))
      val hi = math.max(ends.getOrElse(tp, lo), lo)
      tp -> (lo, hi)
    }.toMap
    val admitted = maxOffsetsPerTrigger match {
      case None => target.view.mapValues(_._2).toMap
      case Some(budget) =>
        val totalLag = target.valuesIterator.map(r => r._2 - r._1).sum
        if (totalLag <= budget) target.view.mapValues(_._2).toMap
        else target.map { case (tp, (lo, hi)) =>
          val lag = hi - lo
          val share =
            if (lag == 0) 0L
            // double arithmetic: budget * lag overflows Long at the
            // backlog scales this cap exists for (10^8 budget x 10^11
            // lag), silently collapsing the share to 1/trigger
            else math.min(lag,
              math.max(1L, (budget.toDouble * lag / totalLag).toLong))
          tp -> (lo + share)
        }
    }
    if (admitted.isEmpty) None else Some(KafkaSegmentsOffset(admitted))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endMap = parts(end)
    committed = Some(endMap) // admission progress (commit() persists)
    val segs = segments()
    val earliest = earliestOffsets(segs)
    val startMap = start.map(parts).getOrElse(anchor)
    val ranges = endMap.toSeq.map { case (tp, hi) =>
      // a partition absent from the start map appeared after launch:
      // stream it from its earliest retained offset (the Kafka rule)
      val lo = startMap.getOrElse(tp, earliest.getOrElse(tp, 0L))
      (tp, lo, hi)
    }.filter { case (_, lo, hi) => hi > lo }
    // (file, isActive): the ACTIVE segment (last per partition, or all
    // of a partition with unparseable names) decodes tail-tolerantly;
    // CLOSED segments decode STRICTLY — a corrupt frame there must
    // fail the batch loudly, not silently truncate rows the admitted
    // range still claims
    val pruned: Seq[(String, Boolean)] = ranges.flatMap { case (tp, lo, hi) =>
      val ss = segs.getOrElse(tp, Nil)
      // keep a segment if any of [lo, hi) can live in it: its base is
      // below hi and the NEXT segment's base is above lo (the filename
      // base-offset contract; the last segment has no upper bound).
      // Pruning REQUIRES every name in the partition to parse: with a
      // fallback base the sort is wrong and a pruned file could hold
      // admitted offsets — silent data loss. Such partitions decode
      // every file and let the range filter do the work.
      if (ss.exists(_.fileBase.isEmpty)) ss.map(s => (s.file, true))
      else ss.zipWithIndex
        .zipAll(ss.drop(1).map(n => n.fileBase), null, None)
        .collect { case ((s, i), nextBase) if s != null &&
            s.fileBase.get < hi && nextBase.forall(_ > lo) =>
          (s.file, i == ss.size - 1) }
    }
    val batch =
      if (pruned.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val rangesDf = spark.createDataFrame(ranges)
          .toDF("__tp", "__lo", "__hi")
        val (activeF, closedF) = pruned.partition(_._2)
        // tolerateTail only on ACTIVE segments (a live broker's partial
        // in-flight tail stops at the last complete frame; the range
        // filter guarantees exactly-once regardless of how many frames
        // landed since planning); closed segments decode strictly
        val parts = Seq(
          (closedF.map(_._1), false), (activeF.map(_._1), true))
          .filter(_._1.nonEmpty)
          .map { case (fs, tol) =>
            KafkaSegmentReader.readFiles(spark, fs, tolerateTail = tol) }
        val rows = parts.reduce(_ unionByName _)
        val keyed = rows.withColumn("__tp",
          when(col("partition").isNull, col("topic"))
            .otherwise(concat(col("topic"), lit("-"), col("partition"))))
        keyed.join(broadcast(rangesDf), "__tp")
          .filter(col("offset") >= col("__lo") && col("offset") < col("__hi"))
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      }
    StreamShim.asStreamingFrame(
      batch.select(schema.fieldNames.map(col).toIndexedSeq: _*))
  }

  override def stop(): Unit = ()
}
