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
  * a HEADER-ONLY walk of segments (12-byte frame + 15 bytes of batch
  * header, payload seek-skipped) — and only for segments whose
  * (file, length) changed since the last look: closed segments are
  * immutable, so steady-state planning touches just each partition's
  * active segment. getBatch prunes segments by base-offset range
  * driver-side (the filename IS the base offset — kafka's naming
  * contract), then decodes one task per admitted segment with a
  * broadcast range join; a 10 TB backlog paces through
  * maxOffsetsPerTrigger instead of planning as one batch.
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
    * broker's `<padded base offset>.log` naming). */
  case class Seg(file: String, tp: String, fileBase: Long, length: Long)
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
      case other => throw new IllegalArgumentException(
        s"graft-kafka: startingOffsets must be earliest|latest, got $other")
    }
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
        if (!fs.rename(tmp, p)) { fs.delete(p, false); fs.rename(tmp, p) }
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
    dirs.flatMap { d =>
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
              if (digits.isEmpty) 0L else digits.toLong
            else 0L // unparseable name: no pruning bound, still readable
          Seg(st.getPath.toString, tp, base, st.getLen)
        }
    }.groupBy(_.tp).view.mapValues(_.sortBy(_.fileBase)).toMap
  }

  /** (file, length) → offset AFTER the last record in the file, None if
    * the file holds no complete batch. Closed segments are immutable, so
    * the cache key (path, length) re-scans only grown files. */
  private val endCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Option[Long]]()

  /** Header-only walk: per batch frame read baseOffset(8)+batchLength(4)
    * then epoch(4)+magic(1)+crc(4)+attrs(2)+lastOffsetDelta(4), seek
    * past the rest. A trailing PARTIAL frame (an in-flight broker write)
    * is ignored — it is not yet readable data. */
  private def scanEnd(seg: Seg): Option[Long] =
    endCache.computeIfAbsent((seg.file, seg.length), _ => {
      val p = new Path(seg.file)
      val in = new DataInputStream(fsFor(p).open(p))
      try {
        var end: Option[Long] = None
        var pos = 0L
        var done = false
        while (!done) {
          if (pos + 12 > seg.length) done = true
          else {
            val head = new Array[Byte](27)
            val want = math.min(27L, seg.length - pos).toInt
            in.readFully(head, 0, want)
            val baseOffset = be64(head, 0)
            val batchLength = be32(head, 8)
            if (batchLength <= 0 || want < 27 ||
                pos + 12 + batchLength > seg.length) done = true
            else {
              val magic = head(16)
              require(magic == 2, s"${seg.file}: message format v$magic — " +
                "only v2 RecordBatch segments are supported")
              val lastOffsetDelta = be32(head, 23)
              end = Some(baseOffset + lastOffsetDelta + 1)
              pos += 12L + batchLength
              // already consumed 27 bytes: 12 frame + 15 of the body
              val skip = batchLength - 15L
              var left = skip
              while (left > 0) {
                val s = in.skip(left)
                if (s <= 0) throw new java.io.EOFException(
                  s"${seg.file}: truncated batch body")
                left -= s
              }
            }
          }
        }
        end
      } finally in.close()
    })

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def be64(b: Array[Byte], o: Int): Long =
    ((be32(b, o) & 0xFFFFFFFFL) << 32) | (be32(b, o + 4) & 0xFFFFFFFFL)

  /** Per-partition log-end offsets (next offset a producer would get).
    * Max over every segment, not "the last by name": an unparseable
    * segment name falls back to base 0 and would break the sort — and
    * scanEnd is (file, length)-cached, so closed segments cost one
    * header walk EVER, making the max a cache sweep per trigger. */
  private def endOffsets(segs: Map[String, Seq[Seg]]): Map[String, Long] =
    segs.flatMap { case (tp, ss) =>
      val ends = ss.flatMap(scanEnd)
      if (ends.isEmpty) None else Some(tp -> ends.max)
    }

  /** Per-partition earliest offsets (first retained record). */
  private def earliestOffsets(segs: Map[String, Seq[Seg]]): Map[String, Long] =
    segs.flatMap { case (tp, ss) =>
      ss.headOption.map(tp -> _.fileBase)
    }

  // the startingOffsets anchor: resolved EAGERLY at stream launch (a
  // lazy anchor forced at the first trigger would silently drop records
  // appended between start and that trigger — the Iceberg-source
  // lesson), persisted (immutable single-shot) so restarts replay the
  // same initial range
  private val anchor: Map[String, Long] =
    readMapFile("graft-kafka-anchor").getOrElse {
      val segs = segments()
      val a = if (startingOffsets == "latest") endOffsets(segs)
              else earliestOffsets(segs)
      writeMapFile("graft-kafka-anchor", a, overwrite = false)
      a
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
            else math.min(lag, math.max(1L, budget * lag / totalLag))
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
    val pruned = ranges.flatMap { case (tp, lo, hi) =>
      val ss = segs.getOrElse(tp, Nil)
      // keep a segment if any of [lo, hi) can live in it: its base is
      // below hi and the NEXT segment's base is above lo (the filename
      // base-offset contract; the last segment has no upper bound)
      ss.zipAll(ss.drop(1).map(n => Some(n.fileBase)), null, None)
        .collect { case (s, nextBase) if s != null &&
            s.fileBase < hi && nextBase.forall(_ > lo) => s.file }
    }
    val batch =
      if (pruned.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val rangesDf = spark.createDataFrame(ranges)
          .toDF("__tp", "__lo", "__hi")
        val rows = KafkaSegmentReader.readFiles(spark, pruned)
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
