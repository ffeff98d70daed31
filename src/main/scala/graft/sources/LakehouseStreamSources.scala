package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming sources over the OTHER two lakehouse logs — with
  * [[DeltaStreamProvider]] this completes the read-side triad matching
  * the exactly-once sink triad.
  *
  * `readStream.format("graft-iceberg").load(path)` — the
  * Spark-Iceberg SparkMicroBatchStream role (offsets = snapshots,
  * appends stream, `replace` compaction snapshots never re-emit,
  * overwrite/delete snapshots fail unless `skipChangeCommits`):
  * initial batch = table state at the first observed snapshot (or
  * `startingSnapshotId`; `latest` = post-start appends only).
  *
  * `readStream.format("graft-paimon").load(path)` — paimon's
  * continuous scan: PRIMARY-KEY tables stream their CHANGELOG
  * (`row_kind`-tagged +I/-U/+U/-D rows per snapshot — the CDC stream a
  * downstream consumer applies in order), append-only tables stream
  * appended rows; COMPACT snapshots never re-emit. Offsets are paimon's
  * monotonic snapshot ids. The initial batch is the current table state
  * (PK: merged state as +I rows).
  */
class IcebergStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-iceberg"
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    // metadata-only: loadMeta holds the schema — building the full
    // merge-on-read plan just to answer a schema question pays every
    // manifest/DV/delete-file resolution twice at stream startup
    (shortName(), IcebergTable.loadMeta(sqlContext.sparkSession,
      DeltaStreamSource.pathOf(parameters)).schema)
  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext, parameters, metadataPath)
}

class IcebergStreamSource(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          metadataPath: String = "") extends Source {
  private val spark = sqlContext.sparkSession
  private val path = DeltaStreamSource.pathOf(parameters)
  private val startingSnapshotId = parameters.get("startingSnapshotId")
  private val skipChangeCommits =
    parameters.get("skipChangeCommits").exists(_.toBoolean)

  private val maxFilesPerTrigger = parameters.get("maxFilesPerTrigger").map(_.toInt)

  // per-snapshot appended-file counts: immutable once a snapshot is
  // written, so each manifest parses at most once per source instance
  private val fileCountCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Integer]()

  override val schema: StructType = IcebergTable.loadMeta(spark, path).schema

  private def snaps = IcebergTable.loadMeta(spark, path).snapshots

  // admission control: committed progress persisted under the
  // checkpoint's metadata dir (see DeltaStreamSource.Progress — a
  // restart must resume the count, never regress below the engine's
  // checkpointed offset). An EXPIRED committed snapshot (gone from the
  // metadata) runs one uncapped batch rather than recounting from the
  // table's first snapshot.
  private val progress =
    if (metadataPath.isEmpty) None
    else Some(new DeltaStreamSource.Progress(spark, metadataPath))

  // eager: `startingSnapshotId=latest` anchors at STREAM START — a lazy
  // anchor forced at the first batch would drop snapshots landing
  // between start and the first trigger. Optional: a schema-only table
  // (created, no commits yet) has no snapshot to anchor at (persisted
  // as -1), and then everything that ever lands is post-launch anyway.
  // PERSISTED like the Delta twin: a restart that re-resolved "latest"
  // made the crashed batch's getBatch(None, end) replay an EMPTY range
  // and silently drop its snapshots.
  private val startSnapshotAtLaunch: Option[Long] =
    if (!startingSnapshotId.contains("latest"))
      snaps.lastOption.map(_.snapshotId)
    else progress.flatMap(_.readAnchor()) match {
      case Some(v) => if (v < 0) None else Some(v)
      case None =>
        val v = snaps.lastOption.map(_.snapshotId)
        progress.foreach(_.writeAnchor(v.getOrElse(-1L)))
        v
    }
  @volatile private var committed: Option[Long] = progress.flatMap(_.read())
  override def commit(end: Offset): Unit = {
    committed = Some(ver(end))
    progress.foreach(_.write(ver(end)))
  }

  override def getOffset: Option[Offset] = {
    val all = snaps
    if (all.isEmpty) return None
    val fromIdx = committed.map(id => all.indexWhere(_.snapshotId == id))
    (maxFilesPerTrigger, fromIdx) match {
      case (None, _) => Some(LongOffset(all.last.snapshotId))
      case (_, Some(-1)) => Some(LongOffset(all.last.snapshotId)) // expired
      case (Some(budget), from0) =>
        // fresh start: the budget window must begin at the CONFIGURED
        // anchor, not the table's first snapshot — otherwise a capped
        // stream replays the pre-anchor history one snapshot at a time
        val anchorIdx = startingSnapshotId match {
          case Some("latest") => startSnapshotAtLaunch
            .map(id => all.indexWhere(_.snapshotId == id)).getOrElse(-1)
          case Some(id) =>
            // the initial batch carries the STATE at id (see getBatch),
            // so the file budget window begins strictly AFTER id
            all.indexWhere(_.snapshotId == id.toLong)
          case None => -1
        }
        val from = from0.getOrElse(anchorIdx)
        // per-snapshot counts are IMMUTABLE — cache by snapshot id so a
        // backlogged capped stream doesn't re-parse the same Avro
        // manifests on every trigger until the snapshot is admitted
        def countOf(i: Int): Int =
          if (all(i).operation == "append")
            fileCountCache.computeIfAbsent(all(i).snapshotId,
              _ => IcebergTable.appendedFilesOf(spark, path, all(i)).size)
              .intValue
          else 0
        var idx = from
        var files = 0
        var next = if (idx < all.length - 1) countOf(idx + 1) else 0
        while (idx < all.length - 1 && (files == 0 || files + next <= budget)) {
          idx += 1
          files += next
          next = if (idx < all.length - 1) countOf(idx + 1) else 0
        }
        Some(LongOffset(all(math.max(idx, 0)).snapshotId))
    }
  }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endId = ver(end)
    committed = Some(endId) // progress for admission control
    progress.foreach(_.write(endId))
    val batch = start.map(s => appendedBetween(Some(ver(s)), endId)).getOrElse {
      startingSnapshotId match {
        case Some("latest") => appendedBetween(startSnapshotAtLaunch, endId)
        case Some(id) =>
          // the documented contract: initial batch = table STATE at the
          // starting snapshot, plus appends from there to the admitted
          // end — appends-only-of-[id..end] would permanently omit rows
          // live at id from earlier snapshots
          IcebergTable.read(spark, path, snapshotId = Some(id.toLong))
            .unionByName(appendedBetween(Some(id.toLong), endId))
        case None => IcebergTable.read(spark, path, snapshotId = Some(endId))
      }
    }
    StreamShim.asStreamingFrame(
      batch.select(schema.fieldNames.map(col).toIndexedSeq: _*))
  }

  private def appendedBetween(afterId: Option[Long], endId: Long): DataFrame = {
    val all = snaps
    val endIdx = all.indexWhere(_.snapshotId == endId)
    require(endIdx >= 0, s"snapshot $endId not in $path (expired?)")
    val startIdx = afterId.map { id =>
      val i = all.indexWhere(_.snapshotId == id)
      if (i < 0) {
        // the committed snapshot EXPIRED from the metadata: expiration
        // drops a PREFIX of the commit order, so every retained snapshot
        // is strictly newer than the committed point — emitting them all
        // is continuation, not replay (the "one uncapped catch-up batch"
        // getOffset's expired branch promises; a require here made that
        // recovery unreachable and failed the stream every trigger)
        System.err.println(
          s"[graft-iceberg] start snapshot $id expired from $path — " +
            "emitting all retained snapshots as one catch-up batch")
        -1
      } else i
    }.getOrElse(-1)
    val files = all.slice(startIdx + 1, endIdx + 1).flatMap { s =>
      s.operation match {
        case "append"  => IcebergTable.appendedFilesOf(spark, path, s)
        case "replace" => Nil // compaction rewrites files, never rows
        case op =>
          if (skipChangeCommits) Nil
          else throw new IllegalStateException(
            s"graft-iceberg stream: snapshot ${s.snapshotId} of $path is " +
              s"'$op' (changes existing data). Streaming sources only " +
              "append; set skipChangeCommits=true to skip such snapshots.")
      }
    }
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  override def stop(): Unit = ()
}

class PaimonStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-paimon"
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), PaimonStreamSource.streamSchema(
      sqlContext.sparkSession, DeltaStreamSource.pathOf(parameters)))
  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new PaimonStreamSource(sqlContext, parameters, metadataPath)
}

private[sources] object PaimonStreamSource {
  def isPk(spark: org.apache.spark.sql.SparkSession, table: String): Boolean =
    PaimonTable.loadSchema(spark, table).primaryKeys.nonEmpty

  /** PK tables stream the changelog shape (row_kind first); append-only
    * tables stream the plain row schema. */
  def streamSchema(spark: org.apache.spark.sql.SparkSession,
                   table: String): StructType = {
    val base = PaimonTable.loadSchema(spark, table).schema
    if (isPk(spark, table))
      // _snapshot_id is the APPLY ORDER: one micro-batch can span
      // several snapshots, and without a commit column a CDC consumer
      // cannot tell which +U for a key is final (the Delta CDF twin
      // emits _commit_version for the same reason)
      StructType(StructField("row_kind", StringType, nullable = false) +:
        (base.fields :+
          StructField("_snapshot_id", org.apache.spark.sql.types.LongType,
            nullable = false)))
    else base
  }
}

class PaimonStreamSource(sqlContext: SQLContext,
                         parameters: Map[String, String],
                         metadataPath: String = "") extends Source {
  private val spark = sqlContext.sparkSession
  private val path = DeltaStreamSource.pathOf(parameters)
  private val pk = PaimonStreamSource.isPk(spark, path)
  private val skipChangeCommits =
    parameters.get("skipChangeCommits").exists(_.toBoolean)

  private val maxFilesPerTrigger = parameters.get("maxFilesPerTrigger").map(_.toInt)

  // per-snapshot appended-file counts: immutable once a snapshot is
  // written, so each manifest parses at most once per source instance
  private val fileCountCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Integer]()

  override val schema: StructType = PaimonStreamSource.streamSchema(spark, path)

  private val progress =
    if (metadataPath.isEmpty) None
    else Some(new DeltaStreamSource.Progress(spark, metadataPath))
  @volatile private var committed: Option[Long] = progress.flatMap(_.read())
  override def commit(end: Offset): Unit = {
    committed = Some(ver(end))
    progress.foreach(_.write(ver(end)))
  }

  override def getOffset: Option[Offset] = {
    val all = PaimonTable.snapshots(spark, path)
    if (all.isEmpty) return None
    (maxFilesPerTrigger, committed) match {
      case (None, _) => Some(LongOffset(all.last.id))
      case (Some(budget), from0) =>
        val from = from0.getOrElse(all.head.id - 1)
        var last = from
        var files = 0
        var stop = false
        all.filter(_.id > from).foreach { s =>
          if (!stop) {
            // immutable per snapshot — cached (see Iceberg twin)
            val n = if (s.commitKind == "COMPACT") 0
              else fileCountCache.computeIfAbsent(s.id,
                _ => PaimonTable.appendedFilesOf(spark, path, s).size).intValue
            if (files == 0 || files + n <= budget) { last = s.id; files += n }
            else stop = true // admitted range must stay contiguous
          }
        }
        Some(LongOffset(last))
    }
  }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val hi = ver(end)
    committed = Some(hi) // progress for admission control
    progress.foreach(_.write(hi))
    val batch = start match {
      case Some(s) => changesBetween(ver(s), hi)
      case None => // initial: current state (PK: merged rows surface as +I)
        val full = PaimonTable.read(spark, path, snapshotId = Some(hi))
        if (pk) full.select((lit("+I").as("row_kind") +:
            full.columns.map(col).toIndexedSeq) :+
          lit(hi).as("_snapshot_id"): _*)
        else full
    }
    StreamShim.asStreamingFrame(
      batch.select(schema.fieldNames.map(col).toIndexedSeq: _*))
  }

  private def changesBetween(lo: Long, hi: Long): DataFrame = {
    val range = PaimonTable.snapshots(spark, path)
      .filter(s => s.id > lo && s.id <= hi)
    val parts = range.flatMap { s =>
      s.commitKind match {
        case "COMPACT" => Nil // file rewrites, never new rows
        case "OVERWRITE" =>
          // a PK overwrite replaces keys WITHOUT retraction rows in its
          // delta files — emitting only the new rows would corrupt a
          // changelog consumer's state (vanished keys never get a -D),
          // so overwrites fail-or-skip for BOTH table flavors
          if (skipChangeCommits) Nil
          else throw new IllegalStateException(
            s"graft-paimon stream: snapshot ${s.id} of $path is OVERWRITE " +
              "(replaces data). Set skipChangeCommits=true to skip it.")
        case _ =>
          if (pk) Seq(PaimonTable.readChangelog(spark, path, s.id)
            .withColumn("_snapshot_id", org.apache.spark.sql.functions.lit(s.id)))
          else {
            val files = PaimonTable.appendedFilesOf(spark, path, s)
            if (files.isEmpty) Nil
            // readAppendFiles, NOT a bare schema'd parquet read: data
            // files of partitioned append tables may TRIM the partition
            // columns (values live in the directory names) — the bare
            // read silently NULL-filled them while the initial-snapshot
            // batch (via PaimonTable.read) had real values
            else Seq(PaimonTable.readAppendFiles(spark, path,
              PaimonTable.loadSchema(spark, path), files))
          }
      }
    }
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else parts.reduce(_ unionByName _)
  }

  override def stop(): Unit = ()
}
