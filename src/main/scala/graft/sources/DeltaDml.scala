package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructType}

/** Batch DML on a Delta table — DELETE / UPDATE / MERGE as COPY-ON-WRITE
  * commits, the delta-spark semantics re-expressed Spark-first (reference
  * surface: Drill reads Delta, contrib/format-deltalake; the DML contract
  * itself is delta PROTOCOL.md commit semantics — data files are
  * immutable, a change is remove(old)+add(rewritten) in one atomic
  * commit).
  *
  * The 100 TB shape: every pass is FILE-PRUNED. A first distributed scan
  * finds only the files that contain at least one affected row (for
  * MERGE, a join against the source on the ON condition); only those
  * files are re-read and rewritten — a DELETE touching 3 files of 30 000
  * scans the table once for the match (with the predicate pushed down)
  * and rewrites 3 files. Untouched files carry over by reference in the
  * log. The driver handles file LISTS (KB-scale metadata); rows never
  * leave executors.
  *
  * Refusals match [[DeltaLogWriter.optimize]]: partitioned tables
  * (partition values live only in the log; a naive rewrite drops them),
  * deletion vectors (a rewrite must materialize them first), column
  * mapping (rewritten files would need physical-name headers).
  */
object DeltaDml {

  /** (version, rowsUpdated, rowsDeleted, rowsInserted) of one DML commit. */
  case class DmlStats(version: Long, updated: Long, deleted: Long,
                      inserted: Long)

  private val PhysKey = "delta.columnMapping.physicalName"

  // add.path is percent-ENCODED in the log (PROTOCOL.md): decode before
  // touching the filesystem; log actions keep the encoded rel path
  private def absolute(tablePath: String, p: String): String =
    DeltaLogReader.decodedAbsolute(tablePath, p)

  // scheme+AUTHORITY strip, shared with the reader: _metadata.file_path
  // is always fully qualified while encNorm keys from a relative
  // tablePath are not — an authority-keeping regex made DV DML a SILENT
  // NO-OP (relLookup joined nothing) on any non-local filesystem
  private def absNorm(c: Column): Column = DeltaLogReader.normPathCol(c)
  // join key vs _metadata.file_path (URI-encoded) — see DeltaLogReader
  private def encNorm(s: String): String = DeltaLogReader.encNorm(s)

  /** Live state with the DML refusals applied:
    * (schema, relPath -> absolute path, current version, table conf). */
  private def dmlState(spark: SparkSession, tablePath: String,
                       removesRows: Boolean = true)
      : (StructType, Seq[(String, String)], Long, Map[String, String]) = {
    val (schema, partCols, files) = DeltaLogReader.activeState(spark, tablePath)
    require(partCols.isEmpty,
      s"DML on partitioned Delta table not supported: $tablePath " +
        "(partition values live only in the log; a rewrite would drop them)")
    require(files.forall(!_._3),
      s"DML over deletion vectors not supported: $tablePath " +
        "(the rewrite would need to materialize the DVs first)")
    require(schema.fields.forall(f => !f.metadata.contains(PhysKey)),
      s"DML on column-mapped Delta table not supported: $tablePath")
    val conf = writerGate(spark, tablePath, schema,
      removesRows = removesRows)
    val version = (DeltaLogReader.tableVersions(spark, tablePath) ++
      DeltaLogReader.lastCheckpointVersion(spark, tablePath)).max
    (schema, files.map { case (p, _, _) => p -> absolute(tablePath, p) },
      version, conf)
  }

  /** Distinct live files holding at least one row of `hits` — the
    * pruning scan. `hits` must carry a `__g_file` column (normalized
    * absolute path, from [[fileCol]] on the TARGET scan — `_metadata.
    * file_path` binds to its own relation, so plans that also join a
    * second file source stay unambiguous, unlike `input_file_name()`).
    * Returns relative log paths. */
  private def affectedOf(hits: DataFrame,
                         files: Seq[(String, String)]): Seq[String] = {
    val byNorm = files.map { case (rel, abs) =>
      encNorm(abs) -> rel
    }.toMap
    hits.select(col("__g_file"))
      .distinct().collect().map(r => byNorm(r.getString(0))).toSeq
  }

  private def fileCol: Column = absNorm(col("_metadata.file_path"))

  /** Stage `df` as parquet parts and publish them into the table root as
    * add actions for `version` (the [[DeltaLogWriter.write]] staging
    * dance, shared by every COW rewrite). */
  private def stageAdds(df: DataFrame, tablePath: String, version: Long,
                        dataChange: Boolean): Seq[String] = {
    val spark = df.sparkSession
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // UUID part names AND staging dir (delta-spark's convention):
    // DETERMINISTIC names let a concurrent DML clobber the commit-race
    // winner's data file (or interleave into its staging dir) before
    // the put-if-absent log write decided the race
    val runId = java.util.UUID.randomUUID().toString
    val staging = new Path(tablePath, s"_staging_$runId")
    df.write.mode("overwrite").parquet(staging.toString)
    val parts = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val adds = parts.zipWithIndex.map { case (part, i) =>
      val name = f"part-$i%05d-$runId.parquet"
      val dest = new Path(tablePath, name)
      require(fs.rename(part, dest), s"rename failed: $part -> $dest")
      val size = fs.getFileStatus(dest).getLen
      s"""{"add":{"path":"$name","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":$dataChange}}"""
    }.toSeq
    fs.delete(staging, true)
    adds
  }

  /** PROTOCOL.md writer-version rules — the write-side twin of the
    * reader's checkProtocol: a writer MUST refuse tables whose protocol
    * or metadata demand capabilities it does not honor, instead of
    * committing changes that violate the table's declared contract
    * (delta-spark refuses the same way). Returns the table
    * configuration so callers reuse it (the CDF flag) without another
    * log replay. `removesRows` = false for pure appends and
    * dataChange=false maintenance, which append-only tables accept. */
  private[sources] def writerGate(spark: SparkSession, tablePath: String,
      schema: StructType, removesRows: Boolean): Map[String, String] = {
    val (_, pw, _, wf) = DeltaLogReader.protocolInfo(spark, tablePath)
    val (_, conf) = DeltaLogReader.currentMetaInfo(spark, tablePath)
    require(pw <= 7,
      s"Delta table $tablePath requires minWriterVersion $pw; this " +
        "writer implements protocol versions 1-7")
    // features we honor (appendOnly/invariants/checkConstraints/
    // generatedColumns/identityColumns via the metadata checks below,
    // changeDataFeed via cdc emission, deletionVectors/columnMapping/
    // timestampNtz/v2Checkpoint/vacuumProtocolCheck structurally);
    // anything else (rowTracking, domainMetadata, icebergCompat*, ...)
    // obliges writers to maintain state this code does not
    val supported = Set("appendOnly", "invariants", "checkConstraints",
      "changeDataFeed", "generatedColumns", "columnMapping",
      "identityColumns", "deletionVectors", "timestampNtz",
      "v2Checkpoint", "vacuumProtocolCheck")
    val unsupported = wf -- supported
    require(unsupported.isEmpty,
      s"Delta table $tablePath requires writer features " +
        s"${unsupported.toSeq.sorted.mkString("[", ", ", "]")} this " +
        "writer does not implement — committing anyway could violate " +
        "the table's contract")
    if (removesRows)
      require(!conf.get("delta.appendOnly").exists(_.equalsIgnoreCase("true")),
        s"Delta table $tablePath is append-only (delta.appendOnly=true): " +
          "a commit that removes or rewrites rows would violate it")
    val constraints = conf.keys.filter(_.startsWith("delta.constraints."))
    require(constraints.isEmpty,
      s"Delta table $tablePath declares CHECK constraints " +
        s"${constraints.toSeq.sorted.mkString(", ")} this writer does " +
        "not evaluate — an invalid row would commit unchecked")
    schema.fields.foreach { f =>
      require(!f.metadata.contains("delta.invariants"),
        s"Delta table $tablePath: column '${f.name}' declares an " +
          "invariant this writer does not evaluate")
      require(!f.metadata.contains("delta.generationExpression"),
        s"Delta table $tablePath: column '${f.name}' is a generated " +
          "column this writer does not compute")
      require(!f.metadata.contains("delta.identity.start"),
        s"Delta table $tablePath: column '${f.name}' is an identity " +
          "column this writer does not assign")
    }
    conf
  }

  /** The add action's deletionVector descriptor fragment ("" for none). */
  private[sources] def dvJson(dv: Option[DeletionVectors.DvDescriptor]): String =
    dv.map(d =>
      s""","deletionVector":{"storageType":"${d.storageType}",""" +
        s""""pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset},""" +
        s""""sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}""")
      .getOrElse("")

  /** remove actions carry the removed file's CURRENT deletionVector
    * descriptor: PROTOCOL.md keys logical-file identity on
    * (path, dvUniqueId), so a remove without the DV would leave the old
    * (path, dv) pair alive in a spec-keyed replay. */
  private[sources] def removeActions(rels: Seq[String],
      dvOf: String => Option[DeletionVectors.DvDescriptor] = _ => None,
      dataChange: Boolean = true): Seq[String] =
    rels.map(p =>
      s"""{"remove":{"path":"$p","deletionTimestamp":0,"dataChange":$dataChange${dvJson(dvOf(p))}}}""")

  /** commitInfo action (PROTOCOL.md: informational, replay ignores it)
    * — what DESCRIBE HISTORY surfaces as the operation name. */
  private def ci(op: String): String =
    s"""{"commitInfo":{"timestamp":${System.currentTimeMillis()},"operation":"$op","engineInfo":"graft"}}"""

  /** Change Data Feed emission from DML, on when the session sets
    * `graft.delta.cdf = true` (delta-spark's
    * `delta.enableChangeDataFeed` posture — off by default because the
    * cdc write costs storage). Without cdc files a COW commit's CDF
    * DERIVES from add/remove and over-reports: every row of a rewritten
    * file shows as delete+insert. With them, [[DeltaLogReader
    * .readChanges]] serves the exact row-level changes. */
  private def cdfEnabled(spark: SparkSession,
                         tableConf: Map[String, String]): Boolean =
    spark.conf.getOption("graft.delta.cdf").exists(_.equalsIgnoreCase("true")) ||
      // the TABLE-level flag (delta.enableChangeDataFeed=true) obliges
      // every writer to emit cdc files — delta-spark readers of such a
      // table assume exact row-level changes, so honoring only the
      // session flag would silently degrade their CDF to derived form
      tableConf.get("delta.enableChangeDataFeed")
        .exists(_.equalsIgnoreCase("true"))

  /** Stage `df` (schema + `_change_type`) as cdc parquet under
    * `_change_data/` and return the cdc actions (dataChange=false —
    * cdc files never join the live data set). */
  private def stageCdc(df: DataFrame, tablePath: String,
                       version: Long): Seq[String] = {
    val spark = df.sparkSession
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val runId = java.util.UUID.randomUUID().toString // see stageAdds
    val staging = new Path(tablePath, s"_staging_cdc_$runId")
    df.write.mode("overwrite").parquet(staging.toString)
    val parts = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val cdcDir = new Path(tablePath, "_change_data")
    fs.mkdirs(cdcDir)
    val actions = parts.zipWithIndex.map { case (part, i) =>
      val name = f"_change_data/cdc-$i%05d-$runId.parquet"
      val dest = new Path(tablePath, name)
      require(fs.rename(part, dest), s"rename failed: $part -> $dest")
      val size = fs.getFileStatus(dest).getLen
      s"""{"cdc":{"path":"$name","partitionValues":{},"size":$size,"dataChange":false}}"""
    }.toSeq
    fs.delete(staging, true)
    actions
  }

  private def typed(df: DataFrame, kind: String): DataFrame =
    df.withColumn("_change_type", lit(kind))

  /** DELETE FROM: drop rows where `condition` is TRUE (null/false rows
    * stay — the SQL three-valued contract). Only files containing a
    * match are rewritten; no match is a metadata no-op. Returns
    * (committed version, rows deleted). */
  def delete(spark: SparkSession, tablePath: String,
             condition: Column): (Long, Long) = {
    val (schema, files, current, tableConf) = dmlState(spark, tablePath)
    if (files.isEmpty) return (current, 0L)
    val scan = spark.read.schema(schema).parquet(files.map(_._2): _*)
    val affected = affectedOf(
      scan.filter(condition).select(fileCol.as("__g_file")), files)
    if (affected.isEmpty) return (current, 0L)

    // persisted like update()/dvDml: the affected-file scan feeds the
    // count, the keeper rewrite, and (with CDF) the delete images —
    // up to three rescans (and three condition evaluations) otherwise
    val aff = spark.read.schema(schema)
      .parquet(affected.map(absolute(tablePath, _)): _*).persist()
    try { // finally-unpersist: a stage/commit failure must not leak the cache
      val hit = coalesce(condition.cast(BooleanType), lit(false))
      val deleted = aff.filter(hit).count()
      val version = current + 1
      val adds = stageAdds(aff.filter(!hit), tablePath, version,
        dataChange = true)
      val cdc =
        if (cdfEnabled(spark, tableConf))
          stageCdc(typed(aff.filter(hit), "delete"), tablePath, version)
        else Nil
      DeltaLogReader.writeCommit(spark, tablePath, version,
        ci("DELETE") +: (removeActions(affected) ++ adds ++ cdc))
      (version, deleted)
    } finally aff.unpersist()
  }

  /** DELETE FROM writing DELETION VECTORS instead of rewriting files —
    * delta-spark's default delete shape once the table enables the
    * feature: each affected file is re-added UNCHANGED with a
    * `deletionVector` descriptor naming its dead positions, so write
    * cost is O(deleted positions), not O(affected file bytes) — on a
    * wide file with three matching rows, COW rewrites the file, this
    * writes ~a dozen bitmap bytes.
    *
    * Spec shape (PROTOCOL.md §Deletion Vectors + §Writer Requirements):
    *  - the new DV for a file MERGES the file's existing DV (replacement
    *    vectors must carry all previously deleted positions);
    *  - rows already dead under an existing DV neither re-count nor
    *    re-emit CDF;
    *  - the commit re-adds the data file with the new descriptor and
    *    removes the old add, under a protocol action declaring
    *    readerVersion 3 / writerVersion 7 with the deletionVectors
    *    feature.
    *
    * Distribution: matching runs on executors over `_metadata`
    * row indexes; existing bitmaps expand on executors; DV FILES are
    * written from executors (one per shuffle partition, UUID-named so
    * direct writes are collision-free); the driver handles only file
    * lists and blob descriptors. Returns (version, rows deleted). */
  def deleteDv(spark: SparkSession, tablePath: String,
               condition: Column): (Long, Long) =
    dvDml(spark, tablePath, condition, None)

  /** UPDATE ... SET via deletion vectors — delta-spark's merge-on-read
    * update: the matched rows' OLD versions die under a merged
    * replacement DV (their files re-added unchanged), the NEW versions
    * append as ordinary data files. Write cost is O(matched rows), not
    * O(affected file bytes) — [[update]]'s COW rewrite cost. Returns
    * (version, rows updated). */
  def updateDv(spark: SparkSession, tablePath: String, condition: Column,
               set: Map[String, Column]): (Long, Long) = {
    require(set.nonEmpty, "UPDATE: empty SET clause")
    dvDml(spark, tablePath, condition, Some(set))
  }

  /** The shared DV DML engine: kill the visible matched rows under
    * merged replacement DVs; with `set`, also append the rewritten
    * versions (UPDATE), else it is a DELETE. */
  private def dvDml(spark: SparkSession, tablePath: String,
                    condition: Column,
                    set: Option[Map[String, Column]]): (Long, Long) = {
    import spark.implicits._
    val (schema, partCols, files) = DeltaLogReader.activeStateDv(spark, tablePath)
    set.foreach { s =>
      val bad = s.keySet.filterNot(schema.fieldNames.contains)
      require(bad.isEmpty, s"UPDATE: unknown column(s) ${bad.mkString(", ")}")
    }
    require(partCols.isEmpty,
      s"DML on partitioned Delta table not supported: $tablePath")
    require(schema.fields.forall(f => !f.metadata.contains(PhysKey)),
      s"DML on column-mapped Delta table not supported: $tablePath")
    val tableConf = writerGate(spark, tablePath, schema, removesRows = true)
    val current = (DeltaLogReader.tableVersions(spark, tablePath) ++
      DeltaLogReader.lastCheckpointVersion(spark, tablePath)).max
    if (files.isEmpty) return (current, 0L)
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val relOf: Map[String, String] = files.map { case (rel, _, _) =>
      encNorm(absolute(tablePath, rel)) -> rel
    }.toMap
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))

    // existing DV positions, expanded on executors → (normAbsFile, pos)
    val withDv = files.collect { case (rel, _, Some(d)) => (rel, d) }
    val tp = tablePath
    def dvRows(restrict: Set[String]): DataFrame =
      spark.createDataset(withDv.filter { case (rel, _) =>
          restrict.isEmpty || restrict(rel) })
        .repartition(math.max(1, math.min(withDv.size,
          spark.sparkContext.defaultParallelism)))
        .flatMap { case (rel, d) =>
          DeletionVectors.readPositions(d, tp, confBc.value.value)
            .map(pos => (rel, pos))
        }.toDF("__g_rel", "__g_pos")

    // visible matched rows: condition TRUE, not already dead under a DV
    val scan = spark.read.schema(schema)
      .parquet(files.map(f => absolute(tablePath, f._1)): _*)
    val hit = coalesce(condition.cast(BooleanType), lit(false))
    val relLookup = broadcast(relOf.toSeq.toDF("__g_file", "__g_rel"))
    var matched = scan.filter(hit)
      .withColumn("__g_file", fileCol)
      .withColumn("__g_pos", col("_metadata.row_index"))
      .join(relLookup, Seq("__g_file"))
    if (withDv.nonEmpty)
      matched = matched.join(dvRows(Set.empty), Seq("__g_rel", "__g_pos"), "left_anti")
    // up to five downstream jobs consume `matched` (count, affected set,
    // DV write, UPDATE re-adds, CDC) — persist so the data-file scan and
    // the existing-DV expansion run once, not per job
    matched = matched.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try { // finally-unpersist: a failure mid-commit must not leak the cache
      val deleted = matched.count()
      if (deleted == 0) return (current, 0L) // finally unpersists
      val affected = matched.select("__g_rel").distinct()
        .as[String].collect().toSeq.sorted
      val version = current + 1

      // new DV per affected file = visible matches ∪ its existing DV
      var positions = matched.select(col("__g_rel"), col("__g_pos"))
      val affectedWithDv = withDv.collect {
        case (rel, _) if affected.contains(rel) => rel }.toSet
      if (affectedWithDv.nonEmpty)
        positions = positions.unionByName(dvRows(affectedWithDv))
      val dvDescs: Map[String, DeletionVectors.DvDescriptor] =
        positions.repartition(col("__g_rel"))
          .sortWithinPartitions("__g_rel", "__g_pos")
          .as[(String, Long)]
          .mapPartitions { it =>
            if (!it.hasNext) Iterator.empty
            else {
              val groups = scala.collection.mutable.LinkedHashMap
                .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
              it.foreach { case (rel, pos) =>
                groups.getOrElseUpdate(rel,
                  scala.collection.mutable.ArrayBuffer[Long]()) += pos
              }
              DeletionVectors.writeDvFileConf(confBc.value.value, tp,
                groups.toSeq.map { case (rel, ps) => (rel, ps.toSeq) }).iterator
            }
          }.collect().toMap // metadata-scale: one descriptor per file

      // commit: protocol w/ the DV feature, remove+re-add per affected file
      val readds = affected.map { rel =>
        val size = fs.getFileStatus(new Path(absolute(tablePath, rel))).getLen
        s"""{"add":{"path":"$rel","partitionValues":{},"size":$size,""" +
          s""""modificationTime":0,"dataChange":true${dvJson(Some(dvDescs(rel)))}}}"""
      }
      // UPDATE: the rewritten row versions append as new data files
      def rewritten(s: Map[String, Column]): DataFrame =
        matched.select(schema.fields.toSeq.map { f =>
          s.get(f.name) match {
            case Some(e) => e.cast(f.dataType).as(f.name)
            case None    => col(f.name).as(f.name)
          }
        }: _*)
      val updAdds = set match {
        case Some(s) => stageAdds(rewritten(s), tablePath, version, dataChange = true)
        case None    => Nil
      }
      val cdc =
        if (cdfEnabled(spark, tableConf)) set match {
          case None => stageCdc(
            typed(matched.select(schema.fieldNames.map(col).toSeq: _*),
              "delete"), tablePath, version)
          case Some(s) => stageCdc(
            typed(matched.select(schema.fieldNames.map(col).toSeq: _*),
                "update_preimage")
              .unionByName(typed(rewritten(s), "update_postimage")),
            tablePath, version)
        }
        else Nil
      // MERGE the DV feature into the existing protocol — replacing it
      // wholesale would drop features other writers declared (features are
      // never removed, versions never lowered)
      val (pr, pw, rf, wf) = DeltaLogReader.protocolInfo(spark, tablePath)
      // PROTOCOL.md: upgrading a LEGACY protocol to table features must
      // ENUMERATE every feature the old versions implied — dropping them
      // made delta-spark stop enforcing invariants and stop emitting CDF
      val impliedWriter: Set[String] =
        (if (pw >= 2) Set("appendOnly", "invariants") else Set.empty[String]) ++
          (if (pw >= 3) Set("checkConstraints") else Set.empty) ++
          (if (pw >= 4) Set("changeDataFeed", "generatedColumns") else Set.empty) ++
          (if (pw >= 5) Set("columnMapping") else Set.empty) ++
          (if (pw >= 6) Set("identityColumns") else Set.empty)
      val impliedReader: Set[String] =
        if (pr >= 2) Set("columnMapping") else Set.empty
      // only legacy (pre-table-features) protocols imply anything; a v7
      // table already lists its features explicitly in wf/rf
      val wfAll = wf ++ (if (pw < 7) impliedWriter else Set.empty)
      val rfAll = rf ++ (if (pr < 3) impliedReader else Set.empty)
      def fj(s: Set[String]) = (s + "deletionVectors").toSeq.sorted
        .map(f => s""""$f"""").mkString("[", ",", "]")
      val protocol =
        s"""{"protocol":{"minReaderVersion":${math.max(pr, 3)},""" +
          s""""minWriterVersion":${math.max(pw, 7)},""" +
          s""""readerFeatures":${fj(rfAll)},"writerFeatures":${fj(wfAll)}}}"""
      val dvByRel = files.map(f => f._1 -> f._3).toMap
      DeltaLogReader.writeCommit(spark, tablePath, version,
        Seq(ci(if (set.isDefined) "UPDATE" else "DELETE"), protocol) ++
          removeActions(affected, dvByRel.getOrElse(_, None)) ++
          readds ++ updAdds ++ cdc)
      (version, deleted)
    } finally matched.unpersist()
  }

  /** UPDATE ... SET: rewrite rows where `condition` is TRUE with the
    * `set` expressions (target-column -> new value, cast to the
    * column's type); other rows in affected files carry through
    * unchanged. Returns (committed version, rows updated). */
  def update(spark: SparkSession, tablePath: String, condition: Column,
             set: Map[String, Column]): (Long, Long) = {
    val (schema, files, current, tableConf) = dmlState(spark, tablePath)
    val bad = set.keySet.filterNot(schema.fieldNames.contains)
    require(bad.isEmpty, s"UPDATE: unknown column(s) ${bad.mkString(", ")}")
    require(set.nonEmpty, "UPDATE: empty SET clause")
    if (files.isEmpty) return (current, 0L)
    val scan = spark.read.schema(schema).parquet(files.map(_._2): _*)
    val affected = affectedOf(
      scan.filter(condition).select(fileCol.as("__g_file")), files)
    if (affected.isEmpty) return (current, 0L)

    // persisted: the affected-file scan feeds the count, the rewrite,
    // and (with CDF) the pre+post images — up to four rescans otherwise
    val aff = spark.read.schema(schema)
      .parquet(affected.map(absolute(tablePath, _)): _*).persist()
    try { // finally-unpersist: a stage/commit failure must not leak the cache
      val hit = coalesce(condition.cast(BooleanType), lit(false))
      val updated = aff.filter(hit).count()
      val rewritten = aff.select(schema.fields.toSeq.map { f =>
        set.get(f.name) match {
          case Some(e) =>
            when(hit, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
      val version = current + 1
      val adds = stageAdds(rewritten, tablePath, version, dataChange = true)
      val cdc =
        if (cdfEnabled(spark, tableConf)) {
          val pre = typed(aff.filter(hit), "update_preimage")
          val post = typed(aff.filter(hit).select(schema.fields.toSeq.map { f =>
            set.get(f.name) match {
              case Some(e) => e.cast(f.dataType).as(f.name)
              case None    => col(f.name)
            }
          }: _*), "update_postimage")
          stageCdc(pre.unionByName(post), tablePath, version)
        } else Nil
      DeltaLogReader.writeCommit(spark, tablePath, version,
        ci("UPDATE") +: (removeActions(affected) ++ adds ++ cdc))
      (version, updated)
    } finally aff.unpersist()
  }

  /** ALTER TABLE ... ADD COLUMNS: commit a new metaData action whose
    * schema appends `cols` (forced nullable — existing files have no
    * values for them, so reads null-fill, the Delta evolution
    * contract). Metadata-only: no file is touched. Returns the new
    * version. */
  def addColumns(spark: SparkSession, tablePath: String,
                 cols: StructType): Long = {
    val (schema, partCols, _) = DeltaLogReader.activeState(spark, tablePath)
    require(schema.fields.forall(f => !f.metadata.contains(PhysKey)),
      s"ADD COLUMNS on column-mapped Delta table not supported: $tablePath")
    writerGate(spark, tablePath, schema, removesRows = false)
    val existing = schema.fieldNames.map(_.toLowerCase).toSet
    cols.fieldNames.foreach(c => require(!existing.contains(c.toLowerCase),
      s"ADD COLUMNS: column '$c' already exists in $tablePath"))
    val newSchema = StructType(
      schema.fields ++ cols.fields.map(_.copy(nullable = true)))
    val version = (DeltaLogReader.tableVersions(spark, tablePath) ++
      DeltaLogReader.lastCheckpointVersion(spark, tablePath)).max + 1
    DeltaLogReader.writeCommit(spark, tablePath, version,
      { val (metaId, metaConf) = DeltaLogReader.currentMetaInfo(spark, tablePath)
        Seq(ci("ADD COLUMNS"),
          DeltaLogReader.metaDataAction(newSchema, partCols, metaId, metaConf)) })
    version
  }

  /** VACUUM: physically delete data files no longer referenced by the
    * CURRENT version and last-touched before `now - retainMs` — the
    * delta-spark maintenance command that actually reclaims space after
    * DELETE/UPDATE/OPTIMIZE rewrites (their removes are logical until
    * vacuumed). Time travel to versions whose files are reclaimed stops
    * working, exactly as in delta-spark. Only `*.parquet` outside
    * `_delta_log` is candidate — the log itself (json, checkpoints,
    * sidecars) is never touched. Returns the number of files deleted. */
  def vacuum(spark: SparkSession, tablePath: String,
             retainMs: Long = 7L * 24 * 3600 * 1000): Long = {
    val (_, _, files) = DeltaLogReader.activeStateDv(spark, tablePath)
    // live set = active data files + the DV .bin files their descriptors
    // reference (a DV-heavy table sheds a superseded vector per commit —
    // they reclaim here like data files do)
    // encNorm both sides: the log path decodes to the on-disk name, and
    // the listed FileStatus paths re-encode the same way — a live file
    // whose name percent-encodes must never look dead to vacuum
    val live = files.flatMap { case (p, _, dv) =>
      encNorm(absolute(tablePath, p)) +:
        dv.filter(_.storageType != "i").map(d =>
          encNorm(d.filePath(tablePath))).toSeq
    }.toSet
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - retainMs
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (s.isDirectory) {
          if (n == "_delta_log" || n.startsWith("_staging") || n.startsWith("."))
            Nil
          else walk(s.getPath)
        } else if ((n.endsWith(".parquet") ||
            (n.startsWith("deletion_vector_") && n.endsWith(".bin"))) &&
            !n.startsWith("_") && !n.startsWith(".")) Seq(s)
        else Nil
      }
    val dead = walk(root).filter { s =>
      val norm = encNorm(s.getPath.toString)
      !live.contains(norm) && s.getModificationTime <= cutoff
    }
    // a big vacuum (a compacted 100 TB table sheds millions of files)
    // deletes from EXECUTORS — per-file RPCs parallelize; the driver
    // only ships the path list
    if (dead.size > 256) {
      val c = spark.sparkContext.hadoopConfiguration
      val fsProps: Seq[(String, String)] =
        c.iterator().asScala.map(e => e.getKey -> e.getValue)
          .filter(_._1.startsWith("fs.")).toSeq
      spark.sparkContext
        .parallelize(dead.map(_.getPath.toString),
          math.min(64, 1 + dead.size / 256))
        .foreach { s =>
          val conf = new org.apache.hadoop.conf.Configuration()
          fsProps.foreach { case (k, v) => conf.set(k, v) }
          val p = new Path(s)
          p.getFileSystem(conf).delete(p, false)
        }
    } else dead.foreach(s => fs.delete(s.getPath, false))
    dead.size.toLong
  }

  /** RESTORE TABLE ... TO VERSION AS OF `toVersion`: one commit whose
    * adds/removes flip the current file set back to the target
    * version's (files present in both carry untouched); the target
    * version's schema is re-emitted so later reads see it. History is
    * preserved — the restore is itself a new version, and the versions
    * in between remain time-travelable (delta-spark RESTORE semantics).
    * Returns (new version, files added back, files removed). */
  def restore(spark: SparkSession, tablePath: String,
              toVersion: Long): (Long, Long, Long) = {
    val (tSchema, tPartCols, tFilesSized) =
      DeltaLogReader.snapshotStateDvSized(spark, tablePath, Some(toVersion))
    val tFiles = tFilesSized.map { case (p0, pv, dv, _, _) => (p0, pv, dv) }
    val logSize = tFilesSized.map { case (p0, _, _, sz, _) => p0 -> sz }.toMap
    val (cSchema, _, cFiles) = DeltaLogReader.snapshotStateDv(spark, tablePath, None)
    writerGate(spark, tablePath, cSchema, removesRows = true)
    val current = (DeltaLogReader.tableVersions(spark, tablePath) ++
      DeltaLogReader.lastCheckpointVersion(spark, tablePath)).max
    require(toVersion <= current,
      s"RESTORE: version $toVersion is beyond current $current")
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a path whose DV differs between current and target must RE-ADD
    // with the target's descriptor (replay: last add per path wins)
    val curState = cFiles.map(f => f._1 -> f._3).toMap
    val tgt = tFiles.map(_._1).toSet
    // full JSON string escaping (backslashes, control chars — the
    // quote-only escape could write an UNPARSEABLE commit and brick the
    // log after a successful RESTORE); null partition values stay null
    def pvJson(pv: Map[String, String]): String = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = m.createObjectNode()
      pv.foreach { case (k, v) =>
        if (v == null) n.putNull(k) else n.put(k, v) }
      m.writeValueAsString(n)
    }
    val adds = tFiles.filterNot(f => curState.get(f._1).contains(f._3))
      .map { case (p, pv, dv) =>
        val abs = new Path(absolute(tablePath, p))
        require(fs.exists(abs),
          s"RESTORE: file $p of version $toVersion was vacuumed — " +
            "cannot restore past a vacuum boundary")
        // the target version's DELETION VECTORS must exist too: a
        // superseded DV's bin is vacuum-bait, and re-adding its
        // descriptor committed a table whose every read then crashed
        dv.filter(_.storageType != "i").foreach { d =>
          require(fs.exists(new Path(d.filePath(tablePath))),
            s"RESTORE: deletion vector of $p (version $toVersion) was " +
              "vacuumed — cannot restore past a vacuum boundary")
        }
        // size from the LOG (snapshotStateDvSized exists so maintenance
        // passes need not stat 100k files); -1 = legacy action without
        // a recorded size, stat that file only
        val size = logSize.get(p).filter(_ >= 0)
          .getOrElse(fs.getFileStatus(abs).getLen)
        s"""{"add":{"path":"$p","partitionValues":${pvJson(pv)},"size":$size,"modificationTime":0,"dataChange":true${dvJson(dv)}}}"""
      }
    // a path live in BOTH versions with a DIFFERENT DV re-adds with the
    // target's descriptor below; under the spec's (path, dvUniqueId)
    // identity the old pair must ALSO be removed or it stays live for a
    // spec-keyed replay (our own path-keyed replay applies the commit's
    // lines in order, so remove-then-re-add lands on the add)
    val dvChanged =
      tFiles.filter(f => curState.get(f._1).exists(_ != f._3)).map(_._1)
    val removes = removeActions(
      cFiles.map(_._1).filterNot(tgt.contains) ++ dvChanged,
      curState.getOrElse(_, None))
    val version = current + 1
    val (metaId, metaConf) = DeltaLogReader.currentMetaInfo(spark, tablePath)
    DeltaLogReader.writeCommit(spark, tablePath, version,
      ci("RESTORE") +: DeltaLogReader.metaDataAction(tSchema, tPartCols,
        metaId, metaConf) +: (removes ++ adds))
    (version, adds.size.toLong, removes.size.toLong)
  }

  /** MERGE INTO target USING source ON `on` — the three-clause form:
    *
    *  - `matchedDelete`: WHEN MATCHED [AND cond] THEN DELETE — SQL
    *    condition over `tAlias`/`sAlias` columns ("true" = every match).
    *    Evaluated BEFORE the update clause (the common
    *    delete-then-update clause order).
    *  - `matchedUpdate`: WHEN MATCHED THEN UPDATE SET — target column ->
    *    SQL expression over `tAlias`/`sAlias`.
    *  - `notMatchedInsert`: WHEN NOT MATCHED THEN INSERT — target
    *    column -> SQL expression over `sAlias`; unlisted columns insert
    *    NULL.
    *
    * Matching rows can only live in files the ON-join touches, so the
    * NOT MATCHED anti-join runs against affected-file rows, not the
    * whole table — at 100 TB the source joins against the slice it can
    * match, never the full scan twice. When a matched clause is present
    * the ambiguity check errors if any target row matches more than one
    * source row (the delta-spark `DELTA_MULTIPLE_SOURCE_ROW_MATCHING...`
    * contract — applying two updates to one row is nondeterministic).
    * An insert-only merge (no matched clause) rewrites nothing: it
    * appends the anti-joined source rows as a plain add-only commit.
    *
    * `bySourceDelete`/`bySourceUpdate` are delta-spark's `WHEN NOT
    * MATCHED BY SOURCE` clauses (CDC reconciliation: target rows whose
    * key vanished from the source get deleted or flagged). A by-source
    * clause inherently touches EVERY file — any file can hold a row
    * with no source match — so the pruning scan is skipped and the
    * whole table rewrites, which is what delta-spark does too. */
  def merge(spark: SparkSession, tablePath: String, source: DataFrame,
            on: String,
            matchedUpdate: Option[Map[String, String]] = None,
            matchedDelete: Option[String] = None,
            notMatchedInsert: Option[Map[String, String]] = None,
            matchedUpdateCond: Option[String] = None,
            notMatchedInsertCond: Option[String] = None,
            tAlias: String = "t", sAlias: String = "s",
            bySourceDelete: Option[String] = None,
            bySourceUpdate: Option[Map[String, String]] = None,
            bySourceUpdateCond: Option[String] = None): DmlStats = {
    val anyBySource = bySourceDelete.isDefined || bySourceUpdate.isDefined
    require(matchedUpdate.isDefined || matchedDelete.isDefined ||
      notMatchedInsert.isDefined || anyBySource, "MERGE: no clauses")
    // an INSERT-ONLY merge commits no removes — delta-spark permits it
    // on delta.appendOnly=true tables, and removesRows=true refused it
    val (schema, files, current, tableConf) = dmlState(spark, tablePath,
      removesRows = matchedUpdate.isDefined || matchedDelete.isDefined ||
        anyBySource)
    val cdfOn = cdfEnabled(spark, tableConf)
    (matchedUpdate.toSeq ++ bySourceUpdate.toSeq).foreach { m =>
      val bad = m.keySet.filterNot(schema.fieldNames.contains)
      require(bad.isEmpty,
        s"MERGE UPDATE: unknown column(s) ${bad.mkString(", ")}")
    }
    notMatchedInsert.foreach { m =>
      val bad = m.keySet.filterNot(schema.fieldNames.contains)
      require(bad.isEmpty,
        s"MERGE INSERT: unknown column(s) ${bad.mkString(", ")}")
    }
    val onExpr = expr(on)
    val anyMatched = matchedUpdate.isDefined || matchedDelete.isDefined

    val tgtAll =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.map(_._2): _*)

    // pruning join: which live files hold a matched row (a by-source
    // clause reaches every file, so pruning is moot)
    val affected =
      if (files.isEmpty) Seq.empty[String]
      else if (anyBySource) files.map(_._1)
      // insert-only MERGE: nothing rewrites and the insert anti-join
      // runs against the WHOLE table — the pruning scan+join's result
      // was computed and thrown away (a second full-table pass at scale)
      else if (!anyMatched) Seq.empty[String]
      else affectedOf(
        tgtAll.withColumn("__g_file", fileCol).as(tAlias)
          .join(source.as(sAlias), onExpr, "inner")
          .select(col("__g_file")), files)

    val affAbs = affected.map(absolute(tablePath, _))
    def affScan: DataFrame = spark.read.schema(schema).parquet(affAbs: _*)
    var persisted: Option[DataFrame] = None

    // ambiguity check (only when a matched clause will rewrite rows):
    // (file, row_index) is the stable row identity
    if (anyMatched && affected.nonEmpty) {
      val multi = affScan
        .withColumn("__g_fp", col("_metadata.file_path"))
        .withColumn("__g_pos", col("_metadata.row_index"))
        .as(tAlias)
        .join(source.as(sAlias), onExpr, "inner")
        .groupBy(col("__g_fp"), col("__g_pos")).count()
        .filter(col("count") > 1).limit(1).count()
      require(multi == 0,
        "MERGE: a target row matched multiple source rows — the update " +
          "is nondeterministic (same check as delta-spark)")
    }

    val version = current + 1
    var updated = 0L
    var deleted = 0L
    var cdcParts: Seq[DataFrame] = Nil

    // rewrite affected files (matched + by-source clauses applied,
    // untouched rows carried through)
    val rewritten: Option[DataFrame] =
      if (!(anyMatched || anyBySource) || affected.isEmpty) None
      else {
        val srcM = source.withColumn("__g_match", lit(true))
        val joined0 = affScan
          .withColumn("__g_fp", col("_metadata.file_path"))
          .withColumn("__g_pos", col("_metadata.row_index"))
          .as(tAlias).join(srcM.as(sAlias), onExpr, "left_outer")
        // with only BY SOURCE clauses the join exists solely to flag
        // matched target rows — a multi-match fan-out is legal there but
        // must collapse back to one copy per target row (all copies carry
        // identical target columns and __g_match=true), else the rewrite
        // duplicates rows; with a matched clause the ambiguity check
        // below rejects multi-matches instead
        val joined =
          (if (anyMatched) joined0
           else joined0.dropDuplicates("__g_fp", "__g_pos"))
            // the target-source join feeds the ambiguity check, the
            // counts agg, the rewrite, and the cdc write — persist it
            // once (dvDml does the same) instead of re-running the
            // dominant scan+join up to five times
            .persist()
        persisted = Some(joined)
        val isMatch = coalesce(col("__g_match"), lit(false))
        def condOr(c: Option[String], default: Column): Column =
          c.map(s => coalesce(expr(s).cast(BooleanType), lit(false)))
            .getOrElse(default)
        val delCondM = matchedDelete.map(c =>
          isMatch && condOr(Some(c), lit(true))).getOrElse(lit(false))
        val updCondM =
          if (matchedUpdate.isDefined)
            isMatch && !delCondM && condOr(matchedUpdateCond, lit(true))
          else lit(false)
        // NOT MATCHED BY SOURCE: source columns are null here, so the
        // conditions sensibly reference only target columns
        val delCondBS = bySourceDelete.map(c =>
          !isMatch && condOr(Some(c), lit(true))).getOrElse(lit(false))
        val updCondBS =
          if (bySourceUpdate.isDefined)
            !isMatch && !delCondBS && condOr(bySourceUpdateCond, lit(true))
          else lit(false)
        val delCond = delCondM || delCondBS
        val counts = joined.agg(
          sum(when(updCondM || updCondBS, 1L).otherwise(0L)),
          sum(when(delCond, 1L).otherwise(0L))).collect()(0)
        updated = if (counts.isNullAt(0)) 0L else counts.getLong(0)
        deleted = if (counts.isNullAt(1)) 0L else counts.getLong(1)
        if (cdfOn) {
          val tCols = schema.fields.toSeq.map(f =>
            col(s"$tAlias.${f.name}").as(f.name))
          def post(set: Map[String, String], rows: DataFrame): DataFrame =
            rows.select(schema.fields.toSeq.map { f =>
              set.get(f.name) match {
                case Some(e) => expr(e).cast(f.dataType).as(f.name)
                case None    => col(s"$tAlias.${f.name}").as(f.name)
              }
            }: _*)
          cdcParts = Seq(
            typed(joined.filter(delCond).select(tCols: _*), "delete")) ++
            matchedUpdate.toSeq.flatMap { m =>
              val rows = joined.filter(updCondM)
              Seq(typed(rows.select(tCols: _*), "update_preimage"),
                typed(post(m, rows), "update_postimage"))
            } ++
            bySourceUpdate.toSeq.flatMap { m =>
              val rows = joined.filter(updCondBS)
              Seq(typed(rows.select(tCols: _*), "update_preimage"),
                typed(post(m, rows), "update_postimage"))
            }
        }
        Some(joined.filter(!delCond).select(schema.fields.toSeq.map { f =>
          val base = col(s"$tAlias.${f.name}")
          val withM = matchedUpdate.flatMap(_.get(f.name)) match {
            case Some(e) => when(updCondM, expr(e).cast(f.dataType))
            case None    => when(lit(false), base)
          }
          val withBS = bySourceUpdate.flatMap(_.get(f.name)) match {
            case Some(e) => withM.when(updCondBS, expr(e).cast(f.dataType))
            case None    => withM
          }
          withBS.otherwise(base).as(f.name)
        }: _*))
      }

    // NOT MATCHED inserts: anti-join against the rows a match could be
    // in — affected files when known, the whole table for insert-only
    // persisted: the anti-join feeds the count, the staged write, and
    // the cdc union — three executions of source-vs-table otherwise
    val inserts: Option[DataFrame] = notMatchedInsert.map { m =>
      val against = if (anyMatched) {
        if (affected.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else affScan
      } else tgtAll
      val anti = source.as(sAlias).join(against.as(tAlias), onExpr, "left_anti")
      notMatchedInsertCond
        .map(c => anti.filter(coalesce(expr(c).cast(BooleanType), lit(false))))
        .getOrElse(anti)
        .select(schema.fields.toSeq.map { f =>
          m.get(f.name) match {
            case Some(e) => expr(e).cast(f.dataType).as(f.name)
            case None    => lit(null).cast(f.dataType).as(f.name)
          }
        }: _*)
        .persist()
    }

    val out = (rewritten, inserts) match {
      case (Some(r), Some(i)) => Some(r.unionByName(i))
      case (Some(r), None)    => Some(r)
      case (None, Some(i))    => Some(i)
      case (None, None)       => None
    }
    try out match {
      case None => DmlStats(current, 0L, 0L, 0L)
      case Some(df) =>
        val inserted = inserts.map(_.count()).getOrElse(0L)
        if (updated == 0L && deleted == 0L && inserted == 0L)
          return DmlStats(current, 0L, 0L, 0L) // pure no-op: nothing to commit
        val adds = stageAdds(df, tablePath, version, dataChange = true)
        val removes = if (rewritten.isDefined) removeActions(affected)
                      else Seq.empty
        val cdc =
          if (cdfOn) {
            val all = cdcParts ++
              inserts.toSeq.map(i => typed(i, "insert"))
            all.reduceOption(_ unionByName _)
              .map(stageCdc(_, tablePath, version)).getOrElse(Nil)
          } else Nil
        DeltaLogReader.writeCommit(spark, tablePath, version,
          ci("MERGE") +: (removes ++ adds ++ cdc))
        DmlStats(version, updated, deleted, inserted)
    } finally { persisted.foreach(_.unpersist()); inserts.foreach(_.unpersist()) }
  }
}
