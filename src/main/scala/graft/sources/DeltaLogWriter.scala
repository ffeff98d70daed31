package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Delta Lake WRITE path (CTAS / INSERT / overwrite), hand-rolled like
  * the reader: data lands as ordinary parquet part files, then one JSON
  * commit in `_delta_log/` publishes them atomically (add actions; an
  * overwrite also emits remove actions for the previous snapshot). The
  * commit file IS the transaction: readers replaying the log never see
  * a half-written version because the rename that publishes the commit
  * is the last step. Reference surface: Drill writes Delta via the same
  * log-append protocol (contrib/format-deltalake); protocol per
  * github.com/delta-io/delta PROTOCOL.md.
  *
  * The parquet write itself is the normal distributed writer (any
  * parallelism); only the KB-scale log append is driver-side —
  * identical posture to every Delta implementation.
  */
object DeltaLogWriter {

  /** Write `df` to `tablePath` as a new Delta commit. Append creates the
    * table when absent; Overwrite replaces the current snapshot. Returns
    * the committed version. `txn` (appId, version) adds a transaction
    * action to the commit — the Delta protocol's idempotence mechanism:
    * a writer replaying work (e.g. a restarted streaming batch) checks
    * [[lastTxnVersion]] before re-committing. */
  def write(df: DataFrame, tablePath: String,
            mode: SaveMode = SaveMode.Append,
            txn: Option[(String, Long)] = None): Long = {
    require(mode == SaveMode.Append || mode == SaveMode.Overwrite,
      s"delta write supports Append/Overwrite, got $mode")
    val spark = df.sparkSession
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new Path(tablePath, "_delta_log"))
    val (version, removes) =
      if (!exists) (0L, Seq.empty[String])
      else {
        val versions = DeltaLogReader.tableVersions(spark, tablePath)
        val next = versions.last + 1
        val toRemove =
          if (mode == SaveMode.Overwrite)
            DeltaLogReader.activeFiles(spark, tablePath)
          else Seq.empty
        (next, toRemove)
      }

    // stage the parquet parts, then move each into the table root under
    // a version-scoped unique name (Delta data files are flat siblings)
    val staging = new Path(tablePath, s"_staging_v$version")
    df.write.mode("overwrite").parquet(staging.toString)
    val parts = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val adds = parts.zipWithIndex.map { case (part, i) =>
      val name = f"part-$i%05d-v$version.parquet"
      val dest = new Path(tablePath, name)
      fs.delete(dest, false)
      require(fs.rename(part, dest), s"rename failed: $part -> $dest")
      val size = fs.getFileStatus(dest).getLen
      s"""{"add":{"path":"$name","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}"""
    }.toSeq
    fs.delete(staging, true)

    val head =
      if (!exists) Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        DeltaLogReader.metaDataAction(df.schema, Nil))
      else Seq.empty
    val removeActions = removes.map(p =>
      s"""{"remove":{"path":"$p","deletionTimestamp":0,"dataChange":true}}""")
    val txnActions = txn.toSeq.map { case (appId, v) =>
      s"""{"txn":{"appId":"$appId","version":$v}}"""
    }
    DeltaLogReader.writeCommit(spark, tablePath, version,
      head ++ txnActions ++ removeActions ++ adds)
    version
  }

  /** Highest committed txn version for `appId` (Delta `txn` actions),
    * or None if the app never committed — the restart check for
    * idempotent/streaming writers. */
  def lastTxnVersion(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String, appId: String): Option[Long] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(tablePath, "_delta_log"))) return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val versions = DeltaLogReader.tableVersions(spark, tablePath)
    val txns = versions.flatMap { v =>
      val p = new Path(new Path(tablePath, "_delta_log"), f"$v%020d.json")
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines.filter(_.contains("\"txn\"")).flatMap { line =>
        val n = mapper.readTree(line)
        Option(n.get("txn"))
          .filter(_.get("appId").asText == appId)
          .map(_.get("version").asLong)
      }
    }
    txns.maxOption
  }
}
