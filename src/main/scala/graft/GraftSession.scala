package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's scale-oriented defaults.
  *
  * Mirrors the role of Drill's bootstrap options (reference:
  * exec/java-exec/src/main/resources/drill-module.conf) but expressed as
  * Spark SQL conf: AQE on (runtime re-plan ≈ Drill's parallelizer),
  * skew-join handling, broadcast threshold for dimension tables, and a
  * shuffle-partition count sized to the local core count (at cluster
  * scale this is 2-3x total cores + AQE coalesce).
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions) // native graft expressions
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // TIMESTAMP(NANOS) parquet columns (e.g. events.ts) surface as
      // BIGINT nanos — Spark has no ns timestamp type.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // Spark 4.1's checksum checkpoint manager awaits its writer pool
      // inside state-store commits and deadlocks under local[N] stateful
      // streaming; the classic rename-based manager is fine for us.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // The default FileContext manager shells out (readlink) on every
      // rename; JDK17's jspawnhelper intermittently deadlocks in this
      // container, hanging micro-batches. The FileSystem-based manager
      // stays in-process...
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      // ...and the local FS itself must not fork `chmod` per created file
      // (no native hadoop lib here) — see NioLocalFileSystem.
      .config("spark.hadoop.fs.file.impl", "graft.sources.NioLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Load one of the standard test tables from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Rebalance a (possibly few-split) input across the session's shuffle
    * parallelism before a fan-out-heavy stage (band/token explode, block
    * replication). Costs one narrow-data shuffle of the projected columns;
    * pays for itself whenever the upstream layout is skewed — a handful of
    * small local files here, a hot object-store prefix at 100 TB. Without
    * it, a 5 MB single-split parquet pins a 96M-row LSH band join to ONE
    * core (measured 43 s -> 4.5 s at sf0.1). */
  def balanced(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
}
