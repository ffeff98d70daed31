package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

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
      // Non-UTC-adjusted parquet timestamps read as TIMESTAMP (session tz
      // is pinned UTC above), not TIMESTAMP_NTZ: one timestamp family
      // engine-wide, so literals/casts/arithmetic never hit LTZ-vs-NTZ
      // coercion errors and plans stay identical across testdata writers.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // Engine semantic, declared up front: a requested schema that
      // CARRIES parquet.field.id metadata matches file columns by FIELD
      // ID (what Delta column-mapping `id` and Iceberg readers mean by
      // their schemas); schemas without ids keep name matching. Only
      // graft's id-mode paths build such schemas.
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
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
      // JDBC front door (sources/JdbcEndpoint): deliberately NOT
      // singleSession — Spark's session manager force-sets
      // datetime.java8API.enabled on every connection open, which under
      // singleSession would silently flip Row timestamp types for every
      // other consumer of the live session. Per-connection newSession()
      // clones (Drill's per-connection model) share the catalog, GLOBAL
      // temp views, persistent views, and all graft extensions.

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Load one of the standard test tables from a scale-factor directory.
    *
    * events.ts contract: epoch-NANOS BIGINT. Early testdata generations
    * wrote parquet TIMESTAMP(NANOS) (surfacing as exactly that via
    * nanosAsLong); later ones write TIMESTAMP(MICROS). A timestamp-typed
    * ts is normalized back to nanos here (micros * 1000 — lossless), so
    * every time-domain operator and gate sees one representation
    * regardless of which generation wrote the files. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = readParquet(spark, s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema.exists(f => f.name == "ts" &&
          (f.dataType == TimestampType || f.dataType == TimestampNTZType)))
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
    else df
  }

  /** path -> (freshness stamp, inferred schema). SCHEMA METADATA only —
    * never rows, never results: every query still computes from the
    * parquet bytes. Plain `spark.read.parquet(p)` re-reads footers for
    * schema inference on EVERY DataFrame construction (~100 ms per call
    * measured on this host vs ~20 ms schema-supplied —
    * tools/ReadOverheadProbe); for the bench's sub-second tail that
    * inference IS a visible share of the wall (guide §1.2 step 3 /
    * VERDICT r16 item 6: fixed per-query overhead). The stamp covers the
    * file's (or directory's children's) names, mtimes and lengths, so a
    * regenerated table re-infers — and because inference happens under
    * the SAME session confs that shape it (nanosAsLong etc., pinned by
    * this builder), the memoized schema is exactly what inference would
    * return. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (String, org.apache.spark.sql.types.StructType)]()

  private def stampOf(path: String): String = {
    val f = new java.io.File(path)
    val base = s"${f.lastModified}:${f.length}"
    if (f.isDirectory) {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
        .map(k => s"${k.getName}:${k.lastModified}:${k.length}")
        .sorted.mkString("|")
      s"$base#${kids.length}:${kids.hashCode}"
    } else base
  }

  /** Schema-memoized parquet read of a stable table path (the `table()`
    * entry point and any other fixed-layout read). Multi-path reads key
    * the memo on the full path list + stamps (the iceberg delete-file
    * group shape: one schema across the group's files). */
  def readParquet(spark: SparkSession, path: String, more: String*): DataFrame = {
    val paths = path +: more
    val key = paths.mkString("")
    val stamp = paths.map(stampOf).mkString("")
    val cached = schemaMemo.get(key)
    val schema =
      if (cached != null && cached._1 == stamp) cached._2
      else {
        val s = spark.read.parquet(paths: _*).schema
        schemaMemo.put(key, (stamp, s))
        s
      }
    spark.read.schema(schema).parquet(paths: _*)
  }

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
