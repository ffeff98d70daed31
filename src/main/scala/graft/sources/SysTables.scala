package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Drill's `sys` schema re-expressed over the Spark runtime — the
  * introspection tables an operator actually queries (reference
  * exec/.../store/sys/: OptionIterator for sys.options, VersionIterator
  * for sys.version, DrillbitIterator for sys.drillbits). Plain
  * DataFrames, so they join/filter like any table.
  */
object SysTables {

  /** sys.options: every SQL conf the session exposes (Drill's
    * system/session option list). */
  def options(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.toSeq.sortBy(_._1).toDF("name", "value")
  }

  /** sys.version: engine build identity. */
  def version(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((spark.version, org.apache.spark.SPARK_VERSION_SHORT,
      scala.util.Properties.versionNumberString))
      .toDF("engine_version", "spark_version", "scala_version")
  }

  /** sys.bits (Drill's drillbit roster): the executor topology. On a real
    * cluster one row per executor; in local mode, the driver. */
  def bits(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    sc.statusTracker.getExecutorInfos.toSeq
      .map(e => (e.host(), e.port(), e.numRunningTasks()))
      .toDF("host", "port", "running_tasks")
  }

  /** sys.functions (Drill's function-registry listing, ref
    * exec/.../store/sys/FunctionsIterator.java): every function the
    * session resolves — Spark built-ins AND the graft-native kernels
    * injected by GraftExtensions — with its implementing class.
    * `graft_native` marks the kernels this library contributes. */
  def functions(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{col, lower}
    spark.catalog.listFunctions()
      .select(col("name"), col("className"), col("isTemporary"))
      .withColumn("graft_native",
        lower(col("className")).startsWith("graft."))
  }

  /** sys.memory: JVM heap posture of the driver (Drill reports per-bit
    * direct/heap; executors surface through bits + the Spark UI API). */
  def memory(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rt = Runtime.getRuntime
    Seq((rt.maxMemory(), rt.totalMemory(), rt.freeMemory()))
      .toDF("heap_max", "heap_total", "heap_free")
  }

  /** sys.threads (Drill's ThreadsIterator): live JVM threads of the
    * driver process, for the "is something wedged" operator question. */
  def threads(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    Thread.getAllStackTraces.keySet.asScala.toSeq
      .map(t => (t.getId, t.getName, t.getState.name, t.isDaemon, t.getPriority))
      .sortBy(_._1)
      .toDF("thread_id", "name", "state", "daemon", "priority")
  }

  /** sys.table_aliases / sys.storage_aliases (Drill's AliasesIterator,
    * ref store/sys/AliasesIterator.java): the persistent alias registry
    * as relations. */
  def tableAliases(spark: SparkSession): DataFrame =
    AliasRegistry.sysTable(spark, storage = false)
  def storageAliases(spark: SparkSession): DataFrame =
    AliasRegistry.sysTable(spark, storage = true)
}
