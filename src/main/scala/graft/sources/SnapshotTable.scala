package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned table on plain parquet — the capability surface of
  * Drill's table-format plugins (reference: contrib/format-iceberg
  * IcebergGroupScan snapshot reads, format-deltalake): immutable
  * versioned writes and time travel, without the external table-format
  * libraries (not present in this container). Layout:
  * `base/v=N/part-*.parquet`; the latest committed version is the highest
  * N whose directory write completed (parquet `_SUCCESS`).
  */
object SnapshotTable {

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed snapshot versions, ascending. */
  def versions(spark: SparkSession, base: String): Seq[Int] = {
    val f = fs(spark, base)
    val dir = new Path(base)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
      .sorted
  }

  /** Append a new immutable snapshot; returns its version id. The next
    * version counts over ALL v= directories, committed or not — a
    * crashed writer's uncommitted leftover must not wedge the table by
    * making every retry collide with the same errorifexists path
    * (versions() skips it, so reads stay clean either way). */
  def write(df: DataFrame, base: String): Int = {
    val f = fs(df.sparkSession, base)
    val dir = new Path(base)
    val all =
      if (!f.exists(dir)) Seq.empty[Int]
      else f.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toInt)
    val v = (all :+ 0).max + 1
    df.write.mode("errorifexists").parquet(s"$base/v=$v")
    v
  }

  /** Read a snapshot — latest by default, or time-travel to `version`. */
  def read(spark: SparkSession, base: String,
           version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"snapshot v=$v not found (have ${vs.mkString(",")})")
    spark.read.parquet(s"$base/v=$v")
  }
}
