package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INFORMATION_SCHEMA-style catalog metadata — Drill's ischema storage
  * plugin (reference: exec/.../store/ischema/InfoSchemaTable.java:
  * CATALOGS, SCHEMATA, `TABLES`, COLUMNS, VIEWS) expressed over the Spark
  * catalog. Results are plain DataFrames, so the metadata joins/filters
  * like any table — exactly how Drill users query INFORMATION_SCHEMA.
  */
object GraftCatalog {

  /** INFORMATION_SCHEMA.CATALOGS */
  def catalogs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listCatalogs().map(c => c.name).toDF("catalog_name")
  }

  /** INFORMATION_SCHEMA.SCHEMATA */
  def schemata(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases()
      .map(d => (d.name, d.catalog, d.locationUri))
      .toDF("schema_name", "catalog_name", "location")
  }

  /** INFORMATION_SCHEMA.`TABLES` (temp views included, like Drill's
    * session-scoped tables). */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables()
      .map(t => (Option(t.database).getOrElse(""), t.name, t.tableType, t.isTemporary))
      .toDF("table_schema", "table_name", "table_type", "is_temporary")
  }

  /** INFORMATION_SCHEMA.COLUMNS for one table/view. */
  def columns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    spark.catalog.listColumns(table)
      .map(c => (table, c.name, c.dataType, c.nullable, c.isPartition))
      .toDF("table_name", "column_name", "data_type", "is_nullable", "is_partition")
  }

  /** COLUMNS across every visible table, one pass (ordinal per table).
    * Catalog tables resolve DATABASE-QUALIFIED: with a temp view
    * shadowing a same-named table, the bare name resolved to the view
    * twice and the table's columns never appeared. */
  def allColumns(spark: SparkSession): DataFrame = {
    val names = spark.catalog.listTables().collect()
      .map(t => Option(t.database).filter(_.nonEmpty)
        .map(db => s"$db.${t.name}").getOrElse(t.name))
      .distinct
    names.map(columns(spark, _)).reduceOption(_ unionAll _)
      .getOrElse(spark.emptyDataFrame)
  }

  /** INFORMATION_SCHEMA.FILES (Drill 1.15, ref store/ischema
    * RecordCollector.Files + the `storage.list_files_recursively`
    * option): one row per file/directory under each registered dfs
    * workspace. Listing is driver-side FS metadata (the same walk
    * Drill's schema tree does) — bounded by the workspace's direct
    * listing unless `recursive`. */
  def files(spark: SparkSession, recursive: Boolean = false): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    // canonical registry (DfsSql.workspaces); root excluded — listing
    // the whole filesystem as a "workspace" is never useful here
    val rows = DfsSql.workspaces(spark)
      .filterNot(_._1 == "root").flatMap { case (ws, dir) =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else {
        // one unreadable subdirectory (permissions, vanished mid-walk)
        // must not fail the whole catalog query — skip it; a depth bound
        // keeps the recursive walk over e.g. the implicit tmp workspace
        // finite even across symlink cycles
        val maxDepth = 32
        def list(d: org.apache.hadoop.fs.Path, depth: Int):
            Seq[org.apache.hadoop.fs.FileStatus] = {
          val st =
            try fs.listStatus(d).toSeq
            catch { case _: java.io.IOException => Nil }
          if (recursive && depth < maxDepth)
            st ++ st.filter(_.isDirectory).flatMap(s => list(s.getPath, depth + 1))
          else st
        }
        list(p, 0).map { st =>
          val rel = st.getPath.toString.stripPrefix(
            fs.makeQualified(p).toString).stripPrefix("/")
          (s"dfs.$ws", ws, st.getPath.getName, rel, st.isDirectory,
            !st.isDirectory, st.getLen,
            new java.sql.Timestamp(st.getModificationTime))
        }
      }
    }
    rows.toDF("schema_name", "workspace_name", "file_name", "relative_path",
      "is_directory", "is_file", "length", "modification_time")
  }
}
