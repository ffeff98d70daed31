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

  /** COLUMNS across every visible table, one pass (ordinal per table). */
  def allColumns(spark: SparkSession): DataFrame = {
    val names = spark.catalog.listTables().collect().map(_.name)
    names.map(columns(spark, _)).reduceOption(_ unionAll _)
      .getOrElse(spark.emptyDataFrame)
  }
}
