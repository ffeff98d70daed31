package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Every `queries` key has a DuckDB `oracleSql` unless the
  * op is not SQL-expressible (those are covered in ScalaTest).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesRelational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesFunctions.queries ++
      QueriesPipeline.queries ++ QueriesSources.queries

  def oracleSql: Map[String, String] =
    QueriesRelational.oracle ++ QueriesFunctions.oracle ++
      QueriesPipeline.oracle ++ QueriesSources.oracle
}
