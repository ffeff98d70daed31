package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftCatalog

class CatalogSpec extends AnyFunSuite {
  import TestSpark._

  test("INFORMATION_SCHEMA tables/columns reflect registered views") {
    GraftSession.table(spark, SF, "region").createOrReplaceTempView("cat_region")
    val tabs = GraftCatalog.tables(spark)
    assert(tabs.filter(tabs("table_name") === "cat_region").count() == 1)

    val cols = GraftCatalog.columns(spark, "cat_region").collect()
    val byName = cols.map(r => r.getAs[String]("column_name") -> r.getAs[String]("data_type")).toMap
    assert(Set("r_regionkey", "r_name").subsetOf(byName.keySet))
    assert(Set("int", "bigint").contains(byName("r_regionkey")))
    assert(byName("r_name") == "string")
  }

  test("catalogs and schemata are queryable as DataFrames") {
    val cats = GraftCatalog.catalogs(spark).collect().map(_.getString(0))
    assert(cats.contains("spark_catalog"))
    val schemas = GraftCatalog.schemata(spark).collect()
      .map(_.getAs[String]("schema_name"))
    assert(schemas.contains("default"))
  }
}
