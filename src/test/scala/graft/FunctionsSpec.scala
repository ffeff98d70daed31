package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ContextFunctions, DrillFunctions}

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  test("typeof reports runtime SQL types (SURVEY row 58)") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.5)).toDF("a", "b", "c")
    val r = df.select(
      DrillFunctions.typeOf(col("a")).as("ta"),
      DrillFunctions.typeOf(col("b")).as("tb"),
      DrillFunctions.typeOf(col("c")).as("tc")).collect()(0)
    assert(r.getString(0) == "bigint")
    assert(r.getString(1) == "string")
    assert(r.getString(2) == "double")
  }

  test("truncTo truncates toward zero (Drill TRUNC(x, n))") {
    import spark.implicits._
    val df = Seq((3.14159, -2.71828)).toDF("p", "n")
    val r = df.select(
      DrillFunctions.truncTo(col("p"), 2).as("tp"),
      DrillFunctions.truncTo(col("n"), 2).as("tn")).collect()(0)
    assert(r.getDouble(0) == 3.14)
    assert(r.getDouble(1) == -2.71) // toward zero, NOT floor
  }

  test("context functions expose session identity (SURVEY row 57)") {
    val r = spark.range(1).select(ContextFunctions.contextRow(spark): _*)
      .collect()(0)
    assert(r.getAs[String]("session_id") == spark.sparkContext.applicationId)
    assert(r.getAs[String]("session_user").nonEmpty)
    assert(r.getAs[String]("current_schema") == spark.catalog.currentDatabase)
    assert(r.getAs[String]("current_catalog") == spark.catalog.currentCatalog())
    assert(r.getAs[String]("engine_version").startsWith("4."))
  }

  test("phonetic + distance functions (Drill contrib/udfs)") {
    import spark.implicits._
    val df = Seq(("Robert", "Rupert")).toDF("a", "b")
    val r = df.select(
      soundex(col("a")).as("sa"), soundex(col("b")).as("sb"),
      levenshtein(col("a"), col("b")).as("lev")).collect()(0)
    assert(r.getString(0) == "R163")
    assert(r.getString(1) == "R163") // classic soundex pair
    assert(r.getInt(2) == 2) // o->u, b->p
  }

  test("kvgen/mappify explodes a JSON map column (SURVEY row 36)") {
    import spark.implicits._
    val df = Seq((1L, """{"a": 1, "b": 2}""")).toDF("id", "js")
    val rows = df.select(col("id"),
        explode(DrillFunctions.convertFromJsonMap(col("js"))))
      .orderBy("key").collect()
    assert(rows.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", 1L), ("b", 2L)))
  }
}
