package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DynamicUdfs
import graft.tools.{DynamicUdfFixture, UdfJarBuilder}

/** Dynamic UDF registry (functions/DynamicUdfs.scala): Drill's
  * CREATE/DROP FUNCTION USING JAR over Spark's ADD JAR + java UDF
  * interfaces, with return types inferred from generic signatures. */
class DynamicUdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.SF

  private lazy val jar = DynamicUdfFixture.ensure()

  test("CREATE FUNCTION USING JAR registers every UDF in the jar") {
    val rows = spark.sql(s"CREATE FUNCTION USING JAR '$jar'").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq("rev_str", "sq_long", "tag_cat"))
    assert(rows.forall(_.getString(1) == "registered"))
    val reg = DynamicUdfs.registered.filter(_.jar == jar)
    assert(reg.map(_.name).sorted === Seq("rev_str", "sq_long", "tag_cat"))
    assert(reg.find(_.name == "sq_long").get.returnType ===
      org.apache.spark.sql.types.LongType)
  }

  test("registered functions evaluate from SQL with correct types") {
    spark.sql(s"CREATE FUNCTION USING JAR '$jar'") // idempotent re-register
    val r = spark.sql(
      s"""SELECT rev_str(n_name) AS rev, sq_long(n_nationkey) AS sq,
                 tag_cat(n_name, 'x') AS tagged
          FROM dfs.`$sf/nation.parquet` WHERE n_nationkey = 3""").collect().head
    val name = spark.read.parquet(s"$sf/nation.parquet")
      .where("n_nationkey = 3").collect().head.getString(1)
    assert(r.getString(0) === name.reverse)
    assert(r.getLong(1) === 9L)
    assert(r.getString(2) === s"$name:x")
    // null-safe: the UDF body sees the null, not a wrapper NPE
    val n = spark.sql("SELECT rev_str(CAST(NULL AS STRING)) AS r").collect().head
    assert(n.isNullAt(0))
  }

  test("functions appear in the session registry (sys.functions surface)") {
    spark.sql(s"CREATE FUNCTION USING JAR '$jar'")
    val listed = spark.catalog.listFunctions().collect().map(_.name).toSet
    assert(Seq("rev_str", "sq_long", "tag_cat").forall(listed.contains))
  }

  test("name collision from a different jar refuses; DROP releases the name") {
    spark.sql(s"CREATE FUNCTION USING JAR '$jar'")
    val clashJar = UdfJarBuilder.build(Map(
      "Clash" ->
        """import org.apache.spark.sql.api.java.UDF1;
          |public class Clash implements UDF1<String, String> {
          |  public static final String NAME = "rev_str";
          |  public String call(String s) { return s; }
          |}""".stripMargin),
      Files.createTempDirectory("dynudf").resolve("clash.jar").toString)
    val e = intercept[IllegalArgumentException](
      DynamicUdfs.registerJar(spark, clashJar))
    assert(e.getMessage.contains("already registered"))

    val dropped = spark.sql(s"DROP FUNCTION USING JAR '$jar'")
      .collect().map(_.getString(0)).sorted
    assert(dropped.toSeq === Seq("rev_str", "sq_long", "tag_cat"))
    assert(!DynamicUdfs.registered.exists(_.jar == jar))
    // the name is now free for the other jar
    assert(DynamicUdfs.registerJar(spark, clashJar) === Seq("rev_str"))
    DynamicUdfs.dropJar(spark, clashJar)
    // restore fixture registrations for other tests / gate runs
    DynamicUdfs.registerJar(spark, jar)
  }

  test("degrade paths: missing jar, jar without UDFs") {
    intercept[IllegalArgumentException](
      DynamicUdfs.registerJar(spark, "/no/such/thing.jar"))
    val emptyJar = UdfJarBuilder.build(Map(
      "NotAUdf" -> "public class NotAUdf { public int x() { return 1; } }"),
      Files.createTempDirectory("dynudf").resolve("empty.jar").toString)
    val e = intercept[IllegalArgumentException](
      DynamicUdfs.registerJar(spark, emptyJar))
    assert(e.getMessage.contains("no UDF1..UDF5"))
  }

  test("snake_case naming fallback when no NAME field") {
    val j = UdfJarBuilder.build(Map(
      "UpperFirstChar" ->
        """import org.apache.spark.sql.api.java.UDF1;
          |public class UpperFirstChar implements UDF1<String, String> {
          |  public String call(String s) {
          |    return s == null || s.isEmpty() ? s
          |      : Character.toUpperCase(s.charAt(0)) + s.substring(1);
          |  }
          |}""".stripMargin),
      Files.createTempDirectory("dynudf").resolve("named.jar").toString)
    assert(DynamicUdfs.registerJar(spark, j) === Seq("upper_first_char"))
    val r = spark.sql("SELECT upper_first_char('abc') AS v").collect().head
    assert(r.getString(0) === "Abc")
    DynamicUdfs.dropJar(spark, j)
  }
}
