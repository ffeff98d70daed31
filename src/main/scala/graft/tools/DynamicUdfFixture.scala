package graft.tools

import java.nio.file.{Files, Paths}

/** Deterministic UDF jar for the q_dynamic_udf gate and specs: three
  * functions exercising UDF1/UDF2 arity and String/Long return-type
  * inference. Compiled in-process (see [[UdfJarBuilder]]); byte-stable,
  * so repeated calls reuse the artifact.
  */
object DynamicUdfFixture {

  val JarPath = "/tmp/graft_dynudf_fixture.jar"

  val Sources: Map[String, String] = Map(
    "RevStr" ->
      """import org.apache.spark.sql.api.java.UDF1;
        |public class RevStr implements UDF1<String, String> {
        |  public static final String NAME = "rev_str";
        |  public String call(String s) {
        |    return s == null ? null : new StringBuilder(s).reverse().toString();
        |  }
        |}""".stripMargin,
    "SqLong" ->
      """import org.apache.spark.sql.api.java.UDF1;
        |public class SqLong implements UDF1<Long, Long> {
        |  public static final String NAME = "sq_long";
        |  public Long call(Long x) { return x == null ? null : x * x; }
        |}""".stripMargin,
    "TagCat" ->
      """import org.apache.spark.sql.api.java.UDF2;
        |public class TagCat implements UDF2<String, String, String> {
        |  public static final String NAME = "tag_cat";
        |  public String call(String a, String b) {
        |    return (a == null || b == null) ? null : a + ":" + b;
        |  }
        |}""".stripMargin)

  /** Build (or reuse) the fixture jar; returns its path. */
  def ensure(): String = synchronized {
    if (!Files.isRegularFile(Paths.get(JarPath))) UdfJarBuilder.build(Sources, JarPath)
    JarPath
  }
}
