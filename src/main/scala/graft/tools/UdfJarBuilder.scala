package graft.tools

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.jar.{JarEntry, JarOutputStream}
import javax.tools.ToolProvider

import scala.jdk.CollectionConverters._

/** In-process Java→jar packaging for dynamic UDF deployment — the
  * developer-workflow side of Drill's CREATE FUNCTION USING JAR (Drill
  * docs have users build a jar and copy it into the registry staging
  * directory; ref exec/.../expr/fn/registry/RemoteFunctionRegistry.java).
  *
  * Uses the JDK's `javax.tools` compiler API (no forked javac — process
  * spawning is unreliable without a native Hadoop lib, see
  * NioLocalFileSystem) and writes the jar with fixed entry timestamps so
  * the artifact is byte-deterministic for a given source set.
  */
object UdfJarBuilder {

  /** Compile `sources` (class name → Java source) against the Spark
    * classpath and package the classes into `jarPath`. */
  def build(sources: Map[String, String], jarPath: String): String = {
    val compiler = ToolProvider.getSystemJavaCompiler
    require(compiler != null, "UdfJarBuilder requires a JDK (no compiler in this JVM)")
    val work = Files.createTempDirectory("graft_udf_build")
    val srcFiles = sources.map { case (cls, code) =>
      val f = work.resolve(cls + ".java")
      Files.write(f, code.getBytes(UTF_8))
      f.toFile
    }.toSeq

    val sparkJars = Option(new File("/opt/spark/jars").listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".jar")).map(_.getAbsolutePath)
    val cp = (System.getProperty("java.class.path") +: sparkJars.toSeq)
      .mkString(File.pathSeparator)

    val fm = compiler.getStandardFileManager(null, null, UTF_8)
    try {
      val units = fm.getJavaFileObjectsFromFiles(srcFiles.asJava)
      val ok = compiler.getTask(null, fm,
        null, Seq("-classpath", cp, "-d", work.toString).asJava, null, units).call()
      require(ok, s"UdfJarBuilder: compilation failed for ${sources.keys.mkString(", ")}")
    } finally fm.close()

    val out = Paths.get(jarPath)
    Option(out.getParent).foreach(Files.createDirectories(_))
    val jos = new JarOutputStream(Files.newOutputStream(out))
    try {
      val classFiles = collectClassFiles(work)
      classFiles.sortBy(_.toString).foreach { cf =>
        val entry = new JarEntry(work.relativize(cf).toString.replace(File.separatorChar, '/'))
        entry.setTime(0L)
        jos.putNextEntry(entry)
        jos.write(Files.readAllBytes(cf))
        jos.closeEntry()
      }
    } finally jos.close()
    out.toString
  }

  private def collectClassFiles(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala.filter(_.toString.endsWith(".class")).toSeq
    finally s.close()
  }
}
