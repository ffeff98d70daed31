package graft.functions

import java.net.URLClassLoader
import java.nio.file.{Files, Paths}
import java.lang.reflect.{ParameterizedType, Type}
import java.util.jar.JarFile

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF1, UDF2, UDF3, UDF4, UDF5}
import org.apache.spark.sql.types._

/** Dynamic UDF registry — Drill's `CREATE FUNCTION USING JAR` (ref
  * exec/.../expr/fn/registry/RemoteFunctionRegistry.java and
  * exec/.../planner/sql/handlers/CreateFunctionHandler.java), Spark-first.
  *
  * Drill stages the jar into a registry area, scans it for
  * `@FunctionTemplate` classes, and re-plans the function registry
  * cluster-wide. The Spark-native equivalent: `ADD JAR` ships the jar to
  * the session classloader AND every executor, and the function surface
  * is the public `org.apache.spark.sql.api.java.UDF1..UDF5` interfaces —
  * a jar class `class RevStr implements UDF1<String,String>` registers as
  * a session function callable from SQL, `selectExpr`, and views. The
  * return `DataType` is inferred from the interface's generic signature,
  * so jars carry no Spark-version-specific metadata.
  *
  * Function naming: a `public static final String NAME` field wins;
  * otherwise the class's simple name in snake_case. Registration is
  * idempotent per (name, class, jar); a name collision from a DIFFERENT
  * jar/class errors, matching Drill's duplicate-signature refusal.
  *
  * Scale note: the scan + reflection run once on the driver; execution is
  * Spark's normal deserialized-closure path (the UDF instance ships in
  * the task closure, the class resolves from the ADD JAR'd executor
  * classloader). Nothing here is per-row driver work.
  */
object DynamicUdfs {

  final case class Registered(name: String, className: String, jar: String,
                              arity: Int, returnType: DataType)

  private val registry = TrieMap.empty[String, Registered]

  /** Currently-registered dynamic functions (for sys.functions joins). */
  def registered: Seq[Registered] = registry.values.toSeq.sortBy(_.name)

  /** Register every UDF1..UDF5 implementation found in the jar.
    * Returns the function names registered (or confirmed, if already). */
  def registerJar(spark: SparkSession, jarPath: String): Seq[String] = {
    val p = Paths.get(jarPath)
    require(Files.isRegularFile(p),
      s"CREATE FUNCTION USING JAR: no such jar: $jarPath")
    // Session classloader + executor classpaths, the Spark-native twin of
    // Drill's registry-area staging. Quoted form is parsed by Spark's own
    // ADD JAR command (our parser wrapper delegates it verbatim).
    spark.sql(s"ADD JAR '$jarPath'")

    val jf = new JarFile(p.toFile)
    val classNames =
      try jf.entries().asScala.map(_.getName)
        .filter(n => n.endsWith(".class") && !n.contains("$"))
        .map(_.stripSuffix(".class").replace('/', '.')).toList
      finally jf.close()

    val loader = new URLClassLoader(Array(p.toUri.toURL), getClass.getClassLoader)
    try {
      val impls = classNames.flatMap { cn =>
        val cls =
          try Class.forName(cn, false, loader)
          catch { case _: Throwable => null }
        // skip abstract bases and classes without a no-arg constructor —
        // an abstract UDF base class in the jar used to abort the WHOLE
        // command at newInstance after ADD JAR already ran
        if (cls == null || cls.isInterface ||
            java.lang.reflect.Modifier.isAbstract(cls.getModifiers) ||
            !cls.getDeclaredConstructors.exists(_.getParameterCount == 0)) None
        else udfSignature(cls).map { case (arity, ret) => (cls, arity, ret) }
      }
      require(impls.nonEmpty,
        s"CREATE FUNCTION USING JAR: no UDF1..UDF5 implementations in $jarPath")
      impls.map { case (cls, arity, ret) => registerOne(spark, cls, arity, ret, jarPath) }
    } finally loader.close() // executors resolve via ADD JAR, not this loader
  }

  /** Drop every function this registry loaded from the given jar (Drill's
    * `DROP FUNCTION USING JAR`). The jar itself stays on the classpath —
    * same as Drill, where unregistering removes the functions from the
    * registry but running queries keep their loaded classes. */
  def dropJar(spark: SparkSession, jarPath: String): Seq[String] = {
    val mine = registry.values.filter(_.jar == jarPath).map(_.name).toSeq.sorted
    require(mine.nonEmpty,
      s"DROP FUNCTION USING JAR: no functions registered from $jarPath")
    mine.foreach { n =>
      spark.sql(s"DROP TEMPORARY FUNCTION IF EXISTS `$n`")
      registry.remove(n)
    }
    mine
  }

  private def registerOne(spark: SparkSession, cls: Class[_], arity: Int,
                          ret: DataType, jarPath: String): String = {
    val name = functionName(cls)
    registry.get(name).foreach { prev =>
      require(prev.className == cls.getName && prev.jar == jarPath,
        s"CREATE FUNCTION USING JAR: function `$name` already registered " +
          s"from ${prev.className} (${prev.jar}) — drop it first")
    }
    // Java UDFs registered with only a return type get no input casts
    // from Catalyst, so an int column against a UDF1<Long,·> would CCE.
    // Drill inserts implicit casts at the function boundary
    // (ref exec/.../resolver/TypeCastRules.java); the equivalent here is
    // a widening coercion per parameter, reflected once from the concrete
    // `call` signature and applied inside a serializable wrapper.
    val inst = cls.getDeclaredConstructor().newInstance()
    val params = cls.getMethods
      .find(m => m.getName == "call" && !m.isBridge)
      .getOrElse(throw new IllegalStateException(s"no call() in ${cls.getName}"))
      .getParameterTypes.map(coercer)
    arity match {
      case 1 =>
        val f = inst.asInstanceOf[UDF1[AnyRef, AnyRef]]; val Array(c0) = params
        spark.udf.register(name, new UDF1[AnyRef, AnyRef] {
          override def call(a: AnyRef): AnyRef = f.call(c0(a))
        }, ret)
      case 2 =>
        val f = inst.asInstanceOf[UDF2[AnyRef, AnyRef, AnyRef]]; val Array(c0, c1) = params
        spark.udf.register(name, new UDF2[AnyRef, AnyRef, AnyRef] {
          override def call(a: AnyRef, b: AnyRef): AnyRef = f.call(c0(a), c1(b))
        }, ret)
      case 3 =>
        val f = inst.asInstanceOf[UDF3[AnyRef, AnyRef, AnyRef, AnyRef]]
        val Array(c0, c1, c2) = params
        spark.udf.register(name, new UDF3[AnyRef, AnyRef, AnyRef, AnyRef] {
          override def call(a: AnyRef, b: AnyRef, c: AnyRef): AnyRef =
            f.call(c0(a), c1(b), c2(c))
        }, ret)
      case 4 =>
        val f = inst.asInstanceOf[UDF4[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef]]
        val Array(c0, c1, c2, c3) = params
        spark.udf.register(name, new UDF4[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
          override def call(a: AnyRef, b: AnyRef, c: AnyRef, d: AnyRef): AnyRef =
            f.call(c0(a), c1(b), c2(c), c3(d))
        }, ret)
      case 5 =>
        val f = inst.asInstanceOf[UDF5[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef]]
        val Array(c0, c1, c2, c3, c4) = params
        spark.udf.register(name, new UDF5[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
          override def call(a: AnyRef, b: AnyRef, c: AnyRef, d: AnyRef, e: AnyRef): AnyRef =
            f.call(c0(a), c1(b), c2(c), c3(d), c4(e))
        }, ret)
    }
    registry.put(name, Registered(name, cls.getName, jarPath, arity, ret))
    name
  }

  /** Null-preserving widening coercion toward the declared parameter
    * class (int→long, int/long/float→double, …) — Drill's implicit
    * numeric cast rules, applied boxed. Non-numeric mismatches pass
    * through and fail in the UDF itself, same as Drill's cast error. */
  private def coercer(expected: Class[_]): AnyRef => AnyRef = {
    val widen: AnyRef => AnyRef = expected.getName match {
      case "java.lang.Long" | "long" => {
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue)
        case s: java.lang.Short   => java.lang.Long.valueOf(s.longValue)
        case b: java.lang.Byte    => java.lang.Long.valueOf(b.longValue)
        case x => x
      }
      case "java.lang.Double" | "double" => {
        case f: java.lang.Float   => java.lang.Double.valueOf(f.doubleValue)
        case l: java.lang.Long    => java.lang.Double.valueOf(l.doubleValue)
        case i: java.lang.Integer => java.lang.Double.valueOf(i.doubleValue)
        case s: java.lang.Short   => java.lang.Double.valueOf(s.doubleValue)
        case x => x
      }
      case "java.lang.Integer" | "int" => {
        case s: java.lang.Short => java.lang.Integer.valueOf(s.intValue)
        case b: java.lang.Byte  => java.lang.Integer.valueOf(b.intValue)
        case x => x
      }
      case "java.lang.Float" | "float" => {
        case i: java.lang.Integer => java.lang.Float.valueOf(i.floatValue)
        case s: java.lang.Short   => java.lang.Float.valueOf(s.floatValue)
        case x => x
      }
      case _ => identity
    }
    (a: AnyRef) => if (a == null) null else widen(a)
  }

  private def functionName(cls: Class[_]): String =
    try {
      val f = cls.getField("NAME")
      f.get(null).asInstanceOf[String]
    } catch {
      case _: NoSuchFieldException =>
        cls.getSimpleName
          .replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
    }

  /** (arity, returnType) if the class implements UDF1..UDF5 with concrete
    * generic type arguments; None otherwise. */
  private def udfSignature(cls: Class[_]): Option[(Int, DataType)] = {
    val udfIfaces = Set(classOf[UDF1[_, _]], classOf[UDF2[_, _, _]],
      classOf[UDF3[_, _, _, _]], classOf[UDF4[_, _, _, _, _]],
      classOf[UDF5[_, _, _, _, _, _]]).map(_.getName)
    cls.getGenericInterfaces.collectFirst {
      case pt: ParameterizedType
          if udfIfaces.contains(pt.getRawType.asInstanceOf[Class[_]].getName) =>
        val args = pt.getActualTypeArguments
        // Try: an incidental UDF-shaped helper with an unsupported
        // return type (e.g. List<String>) must be SKIPPED, not abort
        // registration of every valid UDF in the jar
        scala.util.Try((args.length - 1, toDataType(args.last, cls))).toOption
    }.flatten
  }

  private def toDataType(t: Type, cls: Class[_]): DataType = t match {
    case c: Class[_] => c.getName match {
      case "java.lang.String"                       => StringType
      case "java.lang.Long" | "long"                => LongType
      case "java.lang.Integer" | "int"              => IntegerType
      case "java.lang.Double" | "double"            => DoubleType
      case "java.lang.Float" | "float"              => FloatType
      case "java.lang.Boolean" | "boolean"          => BooleanType
      case "java.lang.Short" | "short"              => ShortType
      case "java.lang.Byte" | "byte"                => ByteType
      case "[B"                                     => BinaryType
      case "java.math.BigDecimal"                   => DecimalType.SYSTEM_DEFAULT
      case "java.sql.Date"                          => DateType
      case "java.sql.Timestamp"                     => TimestampType
      case other => throw new IllegalArgumentException(
        s"CREATE FUNCTION USING JAR: unsupported UDF return type $other in ${cls.getName}")
    }
    case other => throw new IllegalArgumentException(
      s"CREATE FUNCTION USING JAR: UDF return type must be a concrete class, " +
        s"got $other in ${cls.getName}")
  }
}
