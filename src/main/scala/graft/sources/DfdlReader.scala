package graft.sources

import java.io.ByteArrayInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** DFDL (Data Format Description Language) reader — a hand-rolled
  * interpreter for the DFDL-schema subset the reference exercises
  * (reference surface: contrib/format-daffodil/.../DaffodilBatchReader
  * .java, which wraps Apache Daffodil — no code shared, only the output
  * contract; DFDL itself is an OGF public specification).
  *
  * Supported subset (everything the reference's own test schemas use):
  *  - binary representation: big-endian fixed-width xs:int/long/short/
  *    byte/float/double/boolean
  *  - text representation with lengthKind="delimited": sequence
  *    separator/terminator (%SP;/%NL;/%HT; entities), per-element
  *    initiator/terminator (quoted strings), textBooleanTrueRep/FalseRep,
  *    the full simple-type set (signed + unsigned ints, xs:integer /
  *    nonNegativeInteger as Decimal(38,0), xs:decimal kept as string to
  *    preserve arbitrary precision, hexBinary (encoded bytes), date,
  *    time (raw text), dateTime)
  *  - nested complexType sequences (→ struct columns), maxOccurs arrays
  *    (bounded and unbounded, greedy with rollback — Daffodil's
  *    occursCountKind="implicit" shape), repeating top-level rows, and
  *    .gz-compressed data files.
  *
  * One DataFrame row per parsed `rootName` instance; columns are the row
  * type's sequence children (nested complex → StructType, repeats →
  * ArrayType). The schema XSD parses driver-side into a serializable
  * model; data files parse on executors, one task per file.
  */
object DfdlReader {

  // ---- schema model ----------------------------------------------------
  private[graft] case class El(name: String, simple: String, // "" if complex
                               children: Seq[El], minOccurs: Int, maxOccurs: Int,
                               sep: String, term: String, // of the child sequence
                               init: String, elTerm: String,
                               trueRep: String, falseRep: String)
      extends Serializable

  private def ent(s: String): String =
    s.replace("%SP;", " ").replace("%NL;", "\n").replace("%HT;", "\t")
      .replace("%CR;", "\r").replace("%LF;", "\n")

  /** Parse the .dfdl.xsd into (representation, row element model). */
  private[graft] def parseSchema(xsd: Array[Byte], rootName: String): (String, El) = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new ByteArrayInputStream(xsd))
    val root = doc.getDocumentElement

    def childElems(n: org.w3c.dom.Node): Seq[org.w3c.dom.Element] = {
      val l = n.getChildNodes
      (0 until l.getLength).map(l.item).collect {
        case e: org.w3c.dom.Element => e
      }
    }
    def local(e: org.w3c.dom.Element): String = {
      val n = e.getTagName
      n.substring(n.indexOf(':') + 1)
    }
    def find(n: org.w3c.dom.Node, name: String): Seq[org.w3c.dom.Element] =
      childElems(n).filter(local(_) == name)

    // representation from the top-level dfdl:format annotation (attribute
    // search is namespace-prefix-agnostic)
    var representation = "binary"
    val w = doc.getElementsByTagName("*")
    (0 until w.getLength).map(w.item).collect { case e: org.w3c.dom.Element => e }
      .filter(e => local(e) == "format").foreach { e =>
        val r = e.getAttribute("representation")
        if (r.nonEmpty) representation = r
      }

    val namedTypes: Map[String, org.w3c.dom.Element] =
      find(root, "complexType").flatMap { ct =>
        Option(ct.getAttribute("name")).filter(_.nonEmpty).map(_ -> ct)
      }.toMap
    val topElements: Map[String, org.w3c.dom.Element] =
      find(root, "element").flatMap { el =>
        Option(el.getAttribute("name")).filter(_.nonEmpty).map(_ -> el)
      }.toMap

    def attr(e: org.w3c.dom.Element, suffix: String): String = {
      val attrs = e.getAttributes
      (0 until attrs.getLength).map(attrs.item).collectFirst {
        case a if a.getNodeName == suffix || a.getNodeName.endsWith(":" + suffix) =>
          a.getNodeValue
      }.getOrElse("")
    }

    def buildFromType(name: String, ct: org.w3c.dom.Element,
                      minOcc: Int, maxOcc: Int): El = {
      val seq = find(ct, "sequence").headOption.getOrElse(
        throw new IllegalArgumentException(s"complexType for $name has no sequence"))
      val sep = ent(attr(seq, "separator"))
      val term = ent(attr(seq, "terminator"))
      val kids = find(seq, "element").map(buildElement)
      El(name, "", kids, minOcc, maxOcc, sep, term, "", "", "T", "F")
    }

    def buildElement(e: org.w3c.dom.Element): El = {
      val name = e.getAttribute("name")
      val typ = e.getAttribute("type")
      val maxOcc = e.getAttribute("maxOccurs") match {
        case "" => 1
        case "unbounded" => -1
        case n => n.toInt
      }
      val minOcc = e.getAttribute("minOccurs") match {
        case "" => 1
        case n => n.toInt
      }
      val initier = ent(attr(e, "initiator"))
      val elTerm = ent(attr(e, "terminator"))
      val tRep = Option(attr(e, "textBooleanTrueRep")).filter(_.nonEmpty).getOrElse("T")
      val fRep = Option(attr(e, "textBooleanFalseRep")).filter(_.nonEmpty).getOrElse("F")
      if (typ.startsWith("xs:"))
        El(name, typ.substring(3), Nil, minOcc, maxOcc, "", "", initier, elTerm, tRep, fRep)
      else if (typ.nonEmpty) { // reference to a named complexType
        val tn = typ.substring(typ.indexOf(':') + 1)
        buildFromType(name, namedTypes.getOrElse(tn,
          throw new IllegalArgumentException(s"unknown type $typ")), minOcc, maxOcc)
      } else { // anonymous inline complexType
        val ct = find(e, "complexType").headOption.getOrElse(
          throw new IllegalArgumentException(s"element $name has neither type nor complexType"))
        buildFromType(name, ct, minOcc, maxOcc)
      }
    }

    val rowEl = topElements.getOrElse(rootName,
      throw new IllegalArgumentException(
        s"no top-level element '$rootName' in schema (have: ${topElements.keys.mkString(", ")})"))
    (representation, buildElement(rowEl))
  }

  // ---- Spark schema ----------------------------------------------------
  private def simpleType(t: String): DataType = t match {
    case "int" => IntegerType
    case "long" => LongType
    case "short" => ShortType
    case "byte" => ByteType
    case "boolean" => BooleanType
    case "double" => DoubleType
    case "float" => FloatType
    case "string" => StringType
    case "hexBinary" => BinaryType
    case "unsignedInt" => LongType
    case "unsignedShort" => IntegerType
    case "unsignedByte" => ShortType
    case "unsignedLong" => DecimalType(20, 0)
    case "integer" | "nonNegativeInteger" => DecimalType(38, 0)
    case "decimal" => StringType // arbitrary precision preserved verbatim
    case "date" => DateType
    case "time" => StringType // raw text (Spark has no TIME type)
    case "dateTime" => TimestampType
    case other => throw new IllegalArgumentException(s"unsupported xs:$other")
  }

  private def elType(e: El): DataType = {
    val base =
      if (e.simple.nonEmpty) simpleType(e.simple)
      else StructType(e.children.map(fieldOf))
    if (e.maxOccurs == 1) base else ArrayType(base, containsNull = false)
  }
  private def fieldOf(e: El): StructField = StructField(e.name, elType(e), nullable = true)

  def schemaOf(row: El): StructType = StructType(row.children.map(fieldOf))

  // ---- binary parse ----------------------------------------------------
  private class Bin(val b: Array[Byte]) { var p = 0 }

  private def binWidth(t: String): Int = t match {
    case "int" | "float" | "boolean" | "unsignedInt" => 4
    case "long" | "double" | "unsignedLong" => 8
    case "short" | "unsignedShort" => 2
    case "byte" | "unsignedByte" => 1
    case other => throw new IllegalArgumentException(
      s"xs:$other has no fixed binary representation in this subset")
  }

  private def binValue(in: Bin, t: String): Any = {
    val w = binWidth(t)
    var v = 0L
    (0 until w).foreach(i => v = (v << 8) | (in.b(in.p + i) & 0xFFL))
    in.p += w
    t match {
      case "int" => java.lang.Integer.valueOf(v.toInt)
      case "long" => java.lang.Long.valueOf(v)
      case "short" => java.lang.Short.valueOf(v.toShort)
      case "byte" => java.lang.Byte.valueOf(v.toByte)
      case "float" => java.lang.Float.valueOf(java.lang.Float.intBitsToFloat(v.toInt))
      case "double" => java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(v))
      case "boolean" => java.lang.Boolean.valueOf(v != 0)
      case "unsignedInt" => java.lang.Long.valueOf(v & 0xFFFFFFFFL)
      case "unsignedShort" => java.lang.Integer.valueOf((v & 0xFFFF).toInt)
      case "unsignedByte" => java.lang.Short.valueOf((v & 0xFF).toShort)
      case "unsignedLong" =>
        // schema declares Decimal(20,0) (a 2^63..2^64-1 value does not
        // fit a long) — a raw Long here crashed the encoder and
        // surfaced >= 2^63 values negative
        new java.math.BigDecimal(java.lang.Long.toUnsignedString(v))
      case _ => v
    }
  }

  /** Greedy parse with rollback: None = not enough data (position restored). */
  private def binParse(in: Bin, e: El): Option[Any] = {
    val mark = in.p
    def one(): Option[Any] =
      if (e.simple.nonEmpty) {
        if (in.p + binWidth(e.simple) > in.b.length) None
        else Some(binValue(in, e.simple))
      } else {
        val vals = e.children.map(c => binParse(in, c))
        if (vals.exists(_.isEmpty)) None
        else Some(Row.fromSeq(vals.map(_.get)))
      }
    if (e.maxOccurs == 1) {
      val r = one()
      // an optional (minOccurs=0) scalar that fails to parse yields
      // null and consumes nothing — previously it failed the whole row
      if (r.isEmpty) { in.p = mark; if (e.minOccurs == 0) Some(null) else None }
      else r
    } else {
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var continue = true
      while (continue && (e.maxOccurs < 0 || out.size < e.maxOccurs)) {
        val m2 = in.p
        one() match {
          case Some(v) =>
            out += v
            // zero-progress guard: an occurrence that consumed no input
            // (all-optional children) would repeat forever
            if (in.p == m2) continue = false
          case None => in.p = m2; continue = false
        }
      }
      if (out.size < e.minOccurs) { in.p = mark; None }
      else Some(out.toSeq)
    }
  }

  // ---- text parse ------------------------------------------------------
  private def textValue(tok0: String, e: El): Any = {
    var tok = tok0
    if (e.init.nonEmpty && tok.startsWith(e.init)) tok = tok.substring(e.init.length)
    if (e.elTerm.nonEmpty && tok.endsWith(e.elTerm))
      tok = tok.substring(0, tok.length - e.elTerm.length)
    e.simple match {
      case "int" => java.lang.Integer.valueOf(tok.toInt)
      case "long" => java.lang.Long.valueOf(tok.toLong)
      case "short" => java.lang.Short.valueOf(tok.toShort)
      case "byte" => java.lang.Byte.valueOf(tok.toByte)
      case "boolean" =>
        if (tok == e.trueRep) java.lang.Boolean.TRUE
        else if (tok == e.falseRep) java.lang.Boolean.FALSE
        else throw new IllegalArgumentException(
          s"boolean rep '$tok' matches neither '${e.trueRep}' nor '${e.falseRep}'")
      case "double" => java.lang.Double.valueOf(tok.toDouble)
      case "float" => java.lang.Float.valueOf(tok.toFloat)
      case "string" => tok
      case "hexBinary" => tok.getBytes("ISO-8859-1") // encoded bytes of the text
      case "unsignedInt" => java.lang.Long.valueOf(tok.toLong)
      case "unsignedShort" => java.lang.Integer.valueOf(tok.toInt)
      case "unsignedByte" => java.lang.Short.valueOf(tok.toShort)
      case "unsignedLong" | "integer" | "nonNegativeInteger" =>
        new java.math.BigDecimal(new java.math.BigInteger(tok))
      case "decimal" => tok
      case "date" => java.sql.Date.valueOf(tok)
      case "time" => tok
      case "dateTime" =>
        // zone-less timestamps read as UTC; an explicit offset (+hh:mm or
        // -hh:mm AFTER the time part) or Z passes through untouched
        val timePart = tok.substring(tok.indexOf('T') + 1)
        val hasZone = tok.endsWith("Z") || timePart.contains("+") || timePart.contains("-")
        val norm = if (hasZone) tok else tok + "Z"
        java.sql.Timestamp.from(java.time.OffsetDateTime.parse(norm).toInstant)
      case other => throw new IllegalArgumentException(s"unsupported text xs:$other")
    }
  }

  private class Toks(val ts: Array[String]) { var p = 0 }

  private def textParse(in: Toks, e: El): Option[Any] = {
    val mark = in.p
    def one(): Option[Any] =
      if (e.simple.nonEmpty) {
        if (in.p >= in.ts.length) None
        else {
          val v = try Some(textValue(in.ts(in.p), e))
                  catch { case scala.util.control.NonFatal(_) => None }
          if (v.isDefined) in.p += 1
          v
        }
      } else {
        val vals = e.children.map(c => textParse(in, c))
        if (vals.exists(_.isEmpty)) None
        else Some(Row.fromSeq(vals.map(_.get)))
      }
    if (e.maxOccurs == 1) {
      val r = one()
      // an optional (minOccurs=0) scalar that fails to parse yields
      // null and consumes nothing — previously it failed the whole row
      if (r.isEmpty) { in.p = mark; if (e.minOccurs == 0) Some(null) else None }
      else r
    } else {
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var continue = true
      while (continue && (e.maxOccurs < 0 || out.size < e.maxOccurs)) {
        val m2 = in.p
        one() match {
          case Some(v) =>
            out += v
            // zero-progress guard: an occurrence that consumed no input
            // (all-optional children) would repeat forever
            if (in.p == m2) continue = false
          case None => in.p = m2; continue = false
        }
      }
      if (out.size < e.minOccurs) { in.p = mark; None }
      else Some(out.toSeq)
    }
  }

  // ---- rows of one file ------------------------------------------------
  private[graft] def rowsOf(data: Array[Byte], representation: String,
                            rowEl: El): Seq[Row] =
    if (representation == "binary") {
      val in = new Bin(data)
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      var continue = true
      while (continue && in.p < in.b.length) {
        val before = in.p
        binParse(in, rowEl.copy(maxOccurs = 1)) match {
          case Some(r: Row) =>
            out += r
            if (in.p == before) continue = false // zero-progress guard
          case _ => continue = false
        }
      }
      require(in.p == data.length,
        s"dfdl: ${data.length - in.p} trailing bytes did not parse as '${rowEl.name}'")
      out.toSeq
    } else {
      val term = if (rowEl.term.nonEmpty) rowEl.term else "\n"
      val sep = if (rowEl.sep.nonEmpty) rowEl.sep else " "
      // text tokenization is flat: a nested sequence declaring its OWN
      // separator/terminator would need hierarchical splitting — refuse
      // rather than mis-tokenize
      def checkNested(e: El): Unit = e.children.foreach { c =>
        if (c.simple.isEmpty) {
          require((c.sep.isEmpty || c.sep == sep) &&
                  (c.term.isEmpty || c.term == term),
            s"dfdl: nested sequence '${c.name}' declares its own " +
              "separator/terminator — unsupported in delimited text mode")
          checkNested(c)
        }
      }
      checkNested(rowEl)
      new String(data, "UTF-8").split(java.util.regex.Pattern.quote(term))
        .map(_.stripPrefix("\r").stripSuffix("\r")).filter(_.nonEmpty)
        .map { line =>
          // -1 keeps EMPTY tokens: 'a,,c' has an empty second field —
          // filtering it shifted every later column (a trailing empty
          // token is harmless; parses don't require full consumption)
          val toks = new Toks(line.split(java.util.regex.Pattern.quote(sep), -1))
          textParse(toks, rowEl.copy(maxOccurs = 1)) match {
            case Some(r: Row) => r
            case _ => throw new IllegalArgumentException(
              s"dfdl: row '$line' did not parse as '${rowEl.name}'")
          }
        }.toSeq
    }

  // ---- public API ------------------------------------------------------
  private def readBytes(conf: Configuration, file: String): Array[Byte] = {
    val fp = new Path(file)
    val in = fp.getFileSystem(conf).open(fp)
    val raw = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
    if (file.toLowerCase(java.util.Locale.ROOT).endsWith(".gz")) {
      // case-insensitive like FileList's extension filter — DATA.GZ was
      // selected but handed to the parser compressed
      val gz = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(raw))
      try gz.readAllBytes() finally gz.close()
    } else raw
  }

  /** Parse `dataPath` (file/dir/glob, .gz transparent) against the DFDL
    * schema at `schemaPath`, rows = instances of `rootName`. */
  def read(spark: SparkSession, dataPath: String, schemaPath: String,
           rootName: String = "row"): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (representation, rowEl) = parseSchema(readBytes(conf, schemaPath), rootName)
    val schema = schemaOf(rowEl)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // session Hadoop conf rides to executors (the XlsxReader fix)
    val sconf = new SerializableHadoopConf(conf)
    FileList.asDataset(spark, dataPath, Set(".dat", ".gz", ".bin"))
      .mapPartitions { files =>
        val conf2 = sconf.value
        files.flatMap(f => rowsOf(readBytes(conf2, f), representation, rowEl))
      }(enc).toDF(schema.fieldNames.toSeq: _*)
  }
}
