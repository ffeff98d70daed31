package graft.sources

import java.io.DataInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SPSS system-file (.sav) reader — hand-rolled against the publicly
  * documented layout (GNU PSPP "System File Format" manual; reference
  * surface: contrib/format-spss/.../SpssBatchReader.java, which wraps the
  * com.bedatadriven spss-reader library — no code shared, only the output
  * contract). Same posture as the SAS/XLSX/PDF readers: the binary layout
  * is decoded directly, no external parser.
  *
  * Layout: a 176-byte header ("$FL2" magic, layout code, element count per
  * case, compression, case count, compression bias), then dictionary
  * records — type 2 variables (numeric / string-width, print formats,
  * variable labels, missing specs), type 3/4 value-label maps bound to
  * variable element indexes, type 6 documents, type 7 extensions (subtype
  * 13 carries the long variable names as SHORT=Long pairs, subtype 20 the
  * text encoding) — terminated by type 999. Case data follows either raw
  * (8-byte elements) or bytecode-compressed: 8-byte command blocks whose
  * bytes mean 0 = pad, 1..251 = (code − bias) numeric, 252 = end of data,
  * 253 = raw 8-byte element follows, 254 = eight spaces, 255 = system
  * missing.
  *
  * Output contract (matches the reference's reader): one DOUBLE column per
  * numeric variable (raw values — dates stay SPSS epoch seconds), one
  * STRING column per string variable (right-trimmed), and for every
  * variable with value labels a companion `<name>_value` STRING column
  * holding the label for that row's code (null when unlabeled). Long
  * variable names from subtype 13 are applied. System-missing decodes as
  * null. Zlib-compressed ("$FL3") and big-endian files refuse with a clear
  * error naming the feature. Files parallelize one task per file.
  */
object SpssReader {

  private val Sysmis = java.lang.Double.longBitsToDouble(0xFFEFFFFFFFFFFFFFL) // lowest finite

  private[graft] case class Variable(name: String, width: Int, elems: Int,
                                     labels: Map[Double, String])
  private[graft] case class Meta(vars: Seq[Variable], compression: Int,
                                 bias: Double, ncases: Int, encoding: String)

  private def leI32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xFF) << 24) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
  private def leI64(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xFFL); i -= 1 }
    v
  }
  private def leDouble(b: Array[Byte], o: Int): Double =
    java.lang.Double.longBitsToDouble(leI64(b, o))

  private def readN(in: DataInputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n); in.readFully(b); b
  }
  private def readI32(in: DataInputStream): Int = leI32(readN(in, 4), 0)
  private def readDouble(in: DataInputStream): Double = leDouble(readN(in, 8), 0)

  /** Parse header + dictionary; leaves the stream positioned at case data. */
  private[graft] def parseMeta(in: DataInputStream): Meta = {
    val hdr = readN(in, 176)
    val magic = new String(hdr, 0, 4, "ISO-8859-1")
    require(magic == "$FL2" || magic == "$FL3", s"not an SPSS .sav file (magic '$magic')")
    val layout = leI32(hdr, 64)
    require(layout == 2 || layout == 3,
      s"big-endian .sav unsupported (layout code 0x${layout.toHexString}, little-endian only)")
    val compression = leI32(hdr, 72)
    require(compression != 2 && magic != "$FL3",
      "zlib-compressed .sav ($FL3) unsupported (bytecode or raw only)")
    val ncases = leI32(hdr, 80)
    val bias = leDouble(hdr, 84)

    // dictionary: short-name-ordered variables; labels/long names attach after
    case class RawVar(shortName: String, width: Int, elems: Int)
    val raw = scala.collection.mutable.ArrayBuffer[RawVar]()
    // element index (1-based, counting every 8-byte slot) -> raw var position
    val elemToVar = scala.collection.mutable.HashMap[Int, Int]()
    val labelSets = scala.collection.mutable.ArrayBuffer[(Map[Double, Array[Byte]], Seq[Int])]()
    var longNamesRaw: Array[Byte] = Array.emptyByteArray
    var encoding = "ISO-8859-1"
    var elemIdx = 1

    var done = false
    while (!done) {
      readI32(in) match {
        case 2 => // variable record
          val typ = readI32(in)
          val hasLabel = readI32(in)
          val nMissing = readI32(in)
          readI32(in); readI32(in) // print fmt, write fmt
          val name = new String(readN(in, 8), "ISO-8859-1").trim
          if (hasLabel != 0) {
            val len = readI32(in)
            in.skipNBytes(((len + 3) / 4) * 4L)
          }
          if (nMissing != 0) in.skipNBytes(8L * math.abs(nMissing))
          if (typ >= 0) {
            val elems = if (typ == 0) 1 else (typ + 7) / 8
            elemToVar(elemIdx) = raw.length
            raw += RawVar(name, typ, elems)
          }
          // typ == -1: continuation slot of the preceding string variable
          elemIdx += 1
        case 3 => // value labels: (8-byte value, len byte, label padded to 8-mult)
          val n = readI32(in)
          val m = (0 until n).map { _ =>
            val value = readDouble(in)
            val len = in.readUnsignedByte()
            val padded = ((len + 1 + 7) / 8) * 8 - 1
            // raw bytes kept: the file encoding (subtype 20) may arrive
            // after this record — decoded once the dictionary is complete
            val txt = java.util.Arrays.copyOfRange(readN(in, padded), 0, len)
            value -> txt
          }.toMap
          require(readI32(in) == 4, "value-label record not followed by a type-4 record")
          val cnt = readI32(in)
          val idxs = (0 until cnt).map(_ => readI32(in))
          labelSets += ((m, idxs))
        case 6 => // documents
          val lines = readI32(in)
          in.skipNBytes(80L * lines)
        case 7 => // extension records
          val subtype = readI32(in)
          val size = readI32(in)
          val count = readI32(in)
          val body = readN(in, size * count)
          subtype match {
            case 13 => // long variable names: SHORT=Long separated by 0x09
              longNamesRaw = body // decoded after subtype 20 fixes the charset
            case 20 =>
              val enc = new String(body, "ISO-8859-1").trim
              if (enc.nonEmpty) encoding = enc
            case _ => () // machine info, display params, very-long-strings, ...
          }
        case 999 =>
          readI32(in) // filler
          done = true
        case other =>
          throw new IllegalStateException(s"unsupported .sav dictionary record type $other")
      }
    }

    val longNames = new String(longNamesRaw, encoding).split("\t").toSeq
      .flatMap { kv =>
        val i = kv.indexOf('=')
        if (i > 0) Some(kv.substring(0, i).trim -> kv.substring(i + 1).trim)
        else None
      }.toMap
    // labels decode with the FINAL file encoding (subtype 20 may follow
    // the type-3 records in the dictionary)
    val labelByVar = scala.collection.mutable.HashMap[Int, Map[Double, String]]()
    labelSets.foreach { case (m, idxs) =>
      val decoded = m.map { case (v, b) => v -> new String(b, encoding).trim }
      idxs.foreach(i => elemToVar.get(i).foreach(v =>
        labelByVar(v) = labelByVar.getOrElse(v, Map.empty) ++ decoded))
    }
    val vars = raw.zipWithIndex.map { case (rv, i) =>
      Variable(longNames.getOrElse(rv.shortName, rv.shortName), rv.width,
        rv.elems, labelByVar.getOrElse(i, Map.empty))
    }.toSeq
    Meta(vars, compression, bias, ncases, encoding)
  }

  def schemaOf(meta: Meta): StructType = StructType(meta.vars.flatMap { v =>
    val base = StructField(v.name,
      if (v.width == 0) DoubleType else StringType, nullable = true)
    // the `<name>_value` companion applies to NUMERIC vars (labels are
    // keyed on the 8-byte double) — must agree with rows(), which emits
    // companions for width==0 only
    if (v.width == 0 && v.labels.nonEmpty)
      Seq(base, StructField(v.name + "_value", StringType, nullable = true))
    else Seq(base)
  })

  /** Stream of 8-byte case elements: Double for numeric slots, Array[Byte]
    * for string slots; null = system missing. Bytecode-compressed or raw. */
  private def elements(in: DataInputStream, meta: Meta,
                       isString: Array[Boolean]): Iterator[Any] =
    if (meta.compression == 0) new Iterator[Any] {
      private var slot = 0
      private var pending: Array[Byte] = _
      private var eof = false
      override def hasNext: Boolean = pending != null || {
        if (eof) false
        else {
          try { pending = readN(in, 8); true }
          catch { case _: java.io.EOFException => eof = true; false }
        }
      }
      override def next(): Any = {
        if (!hasNext) throw new NoSuchElementException("past end of .sav data")
        val b = pending; pending = null
        val v: Any =
          if (isString(slot % isString.length)) b
          else { val d = leDouble(b, 0); if (d == Sysmis) null else Double.box(d) }
        slot += 1
        v
      }
    } else new Iterator[Any] {
      private var cmd: Array[Byte] = _
      private var ci = 8
      private var slot = 0
      private var ended = false
      private var nextVal: Any = _
      private var hasVal = false

      private def advance(): Unit = {
        while (!hasVal && !ended) {
          if (ci == 8) {
            cmd = try readN(in, 8) catch { case _: java.io.EOFException => ended = true; null }
            ci = 0
          }
          if (!ended) {
            val c = cmd(ci) & 0xFF; ci += 1
            c match {
              case 0 => () // padding
              case 252 => ended = true
              case 253 =>
                val b = readN(in, 8)
                nextVal =
                  if (isString(slot % isString.length)) b
                  else { val d = leDouble(b, 0); if (d == Sysmis) null else Double.box(d) }
                hasVal = true
              case 254 => nextVal = "        ".getBytes("ISO-8859-1"); hasVal = true
              case 255 => nextVal = null; hasVal = true
              case code => nextVal = Double.box(code - meta.bias); hasVal = true
            }
          }
        }
      }
      override def hasNext: Boolean = { advance(); hasVal }
      override def next(): Any = {
        advance()
        if (!hasVal) throw new NoSuchElementException("past end of .sav data")
        val v = nextVal; hasVal = false; slot += 1; v
      }
    }

  /** Decode all cases of one file. */
  private[graft] def rows(in: DataInputStream, meta: Meta): Iterator[Row] = {
    val elemsPerCase = meta.vars.map(_.elems).sum
    val isString = {
      val a = new Array[Boolean](elemsPerCase)
      var i = 0
      meta.vars.foreach { v =>
        (0 until v.elems).foreach { _ => a(i) = v.width > 0; i += 1 }
      }
      a
    }
    val es = elements(in, meta, isString)
    val caseCount = meta.ncases
    var emitted = 0

    new Iterator[Row] {
      override def hasNext: Boolean =
        (caseCount < 0 || emitted < caseCount) && es.hasNext
      override def next(): Row = {
        val buf = new Array[Any](elemsPerCase)
        var i = 0
        while (i < elemsPerCase) {
          buf(i) = if (es.hasNext) es.next()
                   else throw new java.io.EOFException("truncated .sav case data")
          i += 1
        }
        emitted += 1
        var e = 0
        val vals = meta.vars.flatMap { v =>
          val out: Seq[Any] =
            if (v.width == 0) {
              val d = buf(e).asInstanceOf[java.lang.Double]
              if (v.labels.nonEmpty)
                Seq(d, if (d == null) null else v.labels.get(d.doubleValue).orNull)
              else Seq(d)
            } else {
              // concatenate the 8-byte elements FIRST, decode once — a
              // multi-byte character may straddle an element boundary
              val bytes = new java.io.ByteArrayOutputStream(v.elems * 8)
              (0 until v.elems).foreach { k =>
                buf(e + k) match {
                  case b: Array[Byte] => bytes.write(b)
                  case _ => bytes.write("        ".getBytes("ISO-8859-1"))
                }
              }
              val raw = bytes.toByteArray
              var end = math.min(raw.length, v.width)
              while (end > 0 && raw(end - 1) == ' '.toByte) end -= 1
              Seq(new String(raw, 0, end, meta.encoding))
            }
          e += v.elems
          out
        }
        Row.fromSeq(vals)
      }
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = FileList.resolve(spark, path, Set(".sav"))
    // schema from the first file (driver-side, dictionary records only)
    val schema = {
      val fp = new Path(files.head)
      val in = new DataInputStream(fp.getFileSystem(conf).open(fp))
      try schemaOf(parseMeta(in)) finally in.close()
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // session Hadoop conf rides to executors (the XlsxReader fix)
    val sconf = new SerializableHadoopConf(conf)
    FileList.asDataset(spark, files) // reuse the schema pass's listing
      .mapPartitions { paths =>
        val conf2 = sconf.value
        paths.flatMap { f =>
          val fp = new Path(f)
          val in = new DataInputStream(fp.getFileSystem(conf2).open(fp))
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try in.close() catch { case _: java.io.IOException => () }))
          val meta = parseMeta(in)
          val aligned = SchemaAlign.align(rows(in, meta),
            SchemaAlign.plan(schema, schemaOf(meta)))
          // close at EXHAUSTION, not only at task completion: a task
          // over many files otherwise holds one open stream per
          // processed file (fd/connection-pool exhaustion); the
          // completion listener stays as the early-termination backstop
          val closing = new Iterator[org.apache.spark.sql.Row] {
            def hasNext: Boolean = {
              val h = aligned.hasNext
              if (!h) try in.close() catch {
                case _: java.io.IOException => () }
              h
            }
            def next(): org.apache.spark.sql.Row = aligned.next()
          }
          closing
        }
      }(enc).toDF(schema.fieldNames.toSeq: _*)
  }
}
