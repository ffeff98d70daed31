package graft.sources

import java.io.{DataInputStream, EOFException, InputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** BSON dump-file reader — the zero-egress re-expression of Drill's
  * MongoDB storage plugin (reference contrib/storage-mongo/.../
  * MongoStoragePlugin.java, MongoRecordReader.java). The live-server
  * surface needs a mongod and client jars (neither exists here), but
  * the DATA is a public format: BSON (bsonspec.org) — exactly what
  * `mongodump` writes, one concatenated BSON document per record in a
  * `<collection>.bson` file. Pointing the engine at a dump directory
  * queries every collection the way Drill queries a live one.
  *
  * Decode strategy: each document renders to a JSON text and Spark's
  * own JSON machinery infers/parses the schema — the same
  * schema-on-read contract as the JSON-lines reader, with full nested
  * document/array support for free and heterogeneous documents
  * unifying under Spark's standard type widening. Type mapping:
  * int32/int64/double → JSON numbers (non-finite doubles → null, JSON
  * has no NaN), string/symbol/javascript → strings, documents/arrays
  * recurse, ObjectId → its 24-hex string, datetime → epoch millis,
  * timestamp → its raw uint64, binary → base64 string, regex →
  * `/pattern/options` string, decimal128 → its exact decimal STRING
  * (a JSON number would silently round through double — the reason
  * mongo's canonical extended JSON quotes it too), null/undefined/
  * minKey/maxKey → null.
  *
  * Scale shape: one task per `.bson` file (mongodump writes one file
  * per collection, typically pre-split by `--numParallelCollections`
  * or chunked by an upstream copier); documents stream off the input —
  * nothing materializes a whole file. The JSON bridge costs one extra
  * text parse per row against buying Spark-native inference, widening,
  * and corrupt-record handling; pass `schema` to skip the inference
  * pass entirely (the 100 TB posture: infer once on a sample, pin the
  * schema).
  */
object BsonReader {

  // ---- fixture value wrappers (writer-side; decode accepts all types)
  final case class ObjectId(hex: String) {
    require(hex.length == 24, s"ObjectId wants 24 hex chars: $hex")
  }
  final case class BsonBinary(bytes: Array[Byte], subtype: Byte = 0)
  final case class BsonDateTime(epochMillis: Long)
  final case class BsonTimestamp(raw: Long)
  final case class BsonRegex(pattern: String, options: String = "")
  /** IEEE 754-2008 decimal128, BID encoding, as mongo stores it. */
  final case class BsonDecimal128(high: Long, low: Long)
  case object MinKey
  case object MaxKey

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF
  private def le32(b: Array[Byte], o: Int): Int =
    u8(b, o) | (u8(b, o + 1) << 8) | (u8(b, o + 2) << 16) | (u8(b, o + 3) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    (le32(b, o) & 0xFFFFFFFFL) | ((le32(b, o + 4) & 0xFFFFFFFFL) << 32)

  private def jsonEscape(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case x if x < 0x20 => sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"')
  }

  /** decimal128 (BID) → exact plain decimal string. The `11`-prefixed
    * combination encodes a >113-bit coefficient, which the spec calls
    * non-canonical and mongo's own drivers decode as ZERO; Inf/NaN
    * render as null via the caller (JSON has neither). */
  private val maxCoefficient = BigInt(10).pow(34)

  private def decimal128String(high: Long, low: Long): String = {
    val negative = high < 0
    val comb = (high >>> 58) & 0x1F // 5 combination MSBs after sign
    if ((comb & 0x18) == 0x18) {
      // IEEE 754-2008: 11111 = NaN, 11110 = Infinity (JSON has neither
      // -> null); every OTHER 11-prefix pattern (11000..11101) is a
      // FINITE non-canonical encoding that mongo drivers decode as zero
      if ((comb & 0x1E) == 0x1E) return null
      val exp = ((high >>> 47) & 0x3FFF).toInt - 6176
      return (if (negative) "-0" else "0") +
        (if (exp != 0) s"E$exp" else "")
    }
    val exp = ((high >>> 49) & 0x3FFF).toInt - 6176
    val coeffHigh = high & 0x0001FFFFFFFFFFFFL
    val coeff = (BigInt(coeffHigh) << 64) |
      (BigInt(low >>> 1) << 1) | BigInt(low & 1L)
    // IEEE 754-2008: a coefficient >= 10^34 is non-canonical on EITHER
    // encoding path; mongo drivers decode such values as zero too.
    if (coeff >= maxCoefficient)
      return (if (negative) "-0" else "0") +
        (if (exp != 0) s"E$exp" else "")
    val bd = BigDecimal(BigInt((if (negative) -1 else 1)) * coeff, -exp)
    bd.underlying.toPlainString
  }

  /** Render the elements of one BSON document (starting after its size
    * prefix) as a JSON object/array body into `sb`. */
  private def renderDoc(b: Array[Byte], start: Int, end: Int,
                        asArray: Boolean, sb: java.lang.StringBuilder): Unit = {
    sb.append(if (asArray) '[' else '{')
    var o = start
    var first = true
    while (o < end && b(o) != 0) {
      val tpe = b(o) & 0xFF
      o += 1
      val nameStart = o
      while (b(o) != 0) o += 1
      val name = new String(b, nameStart, o - nameStart, "UTF-8")
      o += 1
      if (!first) sb.append(',')
      first = false
      if (!asArray) { jsonEscape(name, sb); sb.append(':') }
      tpe match {
        case 0x01 => // double
          val d = java.lang.Double.longBitsToDouble(le64(b, o)); o += 8
          if (java.lang.Double.isFinite(d)) sb.append(d) else sb.append("null")
        case 0x02 | 0x0D | 0x0E => // string / javascript / symbol
          val len = le32(b, o); o += 4
          jsonEscape(new String(b, o, len - 1, "UTF-8"), sb); o += len
        case 0x03 => // embedded document
          val len = le32(b, o)
          renderDoc(b, o + 4, o + len - 1, asArray = false, sb); o += len
        case 0x04 => // array (a doc with "0","1",... keys)
          val len = le32(b, o)
          renderDoc(b, o + 4, o + len - 1, asArray = true, sb); o += len
        case 0x05 => // binary -> base64 string
          val len = le32(b, o)
          val subtype = u8(b, o + 4)
          o += 5 // size + subtype byte
          // a declared length past the frame must fail LOUDLY here —
          // Arrays.copyOfRange silently ZERO-PADS past the array end,
          // which would fabricate payload bytes on exactly the corrupt
          // frames the documents() wrapper exists to catch
          if (len < 0 || o + len > b.length)
            throw new ArrayIndexOutOfBoundsException(
              s"binary element declares $len bytes past the frame")
          // subtype 2 ("old binary", pre-2.x drivers) wraps the payload
          // in an inner int32 length — strip it, or the base64 carries
          // 4 spurious leading bytes no mongo driver would return
          val (ps, pl) =
            if (subtype == 2 && len >= 4) (o + 4, len - 4) else (o, len)
          jsonEscape(java.util.Base64.getEncoder
            .encodeToString(java.util.Arrays.copyOfRange(b, ps, ps + pl)), sb)
          o += len
        case 0x06 => sb.append("null") // undefined (deprecated)
        case 0x07 => // ObjectId -> 24-hex string
          val hex = (0 until 12).map(i => f"${u8(b, o + i)}%02x").mkString
          jsonEscape(hex, sb); o += 12
        case 0x08 => sb.append(if (b(o) != 0) "true" else "false"); o += 1
        case 0x09 => sb.append(le64(b, o)); o += 8 // datetime epoch ms
        case 0x0A => sb.append("null")
        case 0x0B => // regex: two cstrings -> "/pattern/options"
          val ps = o; while (b(o) != 0) o += 1
          val pat = new String(b, ps, o - ps, "UTF-8"); o += 1
          val os = o; while (b(o) != 0) o += 1
          val opts = new String(b, os, o - os, "UTF-8"); o += 1
          jsonEscape(s"/$pat/$opts", sb)
        case 0x0C => // DBPointer (deprecated): string + 12-byte id
          val len = le32(b, o); o += 4 + len + 12
          sb.append("null")
        case 0x0F => // code_w_scope: render the code string
          o += 4 // total size
          val len = le32(b, o); o += 4
          jsonEscape(new String(b, o, len - 1, "UTF-8"), sb); o += len
          val docLen = le32(b, o); o += docLen // skip the scope doc
        case 0x10 => sb.append(le32(b, o)); o += 4
        case 0x11 => // timestamp: raw uint64 (render unsigned)
          val v = le64(b, o); o += 8
          sb.append(java.lang.Long.toUnsignedString(v))
        case 0x12 => sb.append(le64(b, o)); o += 8
        case 0x13 => // decimal128 -> exact decimal STRING (or null)
          val lo = le64(b, o); val hi = le64(b, o + 8); o += 16
          val s = decimal128String(hi, lo)
          if (s == null) sb.append("null") else jsonEscape(s, sb)
        case 0xFF | 0x7F => sb.append("null") // minKey / maxKey
        case other => throw new java.io.IOException(
          f"unknown BSON element type 0x$other%02x for field '$name'")
      }
    }
    sb.append(if (asArray) ']' else '}')
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(a, off, n - off)
      if (r < 0) throw new EOFException(s"expected $n bytes, got $off")
      off += r
    }
    a
  }

  /** One JSON string per BSON document, streamed off `in`. */
  private def documents(in: DataInputStream, file: String): Iterator[String] =
    new Iterator[String] {
      private var nextDoc: String = null
      private var done = false
      private def advance(): Unit = {
        while (!done && nextDoc == null) {
          val first = in.read()
          if (first < 0) { done = true }
          else {
            val rest = readFully(in, 3)
            val size = first | (u8(rest, 0) << 8) | (u8(rest, 1) << 16) |
              (u8(rest, 2) << 24)
            if (size < 5) throw new java.io.IOException(
              s"$file: BSON document declares $size bytes (minimum 5)")
            // mongo's hard document limit is 16 MiB (+16 KiB internal
            // overhead); a corrupt size prefix must fail HERE, not as a
            // 2 GB allocation attempt
            if (size > (16 << 20) + (16 << 10)) throw new java.io.IOException(
              s"$file: BSON document declares $size bytes — beyond " +
                "mongo's 16 MiB document limit, corrupt dump")
            val body = readFully(in, size - 4)
            require(body(body.length - 1) == 0,
              s"$file: BSON document missing trailing NUL")
            val sb = new java.lang.StringBuilder(size * 2)
            // corrupt element payloads (truncated cstrings, bad lengths)
            // overrun the body array — surface as one loud IOException
            // with the file name, not a bare AIOOBE deep in a task
            // IndexOutOfBounds covers array AND string slicing; a
            // negative declared string/binary length surfaces as
            // NegativeArraySizeException from the copy
            try renderDoc(body, 0, body.length - 1, asArray = false, sb)
            catch {
              case e @ (_: IndexOutOfBoundsException |
                        _: NegativeArraySizeException) =>
                throw new java.io.IOException(
                  s"$file: corrupt BSON document (element payload " +
                    s"overruns the declared $size-byte frame)", e)
            }
            nextDoc = sb.toString
          }
        }
      }
      def hasNext: Boolean = { advance(); !done }
      def next(): String = {
        advance()
        if (done) throw new NoSuchElementException("BSON stream exhausted")
        val d = nextDoc; nextDoc = null; d
      }
    }

  /** The raw JSON-text bridge — one string per BSON document. Exposed
    * for pipelines that want their own parse options. */
  def jsonStrings(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    val files = FileList.resolve(spark, path, Set(".bson"))
    val confB = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    FileList.asDataset(spark, files)
      .mapPartitions { paths =>
        val conf = confB.value.value
        paths.flatMap { f =>
          val p = new Path(f)
          val in = new DataInputStream(
            new java.io.BufferedInputStream(p.getFileSystem(conf).open(p)))
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try in.close() catch { case _: java.io.IOException => () }))
          val it = documents(in, f)
          new Iterator[String] {
            def hasNext: Boolean = {
              val h = it.hasNext
              if (!h) try in.close() catch { case _: java.io.IOException => () }
              h
            }
            def next(): String = it.next()
          }
        }
      }
  }

  /** Read `.bson` dump files under `path` as a DataFrame. Without
    * `schema`, Spark's JSON inference runs one extra pass; pin the
    * schema at scale. */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val ds = jsonStrings(spark, path)
    schema match {
      case Some(s) => spark.read.schema(s).json(ds)
      case None => spark.read.json(ds)
    }
  }

  // -------------------------------------------------------- fixture I/O

  private def writeCString(out: java.io.ByteArrayOutputStream,
                           s: String): Unit = {
    out.write(s.getBytes("UTF-8")); out.write(0)
  }
  private def writeLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def writeLe64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeLe32(out, v.toInt); writeLe32(out, (v >> 32).toInt)
  }

  /** Serialize one BSON document (fixture/test tooling — mongodump owns
    * real dumps). Accepts Scala values plus the wrapper case classes
    * above; `Seq[(String, Any)]` = embedded document (ordered),
    * `Seq[Any]` = array. */
  def documentBytes(fields: Seq[(String, Any)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    def writeElem(name: String, v: Any): Unit = v match {
      case null => body.write(0x0A); writeCString(body, name)
      case x: Double =>
        body.write(0x01); writeCString(body, name)
        writeLe64(body, java.lang.Double.doubleToLongBits(x))
      case x: String =>
        body.write(0x02); writeCString(body, name)
        val b = x.getBytes("UTF-8")
        writeLe32(body, b.length + 1); body.write(b); body.write(0)
      case x: Boolean =>
        body.write(0x08); writeCString(body, name)
        body.write(if (x) 1 else 0)
      case x: Int =>
        body.write(0x10); writeCString(body, name); writeLe32(body, x)
      case x: Long =>
        body.write(0x12); writeCString(body, name); writeLe64(body, x)
      case ObjectId(hex) =>
        body.write(0x07); writeCString(body, name)
        hex.grouped(2).foreach(h => body.write(Integer.parseInt(h, 16)))
      case BsonBinary(bytes, subtype) =>
        body.write(0x05); writeCString(body, name)
        if (subtype == 2) {
          // old binary (pre-2.x drivers): the payload wraps an inner
          // int32 length per the spec — the writer adds it so callers
          // pass LOGICAL payloads on every subtype
          writeLe32(body, bytes.length + 4); body.write(subtype)
          writeLe32(body, bytes.length); body.write(bytes)
        } else {
          writeLe32(body, bytes.length); body.write(subtype)
          body.write(bytes)
        }
      case BsonDateTime(ms) =>
        body.write(0x09); writeCString(body, name); writeLe64(body, ms)
      case BsonTimestamp(raw) =>
        body.write(0x11); writeCString(body, name); writeLe64(body, raw)
      case BsonRegex(p, opts) =>
        body.write(0x0B); writeCString(body, name)
        writeCString(body, p); writeCString(body, opts)
      case BsonDecimal128(hi, lo) =>
        body.write(0x13); writeCString(body, name)
        writeLe64(body, lo); writeLe64(body, hi)
      case MinKey => body.write(0xFF); writeCString(body, name)
      case MaxKey => body.write(0x7F); writeCString(body, name)
      case doc: Seq[_] if doc.nonEmpty &&
          doc.head.isInstanceOf[(_, _)] &&
          doc.head.asInstanceOf[(_, _)]._1.isInstanceOf[String] =>
        body.write(0x03); writeCString(body, name)
        body.write(documentBytes(doc.asInstanceOf[Seq[(String, Any)]]))
      case arr: Seq[_] =>
        body.write(0x04); writeCString(body, name)
        body.write(documentBytes(
          arr.zipWithIndex.map { case (x, i) => i.toString -> x }))
      case other => throw new IllegalArgumentException(
        s"unsupported fixture value for '$name': $other")
    }
    fields.foreach { case (n, v) => writeElem(n, v) }
    val out = new java.io.ByteArrayOutputStream()
    writeLe32(out, body.size() + 5)
    body.writeTo(out)
    out.write(0)
    out.toByteArray
  }

  /** Write documents as `dir/<collection>.bson` (mongodump layout) and
    * return the file path. Fixture tooling. */
  def writeDump(spark: SparkSession, dir: String, collection: String,
                docs: Seq[Array[Byte]]): String = {
    val f = new Path(s"$dir/$collection.bson")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(f.getParent)
    val out = fs.create(f, true)
    try docs.foreach(out.write) finally out.close()
    f.toString
  }
}
