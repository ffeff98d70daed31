package graft.sources

import java.util.zip.Inflater
import scala.collection.mutable
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal PDF text reader — the capability surface of Drill's
  * contrib/format-pdf (which wraps PDFBox): text shown by `Tj`/`TJ`
  * operators in content streams, one row per extracted string with its
  * stream index and in-stream order. Scope is the simple-text case:
  * uncompressed or FlateDecode content streams, literal `(...)` strings
  * with the standard escapes. Anything unparseable is skipped, not fatal
  * (schema-on-read over mixed document piles).
  *
  * Public-format ground truth: the PDF 1.7 spec (ISO 32000) — content
  * streams sit between `stream`/`endstream` keywords, the preceding
  * dictionary names the filter, and text-showing operators carry literal
  * strings. One task per file, like the other hand-rolled readers.
  */
object PdfReader {

  val schema: StructType = StructType(Seq(
    StructField("stream_idx", IntegerType, nullable = false),
    StructField("text_idx", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** All content-stream bodies (inflated if FlateDecode), in file order. */
  private[graft] def contentStreams(bytes: Array[Byte]): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val hay = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    var from = 0
    while (from < hay.length) {
      val s = hay.indexOf("stream", from)
      if (s < 0) return out.toSeq
      // the dictionary for this stream is the balanced << ... >> ending
      // immediately before `stream` — a nested sub-dictionary (e.g.
      // /Resources << /Font << ... >> >>) must not hide the outer
      // /Filter entry, so scan BACKWARD matching >> against <<
      val dict = {
        var k = s - 1
        while (k >= 0 && hay.charAt(k).isWhitespace) k -= 1
        if (k >= 1 && hay.charAt(k) == '>' && hay.charAt(k - 1) == '>') {
          var depth = 1 // the trailing >> just consumed
          var start = -1
          var m = k - 2
          while (m >= 1 && start < 0) {
            if (hay.charAt(m) == '>' && hay.charAt(m - 1) == '>') {
              depth += 1; m -= 2
            } else if (hay.charAt(m) == '<' && hay.charAt(m - 1) == '<') {
              depth -= 1
              if (depth == 0) start = m - 1 else m -= 2
            } else m -= 1
          }
          if (start >= 0) hay.substring(start, s) else ""
        } else ""
      }
      var bodyStart = s + "stream".length
      if (bodyStart < hay.length && hay.charAt(bodyStart) == '\r') bodyStart += 1
      if (bodyStart < hay.length && hay.charAt(bodyStart) == '\n') bodyStart += 1
      val e = hay.indexOf("endstream", bodyStart)
      if (e < 0) return out.toSeq
      var bodyEnd = e
      if (bodyEnd > bodyStart && hay.charAt(bodyEnd - 1) == '\n') bodyEnd -= 1
      if (bodyEnd > bodyStart && hay.charAt(bodyEnd - 1) == '\r') bodyEnd -= 1
      val body = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd)
      // filter handling: no /Filter -> raw text scan; EXACTLY
      // FlateDecode -> inflate; anything else (DCTDecode images, filter
      // CHAINS like [/ASCII85Decode /FlateDecode]) SKIPS — inflating an
      // ASCII85-wrapped stream fails and a raw scan of image bytes can
      // emit garbage "(...)Tj"-shaped rows
      val hasFilter = dict.contains("/Filter")
      val flateOnly = dict.contains("/FlateDecode") &&
        !"/(ASCII85Decode|ASCIIHexDecode|LZWDecode|RunLengthDecode|DCTDecode|CCITTFaxDecode|JBIG2Decode|JPXDecode|Crypt)"
          .r.findFirstIn(dict).isDefined
      val decoded: Option[Array[Byte]] =
        if (!hasFilter) Some(body)
        else if (flateOnly) inflate(body)
        else None
      decoded.foreach(b =>
        out += new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
      from = e + "endstream".length
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(chunk)
        // n == 0 and not finished means the inflater is STUCK: truncated
        // input (needsInput) or an FDICT preset-dictionary stream
        // (needsDictionary) — checking only needsInput spun forever on
        // the dictionary case
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        buf.write(chunk, 0, n)
      }
      Some(buf.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end() // native zlib buffers — every exit path must free
  }

  /** Parse one `(...)` literal starting at `open`; returns (decoded text,
    * index just past the closing paren). Standard escapes + nesting. */
  private def parseLiteral(stream: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var j = open + 1
    var depth = 1
    while (j < stream.length && depth > 0) {
      stream.charAt(j) match {
        case '\\' if j + 1 < stream.length =>
          stream.charAt(j + 1) match {
            case 'n' => sb.append('\n'); j += 2
            case 'r' => sb.append('\r'); j += 2
            case 't' => sb.append('\t'); j += 2
            case 'b' => sb.append('\b'); j += 2
            case 'f' => sb.append('\f'); j += 2
            case d if d >= '0' && d <= '7' =>
              // octal escape \ddd (1-3 digits) — the normal encoding
              // for accented/non-ASCII chars in PDF literals
              var k = j + 1
              var v = 0
              while (k < stream.length && k < j + 4 &&
                  stream.charAt(k) >= '0' && stream.charAt(k) <= '7') {
                v = v * 8 + (stream.charAt(k) - '0'); k += 1
              }
              // ISO 32000 7.3.4.2: high-order overflow of \ddd is
              // ignored (value mod 256) — \401 is 0x01, not U+0101
              sb.append((v & 0xFF).toChar); j = k
            case '\r' =>
              // backslash-newline is a line CONTINUATION: no output
              j += (if (j + 2 < stream.length && stream.charAt(j + 2) == '\n') 3 else 2)
            case '\n' => j += 2
            case c => sb.append(c); j += 2
          }
        case '(' => depth += 1; sb.append('('); j += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          j += 1
        case c => sb.append(c); j += 1
      }
    }
    (sb.toString, j)
  }

  /** Does the next non-whitespace run at/after `from` start with `tok`?
    * Index scan — substring copies here made extraction quadratic. */
  private def nextTokenIs(stream: String, from: Int, tok: String): Boolean = {
    var k = from
    while (k < stream.length && stream.charAt(k).isWhitespace) k += 1
    stream.regionMatches(k, tok, 0, tok.length) && {
      // the operator must END there (whitespace/delimiter/EOF): a token
      // merely STARTING with Tj used to emit a phantom text row
      val a = k + tok.length
      a >= stream.length || {
        val c = stream.charAt(a)
        c.isWhitespace || "()<>[]{}/%".indexOf(c.toInt) >= 0
      }
    }
  }

  /** Literal strings shown by Tj / ' / " / TJ operators, in order. A TJ
    * array interleaves strings with kerning numbers — `[(Hel) -20 (lo)]
    * TJ` shows BOTH strings — so array members are buffered and emitted
    * together iff the array is followed by TJ; standalone literals count
    * when the next token (across any whitespace, newlines included) is a
    * text-showing operator. */
  private[graft] def textOps(stream: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var arrayBuf: mutable.ArrayBuffer[String] = null
    var i = 0
    while (i < stream.length) {
      stream.charAt(i) match {
        case '[' =>
          arrayBuf = mutable.ArrayBuffer.empty
          i += 1
        case ']' =>
          if (arrayBuf != null && nextTokenIs(stream, i + 1, "TJ"))
            out ++= arrayBuf
          arrayBuf = null
          i += 1
        case '(' =>
          val (text, j) = parseLiteral(stream, i)
          if (arrayBuf != null) arrayBuf += text
          else if (nextTokenIs(stream, j, "Tj") ||
              nextTokenIs(stream, j, "'") || nextTokenIs(stream, j, "\""))
            out += text
          i = j
        case _ => i += 1
      }
    }
    out.toSeq
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    FileList.asDataset(spark, path, Set(".pdf"))
      .mapPartitions { paths =>
        val conf2 = sconf.value
        paths.flatMap { f =>
          val fp = new Path(f)
          val in = fp.getFileSystem(conf2).open(fp)
          val bytes = try in.readAllBytes() finally in.close()
          contentStreams(bytes).zipWithIndex.flatMap { case (cs, si) =>
            textOps(cs).zipWithIndex.map { case (t, ti) => Row(si, ti, t) }
          }
        }
      }(enc).toDF(schema.fieldNames: _*)
  }
}
