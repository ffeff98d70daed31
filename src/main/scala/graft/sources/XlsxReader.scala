package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** XLSX (OOXML spreadsheet) reader for the flat cell-grid case — header
  * row + data rows, Drill's most-used self-describing office format
  * (reference contrib/format-excel/.../ExcelBatchReader.java). Drill
  * reads through Apache POI's streaming reader; no POI ships in this
  * container, and an XLSX is just a zip of small XML parts, so this
  * parses the two relevant parts (sharedStrings + first worksheet)
  * directly with the JDK's StAX and zip readers.
  *
  * Scale shape matches AvroReader: one task per file (a workbook is not
  * block-splittable), schema inferred once from the first file on the
  * driver, decode on executors via mapPartitions. Memory per task is
  * bounded by one workbook's XML parts.
  *
  * Column types are inferred per column over the data rows: all-integral
  * -> long, all-numeric -> double, otherwise string; missing cells (XLSX
  * omits empty cells entirely) -> null.
  */
object XlsxReader {

  /** One worksheet as raw string cells: (headers, rows), rows keyed by
    * 0-based column index with nulls for omitted cells. */
  private[graft] def parseGrid(in: InputStream): (Array[String], Seq[Array[String]]) = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sharedBytes: Array[Byte] = null
    // the first worksheet is whatever sheetN.xml has the LOWEST N — a
    // workbook whose original Sheet1 was deleted ships sheet2.xml (or
    // higher) as its only part, and hardcoding sheet1 rejected it
    val SheetName = "xl/worksheets/sheet(\\d+)\\.xml".r
    // buffer ONLY the lowest-numbered sheet seen so far (zip order is
    // arbitrary, so a running minimum — not a map of every sheet: a
    // 50-sheet workbook would otherwise hold all 50 parts in memory to
    // use one)
    var sheetMin = Int.MaxValue
    var sheetBytes0: Array[Byte] = null
    val zin = new ZipInputStream(in)
    try {
      var e = zin.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" => sharedBytes = zin.readAllBytes()
          case SheetName(n) if n.toInt < sheetMin =>
            sheetMin = n.toInt
            sheetBytes0 = zin.readAllBytes()
          case _ =>
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetBytes0 != null, "no xl/worksheets/sheetN.xml in workbook")
    val sheetBytes = sheetBytes0
    if (sharedBytes != null) shared = parseSharedStrings(sharedBytes)

    val rows = mutable.ArrayBuffer.empty[Array[String]]
    var maxCol = -1
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(sheetBytes))
    var cells: mutable.ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    // ECMA-376 makes c/@r OPTIONAL (absent = next sequential column);
    // minimal/streaming generators omit it — dropping those cells read
    // a valid workbook as empty
    var nextCol = 0
    var cellType = ""
    var inV = false
    var inIs = false
    // inline strings carry phonetic runs (<rPh> furigana) too — same
    // exclusion parseSharedStrings applies, or the hint text corrupts
    // the cell value
    var phonDepth = 0
    val vText = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => cells = mutable.ArrayBuffer.empty; nextCol = 0
          case "c" =>
            cellCol = Option(attr(r, "r")).map(colIndex).getOrElse(nextCol)
            nextCol = cellCol + 1
            cellType = Option(attr(r, "t")).getOrElse("")
          case "v" => inV = true; vText.clear()
          // rich-text inline strings hold MULTIPLE <r><t>run</t></r> runs
          // (partial formatting); the cell value is their concatenation,
          // so the buffer clears once per cell, not per run
          case "is" => inIs = true; phonDepth = 0; vText.clear()
          case "rPh" | "phoneticPr" if inIs => phonDepth += 1
          case "t" if inIs && phonDepth == 0 => inV = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV => vText.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false; emitCell(cells, cellCol, cellType, vText.toString, shared)
          case "rPh" | "phoneticPr" if inIs => phonDepth -= 1
          case "t" if inIs => inV = false
          case "is" => inIs = false; emitCell(cells, cellCol, "str", vText.toString, shared)
          case "row" if cells != null && cells.nonEmpty =>
            maxCol = math.max(maxCol, cells.map(_._1).max)
            rows += cells.toArray.sortBy(_._1).foldLeft(
              new Array[String](cells.map(_._1).max + 1)) { (arr, c) =>
                arr(c._1) = c._2; arr
              }
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    require(rows.nonEmpty, "empty worksheet")
    val width = maxCol + 1
    val grid = rows.map(row =>
      if (row.length == width) row else row.padTo(width, null.asInstanceOf[String]))
    val headers = grid.head.zipWithIndex.map { case (h, i) =>
      if (h == null || h.isEmpty) s"col$i" else h }
    (headers.toArray, grid.drop(1).toSeq)
  }

  private def emitCell(cells: mutable.ArrayBuffer[(Int, String)], colIdx: Int,
                       cellType: String, raw: String,
                       shared: IndexedSeq[String]): Unit = {
    if (cells != null && colIdx >= 0) {
      val v = cellType match {
        // a missing/short sharedStrings part or malformed index degrades
        // to null (schema-on-read), it does not fail the task
        case "s" => raw.trim.toIntOption
          .filter(i => i >= 0 && i < shared.length).map(shared).orNull
        case _ => raw
      }
      cells += ((colIdx, v))
    }
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(bytes))
    var inSi = false
    // phonetic-run elements (<rPh>, Japanese furigana hints) carry their
    // own <t> text that is NOT part of the cell value — concatenating it
    // corrupted every shared string with phonetic hints
    var phoneticDepth = 0
    // only text INSIDE <t> counts: pretty-printed parts have whitespace
    // CHARACTERS runs between elements that would otherwise concatenate
    // into the value
    var inT = false
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          inSi = true; phoneticDepth = 0; inT = false; sb.clear()
        case XMLStreamConstants.START_ELEMENT
            if inSi && (r.getLocalName == "rPh" || r.getLocalName == "phoneticPr") =>
          phoneticDepth += 1
        case XMLStreamConstants.END_ELEMENT
            if inSi && (r.getLocalName == "rPh" || r.getLocalName == "phoneticPr") =>
          phoneticDepth -= 1
        case XMLStreamConstants.START_ELEMENT
            if inSi && r.getLocalName == "t" => inT = true
        case XMLStreamConstants.END_ELEMENT
            if inSi && r.getLocalName == "t" => inT = false
        case XMLStreamConstants.CHARACTERS
            if inSi && phoneticDepth == 0 && inT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  private def attr(r: javax.xml.stream.XMLStreamReader, name: String): String =
    r.getAttributeValue(null, name)

  /** "BC7" -> column index 54 (0-based). */
  private[graft] def colIndex(ref: String): Int = {
    if (ref == null) return -1
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private val LongRe = "^-?\\d+$".r
  private val DoubleRe = "^-?\\d*\\.?\\d+([eE][+-]?\\d+)?$".r

  private def inferType(values: Seq[String]): DataType = {
    val present = values.filter(v => v != null && v.nonEmpty)
    // toLongOption, not the regex alone: an all-digit value beyond Long
    // range ("99999999999999999999") regex-matched LongType and then
    // cast() nulled the ENTIRE column; out-of-range integrals fall to
    // Double (magnitude preserved) like Spark's own CSV inference
    if (present.nonEmpty && present.forall(v =>
        LongRe.matches(v) && v.toLongOption.isDefined)) LongType
    else if (present.nonEmpty && present.forall(DoubleRe.matches(_))) DoubleType
    else StringType
  }

  private def cast(v: String, dt: DataType): Any =
    if (v == null || (v.isEmpty && dt != StringType)) null
    else dt match {
      // types are inferred from the FIRST workbook only — a later file's
      // non-numeric cell in a numeric-inferred column yields null
      // (schema-on-read: dirty files degrade, they don't fail the task)
      case LongType => v.toLongOption.map(Long.box).orNull
      case DoubleType => v.toDoubleOption.map(Double.box).orNull
      case _ => v
    }

  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = FileList.resolve(spark, path, Set(".xlsx")) // listed ONCE

    // schema from the first workbook (driver-side, one small file)
    val (headers, firstRows) = {
      val fp = new Path(files.head)
      val in = fp.getFileSystem(conf).open(fp)
      try parseGrid(in) finally in.close()
    }
    val types = headers.indices.map(i => inferType(firstRows.map(r =>
      if (i < r.length) r(i) else null)))
    val schema = StructType(headers.zip(types).map {
      case (h, t) => StructField(h, t, nullable = true) })

    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val width = headers.length
    // session Hadoop conf rides to executors — a bare Configuration()
    // dropped fs credentials/endpoints (s3a etc.), same fix as
    // v2/PcapDataSource
    val sconf = new SerializableHadoopConf(conf)
    FileList.asDataset(spark, files)
      .mapPartitions { paths =>
        val conf2 = sconf.value
        paths.flatMap { f =>
          val fp = new Path(f)
          val in = fp.getFileSystem(conf2).open(fp)
          val (fHeaders, rows) = try parseGrid(in) finally in.close()
          // NAME alignment per file (the SchemaAlign contract): a later
          // workbook whose column ORDER differs must map by header, not
          // position — positional binding silently mis-assigned values.
          // A header absent from this file null-fills; extra columns drop.
          val idx: Array[Int] = headers.map { h =>
            val exact = fHeaders.indexOf(h)
            if (exact >= 0) exact
            else fHeaders.indexWhere(_.equalsIgnoreCase(h))
          }
          rows.iterator.map { r =>
            Row.fromSeq((0 until width).map { i =>
              val j = idx(i)
              cast(if (j >= 0 && j < r.length) r(j) else null, types(i))
            })
          }
        }
      }(enc).toDF(headers: _*)
  }
}
