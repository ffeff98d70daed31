package graft.sources

import java.io.DataInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SAS7BDAT reader — hand-rolled against the publicly documented format
  * (the community reverse-engineered spec behind every open-source SAS
  * reader; reference surface: contrib/format-sas/.../SasBatchReader.java,
  * which wraps the parso library). Same posture as the XLSX/PDF/Avro
  * readers: no external parser, the binary layout is decoded directly.
  *
  * Layout: a header (magic, 32/64-bit flag, endianness, page size/count),
  * then fixed-size pages. Meta/mix pages carry subheaders (row size,
  * column count, column text blocks, column name pointers, column
  * attributes); mix and data pages carry packed rows. Column values are
  * IEEE doubles (possibly truncated to 3-7 bytes — the stored bytes are
  * the most significant ones) or space-padded chars.
  *
  * Scope: little-endian files, both 32-bit and 64-bit variants,
  * UNCOMPRESSED pages (compressed files raise a clear error naming the
  * compression). Fixtures are cross-validated against an independent
  * parser (pandas.read_sas) at generation time. Missing numerics decode
  * as NaN and surface as null; files parallelize one task per file.
  */
object SasReader {

  private val Magic = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  private[graft] case class Column(name: String, rowOffset: Int, width: Int,
                                   isNum: Boolean)
  private[graft] case class Meta(u64: Boolean, pageLen: Int, pageCount: Long,
                                 rowLen: Int, rowCount: Long, mixRowCount: Long,
                                 columns: Seq[Column])

  private def leU16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
  private def leU32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xFFL) << 24) | ((b(o + 2) & 0xFFL) << 16) |
      ((b(o + 1) & 0xFFL) << 8) | (b(o) & 0xFFL)
  private def leU64(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xFFL); i -= 1 }
    v
  }
  private def uint(b: Array[Byte], o: Int, len: Int): Long =
    if (len == 8) leU64(b, o) else leU32(b, o)

  /** Parse header + all metadata subheaders; returns meta and the fully
    * buffered pages (read sequentially — SAS pages are a linked scan). */
  private[graft] def parseMeta(in: DataInputStream): (Meta, Iterator[Array[Byte]]) = {
    val hdr0 = new Array[Byte](288)
    in.readFully(hdr0)
    require(hdr0.take(32).sameElements(Magic), "not a sas7bdat file (bad magic)")
    val u64 = hdr0(32) == '3'.toByte
    val align1 = if (hdr0(35) == '3'.toByte) 4 else 0
    require(hdr0(37) == 0x01.toByte,
      "big-endian sas7bdat unsupported (little-endian only)")
    val intLen = if (u64) 8 else 4
    val headerLen = leU32(hdr0, 196 + align1).toInt
    val pageLen = leU32(hdr0, 200 + align1).toInt
    val pageCount = uint(hdr0, 204 + align1, intLen)
    require(pageLen > 0 && pageLen <= (1 << 24), s"implausible page size $pageLen")
    in.skipNBytes(headerLen - 288)

    val bitOff = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12

    var rowLen = 0L; var rowCount = 0L; var mixRows = 0L; var colCount = 0
    val textBlocks = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val namePtrs = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    val attrs = scala.collection.mutable.ArrayBuffer[(Int, Int, Boolean)]()

    def sig4(b: Array[Byte], o: Int): Long = leU32(b, o)
    val SigRow = 0xF7F7F7F7L; val SigColSize = 0xF6F6F6F6L
    val SigText = 0xFFFFFFFDL; val SigName = 0xFFFFFFFFL
    val SigAttr = 0xFFFFFFFCL

    def processMetaPage(page: Array[Byte]): Unit = {
      val nsub = leU16(page, bitOff + 4)
      var i = 0
      while (i < nsub) {
        val p = bitOff + 8 + ptrLen * i
        val off = uint(page, p, intLen).toInt
        val len = uint(page, p + intLen, intLen).toInt
        val compression = page(p + 2 * intLen) & 0xFF
        if (len > 0 && compression != 1) { // 1 = truncated
          require(compression != 4,
            "compressed sas7bdat unsupported (RLE/RDC page compression)")
          // 64-bit signatures repeat the 4-byte pattern through byte 8;
          // matching the first 4 bytes covers both widths
          sig4(page, off) match {
            case SigRow =>
              rowLen = uint(page, off + 5 * intLen, intLen)
              rowCount = uint(page, off + 6 * intLen, intLen)
              mixRows = uint(page, off + 15 * intLen, intLen)
            case SigColSize =>
              colCount = uint(page, off + intLen, intLen).toInt
            case SigText =>
              val size = leU16(page, off + intLen)
              val blob = java.util.Arrays.copyOfRange(page, off + intLen,
                off + intLen + size)
              require(!new String(blob, "US-ASCII").contains("SASYZCR"),
                "compressed sas7bdat unsupported (SASYZCRL/SASYZCR2)")
              textBlocks += blob
            case SigName =>
              val n = (len - 2 * intLen - 12) / 8
              var j = 0
              while (j < n) {
                val base = off + intLen + 8 * (j + 1)
                namePtrs += ((leU16(page, base), leU16(page, base + 2),
                  leU16(page, base + 4)))
                j += 1
              }
            case SigAttr =>
              val stride = intLen + 8
              val n = (len - 2 * intLen - 12) / stride
              var j = 0
              while (j < n) {
                val ro = uint(page, off + intLen + 8 + j * stride, intLen).toInt
                val w = leU32(page, off + 2 * intLen + 8 + j * stride).toInt
                val t = page(off + 2 * intLen + 14 + j * stride) & 0xFF
                attrs += ((ro, w, t == 1))
                j += 1
              }
            case _ => () // format/label/list/counts: not needed here
          }
        }
        i += 1
      }
    }

    // read pages until column metadata is complete, buffering them so the
    // row pass can replay from the start. A file truncated mid-page
    // (partial copy) stops cleanly at the last whole page, like the
    // other binary readers.
    val bufferedPages = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pagesRead = 0L
    var truncated = false
    def readPage(): Option[Array[Byte]] =
      if (truncated || pagesRead >= pageCount) None
      else {
        val pg = new Array[Byte](pageLen)
        try { in.readFully(pg) } catch {
          case _: java.io.EOFException => truncated = true; return None
        }
        pagesRead += 1
        bufferedPages += pg
        Some(pg)
      }
    var done = false
    while (!done) {
      readPage() match {
        case None => done = true
        case Some(pg) =>
          val ptype = leU16(pg, bitOff) & 0xFF00
          if (ptype == 0x0000 || ptype == 0x4000 || ptype == 0x0200)
            processMetaPage(pg)
          if (colCount > 0 && namePtrs.length >= colCount &&
              attrs.length >= colCount) done = true
      }
    }
    require(colCount > 0 && namePtrs.length >= colCount &&
        attrs.length >= colCount,
      s"incomplete sas7bdat metadata (cols=$colCount " +
        s"names=${namePtrs.length} attrs=${attrs.length})")

    val columns = (0 until colCount).map { i =>
      val (blk, no, nl) = namePtrs(i)
      val name = new String(textBlocks(blk), no, nl, "US-ASCII")
      val (ro, w, isNum) = attrs(i)
      Column(name, ro, w, isNum)
    }
    val meta = Meta(u64, pageLen, pageCount, rowLen.toInt, rowCount, mixRows, columns)

    val rest = new Iterator[Array[Byte]] {
      private var fromBuf = 0
      private var pending: Array[Byte] = _
      def hasNext: Boolean =
        fromBuf < bufferedPages.length || pending != null || {
          if (truncated || pagesRead >= pageCount) false
          else {
            val pg = new Array[Byte](pageLen)
            try { in.readFully(pg); pagesRead += 1; pending = pg; true }
            catch { case _: java.io.EOFException => truncated = true; false }
          }
        }
      def next(): Array[Byte] =
        if (fromBuf < bufferedPages.length) {
          val p = bufferedPages(fromBuf); fromBuf += 1; p
        } else { val p = pending; pending = null; p }
    }
    (meta, rest)
  }

  /** Decode all rows of one file given its meta + page iterator. */
  private[graft] def rows(meta: Meta, pages: Iterator[Array[Byte]]): Iterator[Row] = {
    val bitOff = if (meta.u64) 32 else 16
    val ptrLen = if (meta.u64) 24 else 12
    val intLen = if (meta.u64) 8 else 4
    var remaining = meta.rowCount

    def decodeRow(page: Array[Byte], base: Int): Row = {
      val vals = meta.columns.map { c =>
        if (c.isNum) {
          // truncated doubles store the MOST significant bytes: right-align
          // into the 8-byte little-endian representation
          var bits = 0L
          var j = 0
          while (j < c.width) {
            bits |= (page(base + c.rowOffset + j) & 0xFFL) << (8 * (8 - c.width + j))
            j += 1
          }
          val d = java.lang.Double.longBitsToDouble(bits)
          if (java.lang.Double.isNaN(d)) null else java.lang.Double.valueOf(d)
        } else {
          // space/NUL padding trims from the RIGHT only (interior spaces
          // are data)
          val st = base + c.rowOffset
          var end = st + c.width
          while (end > st && (page(end - 1) == 32 || page(end - 1) == 0)) end -= 1
          if (end == st) null else new String(page, st, end - st, "UTF-8")
        }
      }
      Row.fromSeq(vals)
    }

    pages.flatMap { page =>
      if (remaining <= 0) Iterator.empty
      else {
        val ptype = leU16(page, bitOff) & 0xFF00
        val blockCount = leU16(page, bitOff + 2)
        val nsub = leU16(page, bitOff + 4)
        val (start, n) =
          if (ptype == 0x0200) { // mix page: rows follow the pointer area
            val raw = bitOff + 8 + nsub * ptrLen
            val aligned = raw + (raw % 8)
            (aligned, math.min(meta.mixRowCount, remaining))
          } else if (ptype == 0x0100) { // data page
            (bitOff + 8, math.min(blockCount.toLong, remaining))
          } else (0, 0L)
        val out = (0L until n).iterator.map(r =>
          decodeRow(page, start + (r * meta.rowLen).toInt))
        remaining -= n
        out
      }
    }
  }

  def schemaOf(meta: Meta): StructType = StructType(meta.columns.map(c =>
    StructField(c.name, if (c.isNum) DoubleType else StringType, nullable = true)))

  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = FileList.resolve(spark, path, Set(".sas7bdat"))
    // schema from the first file (driver-side, metadata pages only)
    val schema = {
      val fp = new Path(files.head)
      val in = new DataInputStream(fp.getFileSystem(conf).open(fp))
      try schemaOf(parseMeta(in)._1) finally in.close()
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
          val (meta, pages) = parseMeta(in)
          // schema-on-read degrade: align BY NAME like the SPSS/Access
          // readers (SchemaAlign) — positional binding mis-assigned
          // same-typed columns silently when a file's column ORDER
          // differed from the first file's
          val aligned = SchemaAlign.align(rows(meta, pages),
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
