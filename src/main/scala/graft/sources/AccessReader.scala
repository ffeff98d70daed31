package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** MS Access (.mdb/.accdb) reader — hand-rolled against the publicly
  * documented Jet/ACE database layout (the mdbtools HACKING specification,
  * the community reverse-engineering every open-source reader builds on;
  * reference surface: contrib/format-access/.../MSAccessBatchReader.java,
  * which wraps the Jackcess library — no code shared, only the output
  * contract). Same posture as the SAS/SPSS/HDF5 readers.
  *
  * Layout decoded (Jet 3, Jet 4, and ACE — 2048- or 4096-byte pages,
  * per-version TDEF/row layouts and text encodings):
  * the MSysObjects system catalog rooted at its fixed table-definition
  * page 2, table-definition pages (column count/types/flags/offsets,
  * UTF-16 names, continuation pages), data pages located by their
  * owner-TDEF back-pointer, row cracking (fixed columns at their declared
  * offsets, variable columns through the end-of-row offset table, null
  * bitmask, overflow-row pointers), LVAL long-value pages for memo
  * columns, and the Jet compressed-UTF-16 text encoding.
  *
  * Types: BOOL (null-bit encoded), BYTE/INT/LONG, CURRENCY →
  * Decimal(19,4) (the EXACT scaled value — the reference's scale-0
  * VARDECIMAL default rounds 3.5 to 4; graft keeps the Jackcess-decoded
  * value), FLOAT/DOUBLE, DATETIME (days since 1899-12-30 → UTC
  * timestamp), NUMERIC → Decimal(prec, scale), TEXT/MEMO → string,
  * GUID → canonical string, BINARY/OLE → binary, ACE "Date/Time
  * Extended" (days since 0001-01-01 + 100 ns ticks, ASCII-encoded) →
  * UTC timestamp, calculated datetime columns (tagged value blob).
  *
  * Two read modes mirror the reference: catalog browse (one row per user
  * table: table/created_date/updated_date/row_count/col_count/columns)
  * and table projection (`tableName`). Files parallelize one task per
  * file; the page scan is sequential per file.
  */
object AccessReader {

  /** Per-version layout constants (the mdbtools-documented Jet 3 / Jet 4
    * divergences: page size, data-page header width, TDEF field offsets,
    * column-entry shape, name encoding, row header/offset widths). */
  private[graft] case class Fmt(pg: Int, dpNumRows: Int, dpRowsOff: Int,
                                tdNumRows: Int, tdNumVar: Int, tdNumCols: Int,
                                tdNumRidx: Int, tdColsBase: Int, tdRidxSize: Int,
                                colEntry: Int, jet3: Boolean)
  private val Jet4 = Fmt(4096, 12, 14, 16, 43, 45, 51, 63, 12, 25, jet3 = false)
  private val Jet3 = Fmt(2048, 8, 10, 12, 23, 25, 31, 43, 8, 18, jet3 = true)
  private val DaysToEpoch = 25569L      // 1899-12-30 -> 1970-01-01
  private val Ce1ToEpochDays = 719162L  // 0001-01-01 -> 1970-01-01

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xFFL) << 24) | ((b(o + 2) & 0xFFL) << 16) |
      ((b(o + 1) & 0xFFL) << 8) | (b(o) & 0xFFL)
  private def i16(b: Array[Byte], o: Int): Short = u16(b, o).toShort
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt
  private def i64(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xFFL); i -= 1 }
    v
  }
  private def f64(b: Array[Byte], o: Int): Double =
    java.lang.Double.longBitsToDouble(i64(b, o))
  private def f32(b: Array[Byte], o: Int): Float =
    java.lang.Float.intBitsToFloat(i32(b, o))

  private[graft] case class Col(name: String, typ: Int, num: Int, varNum: Int,
                                fixed: Boolean, fixedOff: Int, size: Int,
                                prec: Int, scale: Int)
  private[graft] case class TableDef(numRows: Long, numVar: Int, cols: Seq[Col])

  private[graft] class Mdb(val bytes: Array[Byte]) {
    require(bytes.length >= 40 && bytes(4) == 'S'.toByte,
      "not an Access database (bad magic)")
    private val prod = new String(bytes, 4, 15, "ISO-8859-1")
    require(prod == "Standard Jet DB" || prod == "Standard ACE DB",
      s"not an Access database (product '$prod')")
    val fmt: Fmt = if (bytes(0x14) == 0) Jet3 else Jet4
    val pages: Int = bytes.length / fmt.pg
    def page(p: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, p * fmt.pg, (p + 1) * fmt.pg)
  }

  // ---- table definitions ----------------------------------------------
  private[graft] def readTdef(db: Mdb, pg: Int): TableDef = {
    val fmt = db.fmt
    val buf = db.page(pg)
    require(buf(0) == 0x02, s"page $pg is not a table definition")
    var full = buf
    var nxt = u32(buf, 4)
    while (nxt != 0) { // TDEF continuation pages chain via next_pg
      val nb = db.page(nxt.toInt)
      full = full ++ java.util.Arrays.copyOfRange(nb, 8, fmt.pg)
      nxt = u32(nb, 4)
    }
    val numRows = u32(full, fmt.tdNumRows)
    val numVar = u16(full, fmt.tdNumVar)
    val numCols = u16(full, fmt.tdNumCols)
    val numRealIdx = u32(full, fmt.tdNumRidx).toInt
    var pos = fmt.tdColsBase + numRealIdx * fmt.tdRidxSize
    val raw = (0 until numCols).map { _ =>
      val c =
        if (fmt.jet3)
          (full(pos) & 0xFF, full(pos + 1) & 0xFF, u16(full, pos + 3),
            (full(pos + 13) & 0x01) != 0, u16(full, pos + 14), u16(full, pos + 16),
            0, 0)
        else
          (full(pos) & 0xFF, u16(full, pos + 5), u16(full, pos + 7),
            (full(pos + 15) & 0x01) != 0, u16(full, pos + 21), u16(full, pos + 23),
            full(pos + 11) & 0xFF, full(pos + 12) & 0xFF)
      pos += fmt.colEntry
      c
    }
    val cols = raw.map { case (typ, num, varNum, fixed, fOff, size, prec, scale) =>
      val name =
        if (fmt.jet3) {
          val ln = full(pos) & 0xFF
          pos += 1
          val n = new String(full, pos, ln, "windows-1252")
          pos += ln
          n
        } else {
          val ln = u16(full, pos)
          pos += 2
          val n = new String(full, pos, ln, "UTF-16LE")
          pos += ln
          n
        }
      Col(name, typ, num, varNum, fixed, fOff, size, prec, scale)
    }
    TableDef(numRows, numVar, cols)
  }

  // ---- rows ------------------------------------------------------------
  /** Raw row slices of all data pages owned by a TDEF page. Two passes:
    * overflow pointers are collected first so their TARGET slots are not
    * emitted a second time when the overflow page itself is scanned. */
  private def rawRows(db: Mdb, tdefPg: Int): Iterator[Array[Byte]] = {
    val buf = db.bytes
    val fmt = db.fmt
    val PGn = fmt.pg
    val owned = (0 until db.pages).filter { p =>
      buf(p * PGn) == 0x01 && u32(buf, p * PGn + 4) == tdefPg
    }
    val overflowTargets = scala.collection.mutable.Set[(Int, Int)]()
    owned.foreach { p =>
      val base = p * PGn
      val n = u16(buf, base + fmt.dpNumRows)
      (0 until n).foreach { i =>
        val o = u16(buf, base + fmt.dpRowsOff + 2 * i)
        if ((o & 0x8000) == 0 && (o & 0x4000) != 0) {
          val ptr = u32(buf, base + (o & 0x1FFF))
          overflowTargets += (((ptr >> 8).toInt, (ptr & 0xFF).toInt))
        }
      }
    }
    owned.iterator.flatMap { p =>
      val base = p * PGn
      val n = u16(buf, base + fmt.dpNumRows)
      val offs = (0 until n).map(i => u16(buf, base + fmt.dpRowsOff + 2 * i))
      (0 until n).iterator.flatMap { i =>
        val o = offs(i)
        if ((o & 0x8000) != 0) None // deleted
        else if (overflowTargets.contains((p, i))) None // reached via pointer
        else {
          val start = o & 0x1FFF
          val end = if (i == 0) PGn else offs(i - 1) & 0x1FFF
          if (end <= start) None
          else if ((o & 0x4000) != 0) { // overflow: 1-byte row + 3-byte page
            val ptr = u32(buf, base + start)
            val row = (ptr & 0xFF).toInt
            val opg = (ptr >> 8).toInt
            val ob = opg * PGn
            val on = u16(buf, ob + fmt.dpNumRows)
            if (row >= on) None
            else {
              val s2 = u16(buf, ob + fmt.dpRowsOff + 2 * row) & 0x1FFF
              val e2 = if (row == 0) PGn
                       else u16(buf, ob + fmt.dpRowsOff + 2 * (row - 1)) & 0x1FFF
              if (e2 <= s2) None
              else Some(java.util.Arrays.copyOfRange(buf, ob + s2, ob + e2))
            }
          } else Some(java.util.Arrays.copyOfRange(buf, base + start, base + end))
        }
      }
    }
  }

  /** Jet text: UTF-16LE, or the compressed form (0xFF 0xFE marker): runs
    * of single-byte chars and UTF-16 pairs, a NUL lead byte toggling the
    * mode in BOTH directions (the mdbtools-documented algorithm — a
    * one-way toggle would garble ASCII following a UTF-16 run). */
  private def decodeText(b: Array[Byte], jet3: Boolean = false): String =
    if (jet3) new String(b, "windows-1252") // Jet 3 text is single-byte
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE) {
      val sb = new java.lang.StringBuilder
      var i = 2
      var compressed = true
      while (i < b.length) {
        if (b(i) == 0) { compressed = !compressed; i += 1 }
        else if (compressed) { sb.append((b(i) & 0xFF).toChar); i += 1 }
        else if (i + 1 < b.length) {
          sb.append(new String(b, i, 2, "UTF-16LE")); i += 2
        } else i += 1
      }
      sb.toString
    } else new String(b, "UTF-16LE")

  /** Memo/OLE long value: 12-byte descriptor — length+flags, LVAL row
    * pointer. Returns raw bytes (caller decodes text if memo). */
  private def readLongValue(db: Mdb, desc: Array[Byte]): Array[Byte] = {
    val lenFlags = u32(desc, 0)
    val len = (lenFlags & 0x3FFFFFFF).toInt
    val inline = (lenFlags & 0x80000000L) != 0
    val singlePage = (lenFlags & 0x40000000L) != 0
    if (inline) java.util.Arrays.copyOfRange(desc, 12, 12 + math.min(len, desc.length - 12))
    else {
      var ptr = u32(desc, 4)
      val out = new java.io.ByteArrayOutputStream()
      var remaining = len
      while (ptr != 0 && remaining > 0) {
        val row = (ptr & 0xFF).toInt
        val pg = (ptr >> 8).toInt
        val fmt = db.fmt
        val base = pg * fmt.pg
        val n = u16(db.bytes, base + fmt.dpNumRows)
        require(row < n, s"LVAL pointer row $row out of range")
        val s = u16(db.bytes, base + fmt.dpRowsOff + 2 * row) & 0x1FFF
        val e = if (row == 0) fmt.pg
                else u16(db.bytes, base + fmt.dpRowsOff + 2 * (row - 1)) & 0x1FFF
        if (singlePage) {
          out.write(db.bytes, base + s, math.min(remaining, e - s))
          ptr = 0
        } else { // chained: first 4 bytes of each chunk = next pointer
          val take = math.min(remaining, e - s - 4)
          // a corrupt chunk (e - s <= 4) makes no progress, and a
          // cyclic next-pointer chain would spin this loop forever —
          // fail loudly instead of pinning an executor core
          require(take > 0,
            s"corrupt LVAL chain: chunk at page $pg row $row yields " +
              s"$take bytes (remaining $remaining)")
          out.write(db.bytes, base + s + 4, take)
          remaining -= take
          ptr = u32(db.bytes, base + s)
        }
      }
      out.toByteArray
    }
  }

  private def guidString(b: Array[Byte], o: Int): String = {
    f"{${u32(b, o)}%08x-${u16(b, o + 4)}%04x-${u16(b, o + 6)}%04x-" +
      f"${(b(o + 8) & 0xFF)}%02x${(b(o + 9) & 0xFF)}%02x-" +
      (10 until 16).map(i => f"${(b(o + i) & 0xFF)}%02x").mkString + "}"
  }

  private[graft] def daysToTimestamp(days: Double): java.sql.Timestamp = {
    // OLE/Jet convention: the integer part is the date (signed), the
    // FRACTION is the time of day as an ABSOLUTE value — -1.25 means
    // 1899-12-29 06:00, not "minus 1.25 days"; plain linear arithmetic
    // reflected every pre-1899-12-30 time-of-day into the previous day
    val whole = if (days < 0) math.ceil(days) else math.floor(days)
    val frac = math.abs(days - whole)
    val millis = math.round((whole - DaysToEpoch) * 86400000.0) +
      math.round(frac * 86400000.0)
    new java.sql.Timestamp(millis)
  }

  /** ACE extended date/time: 42 ASCII bytes — 20-digit days since
    * 0001-01-01, ':', 19-digit 100 ns ticks within the day, ":7". */
  private def extDateToTimestamp(b: Array[Byte], o: Int, len: Int): java.sql.Timestamp = {
    val s = new String(b, o, len, "ISO-8859-1")
    val parts = s.split(':')
    val days = parts(0).toLong
    val ticks = parts(1).takeWhile(_.isDigit).toLong
    val micros = (days - Ce1ToEpochDays) * 86400000000L + ticks / 10
    val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    ts
  }

  private def sparkType(c: Col): DataType = c.typ match {
    case 0x01 => BooleanType
    case 0x02 => ByteType
    case 0x03 => ShortType
    case 0x04 => IntegerType
    case 0x05 => DecimalType(19, 4) // currency: exact scaled value
    case 0x06 => FloatType
    case 0x07 => DoubleType
    case 0x08 | 0x14 => TimestampType
    case 0x09 | 0x0B => BinaryType
    case 0x0A | 0x0C => StringType // text, memo
    case 0x0F => StringType // GUID
    case 0x10 => DecimalType(math.max(c.prec, 1), c.scale)
    case other => throw new IllegalStateException(
      f"unsupported Access column type 0x$other%02x (column ${c.name})")
  }

  private def crackRow(db: Mdb, row: Array[Byte], td: TableDef): Row = {
    val jet3 = db.fmt.jet3
    val ncols = if (jet3) row(0) & 0xFF else u16(row, 0)
    val fixedBase = if (jet3) 1 else 2
    val bm = (ncols + 7) / 8
    val L = row.length
    // a row written before ALTER TABLE ADD COLUMN stores fewer columns
    // than the TDEF declares; absent columns are null (Jet semantics),
    // and indexing the bitmask with the TDEF number would read past it
    def nullBit(n: Int): Boolean =
      n < ncols && ((row(L - bm + n / 8) >> (n % 8)) & 1) != 0
    val varLen =
      if (td.numVar == 0) 0
      else if (jet3) row(L - bm - 1) & 0xFF
      else u16(row, L - bm - 2)
    // Jet 3 var offsets are single bytes; rows over 255 bytes wrap — data
    // is written in order, so a DECREASE between consecutive entries marks
    // a 256 boundary crossing (the jump-table's information, recovered)
    val varOffs: Array[Int] =
      if (td.numVar == 0) Array.empty
      else if (jet3) {
        val numJumps = (L - 1) / 256
        val colPtr = L - bm - 1 - numJumps
        val raws = (0 to varLen).map(i => row(colPtr - 1 - i) & 0xFF)
        val out = new Array[Int](varLen + 1)
        var base = 0
        var prev = if (raws.nonEmpty) raws(0) else 0
        raws.zipWithIndex.foreach { case (o, i) =>
          if (i > 0 && o < prev) base += 256
          out(i) = o + base
          prev = o
        }
        out
      } else (0 to varLen).map(i => u16(row, L - bm - 4 - 2 * i)).toArray
    def varOff(i: Int): Int = varOffs(i)

    val vals = td.cols.map { c =>
      if (c.typ == 0x01) java.lang.Boolean.valueOf(nullBit(c.num))
      else if (!nullBit(c.num)) null
      else if (c.fixed) {
        val o = fixedBase + c.fixedOff
        c.typ match {
          case 0x02 => java.lang.Byte.valueOf(row(o))
          case 0x03 => java.lang.Short.valueOf(i16(row, o))
          case 0x04 => java.lang.Integer.valueOf(i32(row, o))
          case 0x05 => new java.math.BigDecimal(
            java.math.BigInteger.valueOf(i64(row, o)), 4)
          case 0x06 => java.lang.Float.valueOf(f32(row, o))
          case 0x07 => java.lang.Double.valueOf(f64(row, o))
          case 0x08 => daysToTimestamp(f64(row, o))
          case 0x0F => guidString(row, o)
          case 0x10 =>
            // sign byte (non-zero = NEGATIVE, per Jackcess/mdbtools) +
            // 16-byte magnitude stored as four 4-byte groups, each
            // little-endian (Jackcess fixNumericByteOrder reverses each
            // group); declared precision/scale
            val raw = java.util.Arrays.copyOfRange(row, o + 1, o + c.size)
            val be = new Array[Byte](raw.length)
            var g = 0
            while (g + 4 <= raw.length) {
              be(g) = raw(g + 3); be(g + 1) = raw(g + 2)
              be(g + 2) = raw(g + 1); be(g + 3) = raw(g)
              g += 4
            }
            val mag = new java.math.BigInteger(1, be)
            val signed = if (row(o) != 0) mag.negate else mag
            new java.math.BigDecimal(signed, c.scale)
          case 0x14 => extDateToTimestamp(row, o, c.size)
          // FIXED-length TEXT/BINARY are legitimate Jet column kinds
          // (DAO/ADOX-created, common in upsized legacy DBs) — decode
          // the declared fixed span instead of failing the whole read
          case 0x0A =>
            val t = decodeText(
              java.util.Arrays.copyOfRange(row, o, o + c.size), jet3)
            if (t == null) null else t.replaceAll("[ \u0000]+$", "")
          case 0x09 => java.util.Arrays.copyOfRange(row, o, o + c.size)
          case other => throw new IllegalStateException(
            f"unsupported fixed Access type 0x$other%02x")
        }
      } else {
        val i = c.varNum
        if (i >= varLen) null
        else {
          val s = varOff(i)
          val e = varOff(i + 1)
          if (e < s) null
          else c.typ match {
            case 0x0A => decodeText(java.util.Arrays.copyOfRange(row, s, e), jet3)
            case 0x0C =>
              decodeText(readLongValue(db, java.util.Arrays.copyOfRange(row, s, e)), jet3)
            case 0x09 => java.util.Arrays.copyOfRange(row, s, e)
            case 0x0B => readLongValue(db, java.util.Arrays.copyOfRange(row, s, e))
            case 0x08 =>
              // calculated datetime: 16-byte pad, u32 type tag, value
              if (e - s >= 28 && u32(row, s + 16) == 8) daysToTimestamp(f64(row, s + 20))
              else null
            case _ => null
          }
        }
      }
    }
    Row.fromSeq(vals)
  }

  // ---- catalog ---------------------------------------------------------
  private[graft] case class CatalogEntry(name: String, tdefPg: Int,
                                         created: java.sql.Timestamp,
                                         updated: java.sql.Timestamp)

  private[graft] def userTables(db: Mdb): Seq[CatalogEntry] = {
    val td = readTdef(db, 2) // MSysObjects is rooted at page 2 (Jet layout)
    val byName = td.cols.map(_.name).zipWithIndex.toMap
    rawRows(db, 2).flatMap { raw =>
      val r = crackRow(db, raw, td)
      def v(n: String): Any = r.get(byName(n))
      val typ = v("Type").asInstanceOf[Short]
      val flags = Option(v("Flags")).map(_.asInstanceOf[Int]).getOrElse(0)
      val name = v("Name").asInstanceOf[String]
      // user tables: type 1, no system/hidden flag bits
      if (typ == 1 && flags == 0 && !name.startsWith("MSys") && !name.startsWith("~"))
        Some(CatalogEntry(name, (v("Id").asInstanceOf[Int]) & 0xFFFFFF,
          v("DateCreate").asInstanceOf[java.sql.Timestamp],
          v("DateUpdate").asInstanceOf[java.sql.Timestamp]))
      else None
    }.toSeq
  }

  // ---- public API ------------------------------------------------------
  val catalogSchema: StructType = StructType(Seq(
    StructField("table", StringType, nullable = false),
    StructField("created_date", TimestampType),
    StructField("updated_date", TimestampType),
    StructField("row_count", IntegerType),
    StructField("col_count", IntegerType),
    StructField("columns", ArrayType(StringType))))

  private val Exts = Set(".mdb", ".accdb")

  private def load(conf: Configuration, file: String): Mdb = {
    val fp = new Path(file)
    val fs = fp.getFileSystem(conf)
    val len = fs.getFileStatus(fp).getLen
    require(len < (1L << 31), s"Access file too large to buffer: $len bytes")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(fp)
    try in.readFully(0, buf) finally in.close()
    new Mdb(buf)
  }

  /** Catalog browse: one row per user table (the reference's metadata
    * query: table/created_date/updated_date/row_count/col_count/columns). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(catalogSchema)
    // session Hadoop conf rides to executors (the XlsxReader fix)
    val sconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    FileList.asDataset(spark, path, Exts)
      .mapPartitions { files =>
        val conf = sconf.value
        files.flatMap { f =>
          val db = load(conf, f)
          userTables(db).map { e =>
            val td = readTdef(db, e.tdefPg)
            Row(e.name, e.created, e.updated, td.numRows.toInt,
              td.cols.length, td.cols.map(_.name))
          }
        }
      }(enc).toDF(catalogSchema.fieldNames.toSeq: _*)
  }

  /** Project one table as rows (the reference's `tableName` mode). */
  def readTable(spark: SparkSession, path: String, table: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = FileList.resolve(spark, path, Exts)
    val schema = {
      val db = load(conf, files.head)
      val e = userTables(db).find(_.name == table).getOrElse(
        throw new IllegalArgumentException(s"table $table not found in ${files.head} " +
          s"(have: ${userTables(db).map(_.name).mkString(", ")})"))
      StructType(readTdef(db, e.tdefPg).cols.map(c =>
        StructField(c.name, sparkType(c), nullable = true)))
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val sconf = new SerializableHadoopConf(conf)
    FileList.asDataset(spark, files) // reuse the schema pass's listing
      .mapPartitions { files =>
        val conf2 = sconf.value
        files.flatMap { f =>
          val db = load(conf2, f)
          userTables(db).find(_.name == table).iterator.flatMap { e =>
            val td = readTdef(db, e.tdefPg)
            val fileSchema = StructType(td.cols.map(c =>
              StructField(c.name, sparkType(c), nullable = true)))
            SchemaAlign.align(
              rawRows(db, e.tdefPg).map(raw => crackRow(db, raw, td)),
              SchemaAlign.plan(schema, fileSchema))
          }
        }
      }(enc).toDF(schema.fieldNames.toSeq: _*)
  }
}
