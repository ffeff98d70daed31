package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Phoenix-on-HBase reader — the zero-egress re-expression of the
  * reference's Phoenix storage plugin (contrib/storage-phoenix/...
  * /PhoenixBatchReader.java:60 reads typed rows through the Phoenix
  * thin-client JDBC driver; graft decodes the PUBLIC on-disk layout
  * Phoenix writes into HBase — the Apache Phoenix "Data Types" spec
  * plus the schema constants of the public phoenix source — directly
  * from store files through [[HBaseHFileReader]], the same layered
  * pattern as [[OpenTsdbReader]]).
  *
  * Layout surface (anchored to the published encoding):
  *  - ROW KEY = optional salt byte + the PK columns concatenated in
  *    declaration order. Fixed-width integral types serialize
  *    big-endian with the SIGN BIT FLIPPED (the documented sortable
  *    form: `-1 -> 0x7FFFFFFF`, `1 -> 0x80000001`); UNSIGNED_* types
  *    are plain big-endian (docs: "matches HBase Bytes.toBytes");
  *    BOOLEAN is one byte 0/1; DATE/TIME are the epoch-millis long
  *    through the same flipped-long codec; VARCHAR is UTF-8 with a
  *    `0x00` separator after every variable-width PK column that is
  *    not the row's last (a NULL middle PK column is zero bytes — two
  *    adjacent separators). DESC columns invert every byte
  *    (`b ^ 0xFF`) and use `0xFF` as the varchar separator.
  *  - NON-PK columns live in one column family (default `"0"`) as one
  *    cell each, value = the same type codec (varchar without
  *    terminator); NULL = absent cell. Qualifiers: the column NAME
  *    bytes under the non-encoded scheme (`COLUMN_ENCODED_BYTES=0`,
  *    every pre-4.10 and migrated table), or the TWO_BYTE encoded
  *    scheme — a big-endian counter assigned in declaration order
  *    starting at 11 (ENCODED_CQ_COUNTER_INITIAL_VALUE). Every row
  *    carries an EMPTY-COLUMN marker cell (qualifier `"_0"`
  *    non-encoded / encoded 0) that makes pk-only rows durable; the
  *    reader treats it as row-liveness and never emits it as data.
  *  - SALTED tables prepend one bucket byte. The byte is a
  *    library-defined hash (SaltingUtil) — the reader SKIPS and
  *    range-checks it without re-deriving the hash.
  *
  * REFUSALS (loud, never silent): FLOAT/DOUBLE/DECIMAL — phoenix's
  * float codecs apply a sign-fold-plus-one transform and DECIMAL a
  * custom digit varint whose exact edge behavior (NaN wraparound,
  * negative-exponent framing) cannot be verified zero-egress; a wrong
  * guess here would decode silently-wrong numbers, so these types
  * refuse with the workaround named (store cents/micros as BIGINT).
  * Qualifier schemes other than 0/TWO_BYTE, and the
  * SINGLE_CELL_ARRAY_WITH_OFFSETS immutable storage scheme, refuse
  * the same way.
  *
  * Scale posture: store-file decode is one task per HFile (inherited
  * from readCells); HBase version/tombstone resolution is the shared
  * [[HBaseHFileReader.resolveLatest]] (all four marker kinds,
  * per-version); the only extra shuffle is the per-row cell collapse,
  * keyed by row_key (Phoenix rows are single-digit cells wide, so no
  * skew surface). The schema is driver-side metadata, broadcast
  * implicitly through the closure.
  */
object PhoenixReader {

  /** One declared column. `dataType`: INTEGER | BIGINT | SMALLINT |
    * TINYINT | UNSIGNED_INT | UNSIGNED_LONG | VARCHAR | BOOLEAN |
    * DATE. `desc` only affects PK columns (phoenix stores non-PK
    * values in ASC form regardless). */
  case class PhoenixColumn(name: String, dataType: String,
      pk: Boolean = false, desc: Boolean = false)

  private val FixedWidth: Map[String, Int] = Map(
    "INTEGER" -> 4, "UNSIGNED_INT" -> 4, "BIGINT" -> 8,
    "UNSIGNED_LONG" -> 8, "SMALLINT" -> 2, "TINYINT" -> 1,
    "BOOLEAN" -> 1, "DATE" -> 8)

  // DECIMAL stays refused after a round-13 review against what is
  // derivable in this sandbox: the codec's base-100 mantissa shape is
  // describable from secondary sources, but three byte-cases could not
  // be pinned without the PDecimal source or a live Phoenix to emit
  // golden bytes — (1) the negative-mantissa TERMINATOR byte and
  // whether it is omitted at max mantissa length, (2) the header fold
  // for NEGATIVE exponents (|value| < 1, where the exponent bias
  // inverts with the sign), (3) the zero / null-sentinel header
  // distinction. A guess wrong on any of the three decodes
  // silently-wrong numbers on exactly the values (small negatives,
  // sub-unit magnitudes) a financial column hits — refusal is the
  // honest posture, with the workaround named.
  private val Refused: Map[String, String] = Map(
    "DOUBLE" -> "sign-fold-plus-one float codec unverifiable zero-egress",
    "FLOAT" -> "sign-fold-plus-one float codec unverifiable zero-egress",
    "DECIMAL" -> ("base-100 digit codec unverifiable zero-egress (the " +
      "negative-mantissa terminator, negative-exponent header fold, " +
      "and zero-sentinel byte cases need PDecimal golden bytes)"),
    "UNSIGNED_DOUBLE" -> "float codec unverifiable zero-egress",
    "UNSIGNED_FLOAT" -> "float codec unverifiable zero-egress")

  private def checkType(t: String): Unit = {
    Refused.get(t).foreach(why => throw new IllegalArgumentException(
      s"phoenix type $t refuses: $why — store cents/micros as BIGINT"))
    require(FixedWidth.contains(t) || t == "VARCHAR",
      s"unsupported phoenix type $t (supported: " +
        s"${(FixedWidth.keys.toSeq :+ "VARCHAR").sorted.mkString(", ")})")
  }

  private def sparkType(t: String): DataType = t match {
    case "INTEGER" | "UNSIGNED_INT" => IntegerType
    case "BIGINT" | "UNSIGNED_LONG" => LongType
    case "SMALLINT" => ShortType
    case "TINYINT" => ByteType
    case "BOOLEAN" => BooleanType
    case "DATE" => DateType
    case "VARCHAR" => StringType
  }

  // ------------------------------------------------------------ codecs

  /** Value bytes for one non-null value (ASC form, no terminator). */
  def encodeValue(t: String, v: Any): Array[Byte] = {
    checkType(t)
    def beFlipped(x: Long, n: Int): Array[Byte] = {
      val b = (0 until n).reverse.map(i => ((x >> (8 * i)) & 0xFF).toByte)
        .toArray
      b(0) = (b(0) ^ 0x80).toByte // flip the sign bit: the sortable form
      b
    }
    def bePlain(x: Long, n: Int): Array[Byte] = {
      require(x >= 0, s"UNSIGNED phoenix value $x is negative")
      (0 until n).reverse.map(i => ((x >> (8 * i)) & 0xFF).toByte).toArray
    }
    t match {
      case "INTEGER" => beFlipped(v.asInstanceOf[Int].toLong, 4)
      case "BIGINT" => beFlipped(v.asInstanceOf[Long], 8)
      case "SMALLINT" => beFlipped(v.asInstanceOf[Short].toLong, 2)
      case "TINYINT" => beFlipped(v.asInstanceOf[Byte].toLong, 1)
      case "UNSIGNED_INT" => bePlain(v.asInstanceOf[Int].toLong, 4)
      case "UNSIGNED_LONG" => bePlain(v.asInstanceOf[Long], 8)
      case "BOOLEAN" =>
        Array(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case "DATE" => beFlipped(v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay * 86400000L
        case d: java.time.LocalDate => d.toEpochDay * 86400000L
        case ms: Long => ms
      }, 8)
      case "VARCHAR" =>
        val s = v.asInstanceOf[String]
        require(s.indexOf(0.toChar) < 0,
          "phoenix VARCHAR cannot contain NUL (the rowkey separator)")
        s.getBytes("UTF-8")
    }
  }

  private def decodeValue(t: String, b: Array[Byte], from: Int,
                          until: Int): Any = {
    def beLong(flip: Boolean): Long = {
      var x = 0L
      var i = from
      while (i < until) {
        val raw = b(i) & 0xFF
        x = (x << 8) | (if (flip && i == from) raw ^ 0x80 else raw)
        i += 1
      }
      // sign-extend from the encoded width
      val shift = 64 - 8 * (until - from)
      if (shift > 0 && flip) (x << shift) >> shift
      else x
    }
    t match {
      case "INTEGER" => beLong(flip = true).toInt
      case "BIGINT" => beLong(flip = true)
      case "SMALLINT" => beLong(flip = true).toShort
      case "TINYINT" => beLong(flip = true).toByte
      case "UNSIGNED_INT" => beLong(flip = false).toInt
      case "UNSIGNED_LONG" => beLong(flip = false)
      case "BOOLEAN" => b(from) match {
        case 0 => false
        case 1 => true
        case x => throw new java.io.IOException(
          s"phoenix BOOLEAN byte $x is neither 0 nor 1")
      }
      case "DATE" =>
        val ms = beLong(flip = true)
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          Math.floorDiv(ms, 86400000L)))
      case "VARCHAR" => new String(b, from, until - from, "UTF-8")
    }
  }

  private def invert(b: Array[Byte]): Array[Byte] =
    b.map(x => (x ^ 0xFF).toByte)

  /** The full encoded row key for one row's PK values (null allowed
    * only for trailing/middle VARCHAR columns). */
  def rowKey(pkCols: Seq[PhoenixColumn], values: Seq[Any]): Array[Byte] = {
    require(pkCols.nonEmpty, "phoenix table needs at least one PK column")
    require(pkCols.length == values.length,
      s"${pkCols.length} PK columns, ${values.length} values")
    val out = new java.io.ByteArrayOutputStream()
    pkCols.zip(values).zipWithIndex.foreach { case ((c, v), i) =>
      checkType(c.dataType)
      val isLast = i == pkCols.length - 1
      val varWidth = c.dataType == "VARCHAR"
      if (v == null) {
        require(varWidth,
          s"PK column ${c.name} (${c.dataType}) is fixed-width and NOT NULL")
        // null varchar = zero bytes: trailing nulls end the key early,
        // middle nulls leave two adjacent separators
      } else {
        val enc0 = encodeValue(c.dataType, v)
        out.write(if (c.desc) invert(enc0) else enc0)
      }
      if (varWidth && !isLast)
        out.write(if (c.desc) 0xFF else 0x00)
    }
    val rk = out.toByteArray
    require(rk.nonEmpty, "empty phoenix row key")
    rk
  }

  /** Parse a row key back into PK values (inverse of [[rowKey]]). */
  private def parseRowKey(pkCols: Seq[PhoenixColumn], rk: Array[Byte],
                          salted: Boolean, file: String): Seq[Any] = {
    var o = if (salted) 1 else 0
    pkCols.zipWithIndex.map { case (c, i) =>
      val isLast = i == pkCols.length - 1
      if (c.dataType == "VARCHAR") {
        val sep: Byte = if (c.desc) 0xFF.toByte else 0x00.toByte
        val end =
          if (isLast) rk.length
          else {
            val idx = rk.indexOf(sep, o)
            if (idx < 0) throw new java.io.IOException(
              s"$file: row key missing separator for PK ${c.name}")
            idx
          }
        val raw = java.util.Arrays.copyOfRange(rk, o, end)
        o = if (isLast) end else end + 1
        if (raw.isEmpty) null
        else decodeValue("VARCHAR",
          if (c.desc) invert(raw) else raw, 0, raw.length)
      } else {
        val w = FixedWidth(c.dataType)
        if (o + w > rk.length) throw new java.io.IOException(
          s"$file: row key exhausted at PK ${c.name} (need $w bytes, " +
            s"have ${rk.length - o})")
        val raw = java.util.Arrays.copyOfRange(rk, o, o + w)
        o += w
        decodeValue(c.dataType, if (c.desc) invert(raw) else raw, 0, w)
      }
    } ++ {
      if (o != rk.length) throw new java.io.IOException(
        s"$file: ${rk.length - o} unparsed row-key bytes — schema/" +
          "table mismatch (or a salted table read with saltBuckets=0)")
      Nil
    }
  }

  /** Qualifier bytes for the i-th (declaration order) non-PK column. */
  def qualifierFor(name: String, idx: Int, encoded: Boolean): Array[Byte] =
    if (!encoded) name.getBytes("UTF-8")
    else { // TWO_BYTE scheme: BE counter from 11
      val q = 11 + idx
      require(q <= 0xFFFF, s"TWO_BYTE qualifier overflow at column $idx")
      Array(((q >> 8) & 0xFF).toByte, (q & 0xFF).toByte)
    }

  /** The empty-column (row liveness) marker qualifier. */
  def emptyQualifier(encoded: Boolean): Array[Byte] =
    if (encoded) Array(0.toByte, 0.toByte) else "_0".getBytes("UTF-8")

  // -------------------------------------------------------------- read

  /** Decode a Phoenix table's store-file directory against a declared
    * schema. `encodedQualifiers=true` = the TWO_BYTE scheme (the
    * post-4.10 default); false = qualifier-per-column-name.
    * EAGER like [[HBaseHFileReader.read]]: persists and materializes;
    * callers may unpersist the returned frame. */
  def read(spark: SparkSession, path: String, schema: Seq[PhoenixColumn],
           family: String = "0", encodedQualifiers: Boolean = false,
           saltBuckets: Int = 0): DataFrame = {
    schema.foreach(c => checkType(c.dataType))
    require(schema.nonEmpty && schema.exists(_.pk), "schema needs PK columns")
    require(schema.map(_.name).distinct.length == schema.length,
      "duplicate column names")
    schema.filter(c => !c.pk && c.desc).foreach(c =>
      throw new IllegalArgumentException(
        s"${c.name}: desc applies only to PK columns"))
    val pkCols = schema.filter(_.pk)
    val dataCols = schema.filterNot(_.pk)
    val salted = saltBuckets > 0
    val emptyQ = emptyQualifier(encodedQualifiers)
    val qualToCol: Seq[(Array[Byte], PhoenixColumn)] =
      dataCols.zipWithIndex.map { case (c, i) =>
        qualifierFor(c.name, i, encodedQualifiers) -> c
      }
    // a declared column whose qualifier collides with the liveness
    // marker would silently decode all-NULL (the marker-skip swallows
    // its cells) — refuse loudly instead, like Cassandra's
    // reserved-name guard
    qualToCol.foreach { case (q, c) =>
      require(!java.util.Arrays.equals(q, emptyQ),
        s"phoenix column ${c.name} collides with the empty-column " +
          s"liveness marker qualifier (${if (encodedQualifiers) "encoded 0"
            else "'_0'"}) — reserved by phoenix")
    }

    import org.apache.spark.sql.functions._
    val cells = HBaseHFileReader.readCells(spark, path)
      .filter(col("family") === family)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // HBase read semantics first — the shared resolveLatest (all four
    // marker kinds per-version, newest survivor by (ts, seq_id)), the
    // same implementation HBaseHFileReader.read and OpenTsdbReader use.
    val live = HBaseHFileReader.resolveLatest(cells)
      .select("row_key", "qualifier_bytes", "value")

    val outSchema = StructType(schema.map(c =>
      StructField(c.name, sparkType(c.dataType), nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    import spark.implicits._
    val result = live
      .as[(Array[Byte], Array[Byte], Array[Byte])]
      // row keys are arbitrary bytes; ISO-8859-1 round-trips them
      // exactly, giving a hashable group key
      .groupByKey(t => new String(t._1, "ISO-8859-1"))
      .mapGroups { (rkStr, rowCells) =>
        val rk = rkStr.getBytes("ISO-8859-1")
        if (salted && (rk.isEmpty || (rk(0) & 0xFF) >= saltBuckets))
          throw new java.io.IOException(
            s"salt byte ${if (rk.isEmpty) "missing" else rk(0) & 0xFF} " +
              s"outside [0, $saltBuckets) — wrong saltBuckets declared?")
        val pkVals = parseRowKey(pkCols, rk, salted, path)
        val byCol = scala.collection.mutable.HashMap[String, Any]()
        rowCells.foreach { case (_, q, v) =>
          if (!java.util.Arrays.equals(q, emptyQ)) {
            qualToCol.find(p => java.util.Arrays.equals(p._1, q))
              .foreach { case (_, c) =>
                // empty value bytes are NULL for every phoenix type
                // (phoenix treats VARCHAR '' as NULL too — empty
                // strings are not storable)
                if (v.nonEmpty) byCol(c.name) =
                  decodeValue(c.dataType, v, 0, v.length)
              }
            // unknown qualifiers (columns dropped from the declared
            // schema, or another view's columns) are skipped — the
            // reference's projection behaves the same way
          }
        }
        val vals: Seq[Any] = schema.map { c =>
          if (c.pk) pkVals(pkCols.indexWhere(_.name == c.name))
          else byCol.getOrElse(c.name, null)
        }
        Row.fromSeq(vals)
      }(enc)
      .toDF(outSchema.fieldNames: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize while the cell cache is live; refusal paths (salt
    // range, rowkey mismatch) throw out of count — release BOTH caches
    try result.count()
    catch { case t: Throwable => result.unpersist(); throw t }
    finally cells.unpersist()
    result
  }

  // ---------------------------------------------------- fixture tooling

  /** Encode fixture cells for [[HBaseHFileReader.writeHFile]]. `rows`:
    * per row the full value seq in schema order (null = absent cell),
    * with its HBase timestamp and seq id. Emits the empty-column
    * marker per row and returns cells in HBase sort order. When
    * `saltBuckets > 0` a stand-in salt (additive byte-sum hash mod
    * buckets — NOT SaltingUtil's, which the reader never re-derives)
    * prefixes each key. */
  def fixtureCells(schema: Seq[PhoenixColumn], rows: Seq[(Seq[Any], Long, Long)],
                   family: String = "0", encodedQualifiers: Boolean = false,
                   saltBuckets: Int = 0): Seq[HBaseHFileReader.Cell] = {
    val pkCols = schema.filter(_.pk)
    val dataCols = schema.filterNot(_.pk)
    val pkIdx = schema.zipWithIndex.filter(_._1.pk).map(_._2)
    val cells = rows.flatMap { case (vals, ts, seqId) =>
      require(vals.length == schema.length,
        s"row has ${vals.length} values for ${schema.length} columns")
      val rk0 = rowKey(pkCols, pkIdx.map(vals))
      val rk = if (saltBuckets > 0)
        ((rk0.map(_ & 0xFF).sum % saltBuckets).toByte) +: rk0 else rk0
      val dataCells = dataCols.zipWithIndex.flatMap { case (c, i) =>
        val v = vals(schema.indexWhere(_.name == c.name))
        if (v == null) Nil
        else {
          val q = qualifierFor(c.name, i, encodedQualifiers)
          Seq(HBaseHFileReader.Cell(rk, family,
            new String(q, "ISO-8859-1"), ts, 4,
            encodeValue(c.dataType, v), seqId, qualRaw = q))
        }
      }
      val eq = emptyQualifier(encodedQualifiers)
      dataCells :+ HBaseHFileReader.Cell(rk, family,
        new String(eq, "ISO-8859-1"), ts, 4,
        "x".getBytes("UTF-8"), seqId, qualRaw = eq)
    }
    sortCells(cells)
  }

  /** HBase sort order (row bytes unsigned-lex, family, qualifier). */
  def sortCells(cells: Seq[HBaseHFileReader.Cell])
      : Seq[HBaseHFileReader.Cell] =
    cells.sorted(new Ordering[HBaseHFileReader.Cell] {
      def compare(x: HBaseHFileReader.Cell,
                  y: HBaseHFileReader.Cell): Int = {
        val r = java.util.Arrays.compareUnsigned(x.row, y.row)
        if (r != 0) r
        else if (x.family != y.family) x.family.compare(y.family)
        else java.util.Arrays.compareUnsigned(
          x.qualifierBytes, y.qualifierBytes)
      }
    })
}
