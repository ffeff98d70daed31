package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._

/** Hand-rolled codec for the Flink/Paimon **BinaryRow** binary layout —
  * the encoding Paimon manifests use for the `_PARTITION` tuple (and
  * `_MIN_KEY`/`_MAX_KEY`). No flink/paimon jar, same posture as the rest
  * of the Paimon reader/writer.
  *
  * Layout (public source: Flink `BinaryRowData`/`BinaryRowWriter`,
  * forked verbatim as `org.apache.paimon.data.BinaryRow`; reference
  * surface contrib/format-paimon/.../PaimonGroupScan.java reads the same
  * tuples through the paimon library):
  *
  *   - fixed-length part
  *       - null-bits region: `((arity + 63 + 8) / 64) * 8` bytes. The
  *         first BYTE is the header (row kind; 0 = INSERT — partition
  *         tuples are always inserts). Field i's null bit is bit
  *         `(i + 8)` of the region (byte `(i+8)/8`, bit `(i+8)%8`).
  *       - one 8-byte slot per field at `nullBits + 8*i`.
  *   - variable-length part appended after the slots, 8-byte-aligned
  *     chunks (zero padding).
  *
  * Slot encodings (`BinaryWriter#write`): fixed-width primitives write
  * at the slot start in the platform's native byte order — LITTLE
  * ENDIAN everywhere Paimon actually runs; Flink's MemorySegment uses
  * `sun.misc.Unsafe` without an order swap, so the on-disk bytes are
  * only portable between same-endian hosts and we pin LE explicitly.
  * Var-length values (strings/bytes) of length <= 7 pack COMPACT into
  * the slot: `((len | 0x80) << 56) | data` with data byte i at bits
  * `8*i` (so the mark byte lands at slot byte 7 under LE). Longer
  * values append to the var part (rounded up to 8 bytes) and the slot
  * holds `(offsetFromRowStart << 32) | len`.
  *
  * Supported partition-field types: BOOLEAN, TINYINT..BIGINT, FLOAT,
  * DOUBLE, DATE (int days), STRING, BYTES, DECIMAL(p<=18) (compact
  * unscaled long), TIMESTAMP(p<=3) (compact epoch millis). Non-compact
  * decimals/timestamps refuse loudly — they take a var-len path with
  * fixed 16-byte/12-byte packing that partition tuples never use in
  * practice.
  */
object BinaryRow {

  private val HeaderBits = 8

  def nullBitsSizeInBytes(arity: Int): Int = ((arity + 63 + HeaderBits) / 64) * 8

  private def slotOffset(arity: Int, i: Int): Int = nullBitsSizeInBytes(arity) + 8 * i

  private def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | StringType | BinaryType => true
    case d: DecimalType => d.precision <= 18
    case TimestampType => true // written/read as compact epoch millis
    case _ => false
  }

  private def requireSupported(types: Seq[DataType]): Unit =
    types.foreach(dt => require(supported(dt),
      s"BinaryRow codec: unsupported partition field type $dt " +
        "(non-compact decimals/timestamps and nested types refuse)"))

  /** Encode one row. `values` are Spark EXTERNAL values: java.lang types,
    * String, Array[Byte], java.sql.Date / java.time.LocalDate,
    * java.sql.Timestamp / java.time.Instant, java.math.BigDecimal /
    * Spark Decimal. Null values set the null bit. */
  def encode(values: Seq[Any], types: Seq[DataType]): Array[Byte] = {
    require(values.length == types.length,
      s"arity mismatch: ${values.length} values, ${types.length} types")
    requireSupported(types)
    val arity = types.length
    val fixedLen = nullBitsSizeInBytes(arity) + 8 * arity
    val varChunks = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val fixed = ByteBuffer.allocate(fixedLen).order(ByteOrder.LITTLE_ENDIAN)
    var varCursor = fixedLen // var-part offsets count from ROW START

    def setNullBit(i: Int): Unit = {
      val bit = i + HeaderBits
      val b = fixed.get(bit / 8)
      fixed.put(bit / 8, (b | (1 << (bit % 8))).toByte)
    }

    def putVarLen(i: Int, bytes: Array[Byte]): Unit =
      if (bytes.length <= 7) {
        var seven = 0L
        var k = 0
        while (k < bytes.length) {
          seven |= (bytes(k) & 0xFFL) << (8L * k); k += 1
        }
        val mark = (bytes.length | 0x80).toLong
        fixed.putLong(slotOffset(arity, i), (mark << 56) | seven)
      } else {
        val rounded = ((bytes.length + 7) / 8) * 8
        val chunk = java.util.Arrays.copyOf(bytes, rounded) // zero padding
        fixed.putLong(slotOffset(arity, i),
          (varCursor.toLong << 32) | bytes.length.toLong)
        varChunks += chunk
        varCursor += rounded
      }

    types.indices.foreach { i =>
      val off = slotOffset(arity, i)
      values(i) match {
        case null => setNullBit(i)
        case v => types(i) match {
          case BooleanType => fixed.put(off, if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
          case ByteType => fixed.put(off, v.asInstanceOf[Byte])
          case ShortType => fixed.putShort(off, v.asInstanceOf[Short])
          case IntegerType => fixed.putInt(off, v.asInstanceOf[Int])
          case LongType => fixed.putLong(off, v.asInstanceOf[Long])
          case FloatType => fixed.putFloat(off, v.asInstanceOf[Float])
          case DoubleType => fixed.putDouble(off, v.asInstanceOf[Double])
          case DateType =>
            val days = v match {
              case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
              case d: java.time.LocalDate => d.toEpochDay.toInt
              case n: java.lang.Integer => n.intValue
            }
            fixed.putInt(off, days)
          case TimestampType =>
            val millis = v match {
              case t: java.sql.Timestamp => t.getTime
              case t: java.time.Instant => t.toEpochMilli
              case n: java.lang.Long => n.longValue
            }
            fixed.putLong(off, millis)
          case d: DecimalType =>
            val unscaled = v match {
              case b: java.math.BigDecimal => b.setScale(d.scale).unscaledValue.longValueExact
              case b: BigDecimal => b.underlying.setScale(d.scale).unscaledValue.longValueExact
              case dec: org.apache.spark.sql.types.Decimal => dec.toJavaBigDecimal.setScale(d.scale).unscaledValue.longValueExact
            }
            fixed.putLong(off, unscaled)
          case StringType => putVarLen(i, v.toString.getBytes(StandardCharsets.UTF_8))
          case BinaryType => putVarLen(i, v.asInstanceOf[Array[Byte]])
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
      }
    }
    val out = ByteBuffer.allocate(varCursor)
    out.put(fixed.array())
    varChunks.foreach(out.put)
    out.array()
  }

  /** Decode one row back to Spark external values (String, boxed
    * primitives, java.time.LocalDate for DATE, java.time.Instant for
    * TIMESTAMP, java.math.BigDecimal, Array[Byte]). */
  def decode(bytes: Array[Byte], types: Seq[DataType]): Seq[Any] = {
    requireSupported(types)
    val arity = types.length
    require(bytes.length >= nullBitsSizeInBytes(arity) + 8 * arity,
      s"BinaryRow too short for arity $arity: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def isNull(i: Int): Boolean = {
      val bit = i + HeaderBits
      (buf.get(bit / 8) & (1 << (bit % 8))) != 0
    }
    def varLen(i: Int): Array[Byte] = {
      val slot = buf.getLong(slotOffset(arity, i))
      if ((slot & (0x80L << 56)) != 0) {
        val len = ((slot >>> 56) & 0x7F).toInt
        val out = new Array[Byte](len)
        var k = 0
        while (k < len) { out(k) = ((slot >>> (8 * k)) & 0xFF).toByte; k += 1 }
        out
      } else {
        val off = (slot >>> 32).toInt
        val len = (slot & 0xFFFFFFFFL).toInt
        java.util.Arrays.copyOfRange(bytes, off, off + len)
      }
    }
    types.indices.map { i =>
      if (isNull(i)) null
      else {
        val off = slotOffset(arity, i)
        types(i) match {
          case BooleanType => java.lang.Boolean.valueOf(buf.get(off) != 0)
          case ByteType => java.lang.Byte.valueOf(buf.get(off))
          case ShortType => java.lang.Short.valueOf(buf.getShort(off))
          case IntegerType => java.lang.Integer.valueOf(buf.getInt(off))
          case LongType => java.lang.Long.valueOf(buf.getLong(off))
          case FloatType => java.lang.Float.valueOf(buf.getFloat(off))
          case DoubleType => java.lang.Double.valueOf(buf.getDouble(off))
          case DateType => java.time.LocalDate.ofEpochDay(buf.getInt(off).toLong)
          case TimestampType => java.time.Instant.ofEpochMilli(buf.getLong(off))
          case d: DecimalType =>
            java.math.BigDecimal.valueOf(buf.getLong(off), d.scale)
          case StringType => new String(varLen(i), StandardCharsets.UTF_8)
          case BinaryType => varLen(i)
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
      }
    }
  }

  /** Hive-style partition path for one tuple: `k1=v1/k2=v2` with
    * Paimon's default null sentinel; dates render ISO (what Paimon's
    * own partition path generator and Spark's partitionBy both emit).
    * Values are URL-escaped for path safety the same way Spark/Hive
    * escape partition values. */
  def partitionPath(names: Seq[String], values: Seq[Any]): String =
    names.zip(values).map { case (k, v) =>
      val s = v match {
        case null => null
        case d: java.time.LocalDate => d.toString
        case d: java.sql.Date => d.toLocalDate.toString
        case other => other.toString
      }
      // Paimon's partition.default-name default covers null AND empty
      // (an empty dir segment would be unrepresentable on a filesystem)
      val rendered =
        if (s == null || s.isEmpty) "__DEFAULT_PARTITION__"
        else escapePathName(s)
      s"$k=$rendered"
    }.mkString("/")

  /** Hive ESCAPE set for partition values (FileUtils.escapePathName --
    * the rule Spark and Paimon both apply): ASCII control chars and the
    * path/glob-special characters percent-encode as %XX. */
  private def escapePathName(s: String): String = {
    // exactly Hive FileUtils' charToEscape set (which Spark's
    // ExternalCatalogUtils copies and Paimon rides): note it escapes
    // '{' but NOT '}' — adding '}' diverges the dir name from what a
    // native reader reconstructs out of the manifest partition tuple
    val special = "\"#%'*/:=?\\{[]^"
    val sb = new StringBuilder
    s.foreach { c =>
      if (c < ' ' || c == 0x7F.toChar || special.indexOf(c.toInt) >= 0)
        sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }
}
