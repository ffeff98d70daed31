package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Drill's typed binary convert_from / convert_to codec family
  * (reference exec/.../expr/fn/impl/conv/: BigIntBEConvertFrom.java,
  * IntConvertFrom.java, BigIntVLongConvertFrom.java,
  * DateEpochBEConvertFrom.java, BooleanByteConvertFrom.java and
  * siblings; varint framing per exec/util/ByteBufUtil.java's
  * HadoopWritables — org.apache.hadoop.io.WritableUtils'
  * zero-compressed encoding). These crack byte-array keys/values the
  * way HBase/SequenceFile store them: fixed-width integers both
  * endiannesses, IEEE floats both endiannesses, Hadoop vint/vlong,
  * epoch date/time/timestamp, single-byte boolean, UTF-8/UTF-16 text.
  *
  * Drill's plain spellings are LITTLE-endian (DrillBuf is an LE netty
  * buffer: IntConvertFrom reads readInt() directly, IntBEConvertFrom
  * applies Integer.reverseBytes), `_BE` spellings big-endian. Length
  * checks are EXACT, matching ByteBufUtil.checkBufferLength — a 5-byte
  * buffer is an error for INT, never a silent prefix read. NULL in →
  * NULL out (the reference's NULL_IF_NULL posture). Unsigned reads
  * (UINT4) widen to LONG so values above 2^31 stay positive; UINT8
  * surfaces the raw 64 bits (Spark has no unsigned long, same as
  * Drill's UInt8Holder).
  *
  * Pure byte-array transforms — everything stays inside whole-stage
  * codegen via static calls; no UDF, no boxing of the hot path.
  */
object ConvertBinary {

  /** Spark-facing output type of convert_from(_, enc). */
  val FromTypes: Map[String, DataType] = Map(
    "BIGINT" -> LongType, "BIGINT_BE" -> LongType,
    "BIGINT_HADOOPV" -> LongType,
    "UINT8" -> LongType, "UINT4" -> LongType, "UINT4_BE" -> LongType,
    "INT" -> IntegerType, "INT_BE" -> IntegerType,
    "INT_HADOOPV" -> IntegerType,
    "SMALLINT" -> ShortType, "SMALLINT_BE" -> ShortType,
    "TINYINT" -> ByteType,
    "FLOAT" -> FloatType, "FLOAT_BE" -> FloatType,
    "DOUBLE" -> DoubleType, "DOUBLE_BE" -> DoubleType,
    "BOOLEAN_BYTE" -> BooleanType,
    "DATE_EPOCH" -> DateType, "DATE_EPOCH_BE" -> DateType,
    "TIME_EPOCH" -> IntegerType, "TIME_EPOCH_BE" -> IntegerType,
    "TIMESTAMP_EPOCH" -> TimestampType, "TIMESTAMP_EPOCH_BE" -> TimestampType,
    "UTF8" -> StringType, "UTF16" -> StringType)

  /** Expected Spark input type of convert_to(_, enc) — the codec family
    * is symmetric by construction (every decodable encoding encodes),
    * so the map IS FromTypes: one list, no silent drift. */
  val ToTypes: Map[String, DataType] = FromTypes

  private val DayMillis = 24L * 3600 * 1000

  private def checkLen(b: Array[Byte], n: Int, enc: String): Unit =
    if (b.length != n)
      throw new IllegalArgumentException(
        s"convert $enc: wrong buffer length ${b.length}, expected $n")

  private def buf(b: Array[Byte], be: Boolean): ByteBuffer =
    ByteBuffer.wrap(b).order(
      if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)

  // ---- Hadoop WritableUtils zero-compressed vlong (ByteBufUtil.java) ----

  /** -112..127 inline; else first byte -113..-120 = positive with
    * -(v+112) big-endian bytes following, -121..-128 = negative
    * (one's-complemented) with -(v+120) bytes following. */
  def readVLong(b: Array[Byte]): Long = {
    if (b.length < 1)
      throw new IllegalArgumentException("convert HADOOPV: empty buffer")
    val first = b(0)
    val len =
      if (first >= -112) 1
      else if (first >= -120) -111 - first
      else -119 - first
    if (len == 1) {
      if (b.length != 1)
        throw new IllegalArgumentException(
          s"convert HADOOPV: 1-byte value with ${b.length - 1} trailing bytes")
      return first.toLong
    }
    // EXACT length, like the fixed-width codecs: the reference's
    // readVLong(buffer, start, end) happens to ignore a trailing tail,
    // but a corrupted/concatenated key decoding to a plausible value is
    // the silent-wrong class this file otherwise refuses
    if (b.length != len)
      throw new IllegalArgumentException(
        s"convert HADOOPV: expected $len bytes, buffer has ${b.length}")
    var v = 0L
    var i = 1
    while (i < len) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
    if (first < -120) v ^ -1L else v
  }

  def writeVLong(i: Long): Array[Byte] = {
    if (i >= -112 && i <= 127) return Array(i.toByte)
    var len = -112
    var v = i
    if (v < 0) { v ^= -1L; len = -120 }
    var tmp = v
    while (tmp != 0) { tmp >>= 8; len -= 1 }
    val n = if (len < -120) -(len + 120) else -(len + 112)
    val out = new Array[Byte](1 + n)
    out(0) = len.toByte
    var idx = n
    var pos = 1
    while (idx != 0) {
      out(pos) = ((v >> ((idx - 1) * 8)) & 0xFF).toByte
      idx -= 1; pos += 1
    }
    out
  }

  // ---- typed decoders (one per JVM primitive, for codegen) ----

  def decodeLong(enc: String, b: Array[Byte]): Long = enc match {
    case "BIGINT" => checkLen(b, 8, enc); buf(b, be = false).getLong
    case "BIGINT_BE" => checkLen(b, 8, enc); buf(b, be = true).getLong
    case "BIGINT_HADOOPV" => readVLong(b)
    case "UINT8" => checkLen(b, 8, enc); buf(b, be = false).getLong
    case "UINT4" => checkLen(b, 4, enc); buf(b, be = false).getInt & 0xFFFFFFFFL
    case "UINT4_BE" => checkLen(b, 4, enc); buf(b, be = true).getInt & 0xFFFFFFFFL
    case other => throw new IllegalArgumentException(s"not a long codec: $other")
  }

  def decodeInt(enc: String, b: Array[Byte]): Int = enc match {
    case "INT" => checkLen(b, 4, enc); buf(b, be = false).getInt
    case "INT_BE" => checkLen(b, 4, enc); buf(b, be = true).getInt
    case "INT_HADOOPV" =>
      val n = readVLong(b)
      if (n > Int.MaxValue || n < Int.MinValue)
        throw new NumberFormatException(s"value $n too long to fit in integer")
      n.toInt
    // TIME_EPOCH: 8-byte epoch millis -> millis-of-day (TimeEpochConvertFrom)
    case "TIME_EPOCH" =>
      checkLen(b, 8, enc); (buf(b, be = false).getLong % DayMillis).toInt
    case "TIME_EPOCH_BE" =>
      checkLen(b, 8, enc); (buf(b, be = true).getLong % DayMillis).toInt
    case other => throw new IllegalArgumentException(s"not an int codec: $other")
  }

  /** DateType days. The REFERENCE truncates with Java `%`, not a floor
    * (DateEpochBEConvertFrom.java: `millsOfDay = epochMillis %
    * (24*3600*1000); out.value = epochMillis - millsOfDay` — for
    * millis -1 that lands on 1970-01-01, one day late vs a flooring
    * LocalDate) — replicated exactly; reference quirks win, as with
    * year_week. */
  def decodeDateDays(enc: String, b: Array[Byte]): Int = {
    checkLen(b, 8, enc)
    val millis = buf(b, be = enc.endsWith("_BE")).getLong
    ((millis - millis % DayMillis) / DayMillis).toInt
  }

  /** TimestampType micros from 8-byte epoch millis. */
  def decodeTimestampMicros(enc: String, b: Array[Byte]): Long = {
    checkLen(b, 8, enc)
    Math.multiplyExact(buf(b, be = enc.endsWith("_BE")).getLong, 1000L)
  }

  def decodeShort(enc: String, b: Array[Byte]): Short = {
    checkLen(b, 2, enc)
    buf(b, be = enc.endsWith("_BE")).getShort
  }

  def decodeByte(enc: String, b: Array[Byte]): Byte = {
    checkLen(b, 1, enc); b(0)
  }

  def decodeFloat(enc: String, b: Array[Byte]): Float = {
    checkLen(b, 4, enc)
    buf(b, be = enc.endsWith("_BE")).getFloat
  }

  def decodeDouble(enc: String, b: Array[Byte]): Double = {
    checkLen(b, 8, enc)
    buf(b, be = enc.endsWith("_BE")).getDouble
  }

  def decodeBoolean(enc: String, b: Array[Byte]): Boolean = {
    checkLen(b, 1, enc); b(0) != 0
  }

  def decodeString(enc: String, b: Array[Byte]): UTF8String = enc match {
    case "UTF8" => UTF8String.fromBytes(b)
    case "UTF16" => UTF8String.fromString(new String(b, StandardCharsets.UTF_16))
    case other => throw new IllegalArgumentException(s"not a string codec: $other")
  }

  // ---- typed encoders ----

  def encodeLong(enc: String, v: Long): Array[Byte] = enc match {
    case "BIGINT" | "UINT8" =>
      buf(new Array[Byte](8), be = false).putLong(v).array()
    case "BIGINT_BE" =>
      buf(new Array[Byte](8), be = true).putLong(v).array()
    case "BIGINT_HADOOPV" => writeVLong(v)
    case "UINT4" | "UINT4_BE" =>
      // range-checked: silent .toInt truncation made 2^32+5 encode
      // indistinguishably from 5
      if (v < 0L || v > 0xFFFFFFFFL)
        throw new IllegalArgumentException(
          s"convert $enc: value $v outside the unsigned 32-bit range")
      buf(new Array[Byte](4), be = enc.endsWith("_BE")).putInt(v.toInt).array()
    case other => throw new IllegalArgumentException(s"not a long codec: $other")
  }

  def encodeInt(enc: String, v: Int): Array[Byte] = enc match {
    case "INT" => buf(new Array[Byte](4), be = false).putInt(v).array()
    case "INT_BE" => buf(new Array[Byte](4), be = true).putInt(v).array()
    case "INT_HADOOPV" => writeVLong(v.toLong)
    // TIME_EPOCH encode: millis-of-day back out as 8-byte millis
    case "TIME_EPOCH" =>
      buf(new Array[Byte](8), be = false).putLong(v.toLong).array()
    case "TIME_EPOCH_BE" =>
      buf(new Array[Byte](8), be = true).putLong(v.toLong).array()
    case other => throw new IllegalArgumentException(s"not an int codec: $other")
  }

  def encodeDateDays(enc: String, days: Int): Array[Byte] =
    buf(new Array[Byte](8), be = enc.endsWith("_BE"))
      .putLong(days.toLong * DayMillis).array()

  def encodeTimestampMicros(enc: String, micros: Long): Array[Byte] =
    buf(new Array[Byte](8), be = enc.endsWith("_BE"))
      .putLong(Math.floorDiv(micros, 1000L)).array()

  def encodeShort(enc: String, v: Short): Array[Byte] =
    buf(new Array[Byte](2), be = enc.endsWith("_BE")).putShort(v).array()

  def encodeByte(enc: String, v: Byte): Array[Byte] = Array(v)

  def encodeFloat(enc: String, v: Float): Array[Byte] =
    buf(new Array[Byte](4), be = enc.endsWith("_BE")).putFloat(v).array()

  def encodeDouble(enc: String, v: Double): Array[Byte] =
    buf(new Array[Byte](8), be = enc.endsWith("_BE")).putDouble(v).array()

  def encodeBoolean(enc: String, v: Boolean): Array[Byte] =
    Array(if (v) 1.toByte else 0.toByte)

  def encodeString(enc: String, v: UTF8String): Array[Byte] = enc match {
    case "UTF8" => v.getBytes
    case "UTF16" => v.toString.getBytes(StandardCharsets.UTF_16)
    case other => throw new IllegalArgumentException(s"not a string codec: $other")
  }
}

/** `convert_from(bytes, 'TYPE')` — output type depends on the TYPE
  * literal; registered via GraftExtensions (which peels the literal and
  * passes `enc`). */
case class ConvertFromExpr(child: Expression, enc: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ConvertBinary.FromTypes.contains(enc))
      TypeCheckResult.TypeCheckFailure(
        s"unknown convert_from encoding '$enc' (have " +
          s"${ConvertBinary.FromTypes.keys.toSeq.sorted.mkString(", ")})")
    else if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"convert_from expects BINARY input, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ConvertBinary.FromTypes(enc)

  private def method: String = dataType match {
    case TimestampType => "decodeTimestampMicros"
    case DateType => "decodeDateDays"
    case LongType => "decodeLong"
    case IntegerType => "decodeInt"
    case ShortType => "decodeShort"
    case ByteType => "decodeByte"
    case FloatType => "decodeFloat"
    case DoubleType => "decodeDouble"
    case BooleanType => "decodeBoolean"
    case StringType => "decodeString"
    case other => throw new IllegalStateException(s"unexpected type $other")
  }

  // dispatch selected ONCE per expression instance, not string-matched
  // per row on interpreted paths (filters during planning, fallback,
  // constant folding)
  @transient private lazy val kernel: Array[Byte] => Any = dataType match {
    case TimestampType => ConvertBinary.decodeTimestampMicros(enc, _)
    case DateType => ConvertBinary.decodeDateDays(enc, _)
    case LongType => ConvertBinary.decodeLong(enc, _)
    case IntegerType => ConvertBinary.decodeInt(enc, _)
    case ShortType => ConvertBinary.decodeShort(enc, _)
    case ByteType => ConvertBinary.decodeByte(enc, _)
    case FloatType => ConvertBinary.decodeFloat(enc, _)
    case DoubleType => ConvertBinary.decodeDouble(enc, _)
    case BooleanType => ConvertBinary.decodeBoolean(enc, _)
    case StringType => ConvertBinary.decodeString(enc, _)
    case other => throw new IllegalStateException(s"unexpected type $other")
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.functions.ConvertBinary.$method("$enc", $b);""")

  override def prettyName: String = "convert_from"

  override protected def withNewChildInternal(newChild: Expression): ConvertFromExpr =
    copy(child = newChild)
}

/** `convert_to(value, 'TYPE')` — always returns BINARY; the expected
  * input type depends on the TYPE literal (implicit casts apply via
  * ExpectsInputTypes). */
case class ConvertToExpr(child: Expression, enc: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ConvertBinary.ToTypes.contains(enc))
      TypeCheckResult.TypeCheckFailure(
        s"unknown convert_to encoding '$enc' (have " +
          s"${ConvertBinary.ToTypes.keys.toSeq.sorted.mkString(", ")})")
    else if (child.dataType != ConvertBinary.ToTypes(enc))
      TypeCheckResult.TypeCheckFailure(
        s"convert_to $enc expects ${ConvertBinary.ToTypes(enc).simpleString} " +
          s"input, got ${child.dataType.simpleString} (the registration " +
          "wraps arguments in a cast — this indicates direct construction)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType

  private def method: String = ConvertBinary.ToTypes(enc) match {
    case TimestampType => "encodeTimestampMicros"
    case DateType => "encodeDateDays"
    case LongType => "encodeLong"
    case IntegerType => "encodeInt"
    case ShortType => "encodeShort"
    case ByteType => "encodeByte"
    case FloatType => "encodeFloat"
    case DoubleType => "encodeDouble"
    case BooleanType => "encodeBoolean"
    case StringType => "encodeString"
    case other => throw new IllegalStateException(s"unexpected type $other")
  }

  @transient private lazy val kernel: Any => Any =
    ConvertBinary.ToTypes(enc) match {
      case TimestampType =>
        v => ConvertBinary.encodeTimestampMicros(enc, v.asInstanceOf[Long])
      case DateType => v => ConvertBinary.encodeDateDays(enc, v.asInstanceOf[Int])
      case LongType => v => ConvertBinary.encodeLong(enc, v.asInstanceOf[Long])
      case IntegerType => v => ConvertBinary.encodeInt(enc, v.asInstanceOf[Int])
      case ShortType => v => ConvertBinary.encodeShort(enc, v.asInstanceOf[Short])
      case ByteType => v => ConvertBinary.encodeByte(enc, v.asInstanceOf[Byte])
      case FloatType => v => ConvertBinary.encodeFloat(enc, v.asInstanceOf[Float])
      case DoubleType =>
        v => ConvertBinary.encodeDouble(enc, v.asInstanceOf[Double])
      case BooleanType =>
        v => ConvertBinary.encodeBoolean(enc, v.asInstanceOf[Boolean])
      case StringType =>
        v => ConvertBinary.encodeString(enc, v.asInstanceOf[UTF8String])
      case other => throw new IllegalStateException(s"unexpected type $other")
    }

  override def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.ConvertBinary.$method("$enc", $v);""")

  override def prettyName: String = "convert_to"

  override protected def withNewChildInternal(newChild: Expression): ConvertToExpr =
    copy(child = newChild)
}
