package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** EXIF metadata extraction over binary image columns — the headline
  * feature of the reference's image format plugin (reference
  * contrib/format-image/src/main/java/org/apache/drill/exec/store/image/
  * ImageBatchReader.java + GenericMetadataReader.java +
  * ImageMetadataUtils.java, which ride the metadata-extractor library):
  * camera make/model, orientation, capture datetime, GPS position as
  * typed columns next to the payload.
  *
  * Hand-rolled against the PUBLIC specs (JPEG ISO/IEC 10918-1 marker
  * framing; TIFF 6.0 / EXIF 2.32 IFD layout) in the same posture as the
  * HDF5/SPSS/Access readers — no metadata-extractor jar in this
  * container. Accepts JPEG (APP1 "Exif\0\0" segment) and bare TIFF
  * payloads; anything else (or any malformed structure) yields null
  * columns, not task failures — the schema-on-read contract for dirty
  * media lakes. Map-only over binary batches, the same scale shape as
  * [[Multimodal.decodeImage]].
  */
object Exif {

  /** Parsed tag subset (the columns the reference surfaces most
    * prominently); all fields nullable by construction. */
  case class ExifInfo(make: String, model: String,
                      orientation: Option[Int], datetimeOriginal: String,
                      gpsLat: Option[Double], gpsLon: Option[Double])

  private val Empty = ExifInfo(null, null, None, null, None, None)

  /** Locate the TIFF blob: either the payload IS a TIFF, or it's a JPEG
    * whose APP1 segment carries "Exif\0\0" + TIFF. Returns the offset of
    * the TIFF header within `b`, with the APP1 bound (exclusive), or
    * None. */
  private def tiffOffset(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = b(i) & 0xFF
    if (b.length >= 8 && ((b(0) == 'I' && b(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && u8(2) == 0 && u8(3) == 42)))
      return Some((0, b.length))
    if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None // not JPEG
    var pos = 2
    while (pos + 4 <= b.length) {
      if (u8(pos) != 0xFF) return None // marker desync: stop clean
      val marker = u8(pos + 1)
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS: no APP1
      val len = (u8(pos + 2) << 8) | u8(pos + 3) // includes the 2 length bytes
      if (len < 2 || pos + 2 + len > b.length) return None
      if (marker == 0xE1 && len >= 8 &&
          b(pos + 4) == 'E' && b(pos + 5) == 'x' && b(pos + 6) == 'i' &&
          b(pos + 7) == 'f' && b(pos + 8) == 0 && b(pos + 9) == 0)
        return Some((pos + 10, pos + 2 + len))
      pos += 2 + len
    }
    None
  }

  /** Parse the EXIF subset from a JPEG or TIFF payload. Never throws on
    * malformed input: every structural violation returns what was
    * recovered so far (or [[Empty]]). */
  def parse(bytes: Array[Byte]): ExifInfo = {
    if (bytes == null) return Empty
    try parseChecked(bytes)
    catch { case scala.util.control.NonFatal(_) => Empty }
  }

  private def parseChecked(b: Array[Byte]): ExifInfo = {
    val (tiff, bound) = tiffOffset(b).getOrElse(return Empty)
    if (tiff + 8 > bound) return Empty
    val le = b(tiff) == 'I'
    def u16(o: Int): Int =
      if (o < tiff || o + 2 > bound) -1
      else if (le) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    def u32(o: Int): Long =
      if (o < tiff || o + 4 > bound) -1L
      else if (le) (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
      else ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    if (u16(tiff + 2) != 42) return Empty

    // one IFD -> Map(tag -> (type, count, valueFieldOffset)); the value
    // field holds the value inline when its byte size <= 4, else a
    // TIFF-relative offset to it
    def readIfd(ifdOff: Long): Map[Int, (Int, Long, Int)] = {
      val base = tiff + ifdOff.toInt
      val n = u16(base)
      if (ifdOff <= 0 || n < 0 || n > 512) return Map.empty
      (0 until n).flatMap { i =>
        val e = base + 2 + i * 12
        val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
        if (tag < 0 || typ < 0 || cnt < 0) None
        else Some(tag -> (typ, cnt, e + 8))
      }.toMap
    }
    val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 7 -> 1,
      9 -> 4, 10 -> 8)
    // resolve where the VALUES live for an entry
    def valOff(typ: Int, cnt: Long, vf: Int): Int = {
      val sz = typeSize.getOrElse(typ, 1) * cnt
      if (sz <= 4) vf else tiff + u32(vf).toInt
    }
    def ascii(e: (Int, Long, Int)): String = {
      val (typ, cnt, vf) = e
      if (typ != 2 || cnt <= 0 || cnt > 4096) return null
      val o = valOff(typ, cnt, vf)
      if (o < tiff || o + cnt > bound) return null
      val raw = new String(b, o, cnt.toInt,
        java.nio.charset.StandardCharsets.US_ASCII)
      val s = raw.takeWhile(_ != '\u0000').trim
      if (s.isEmpty) null else s
    }
    def short(e: (Int, Long, Int)): Option[Int] = {
      val (typ, cnt, vf) = e
      if (typ != 3 || cnt < 1) None
      else { val v = u16(valOff(typ, cnt, vf)); if (v < 0) None else Some(v) }
    }
    def long_(e: (Int, Long, Int)): Option[Long] = {
      val (typ, cnt, vf) = e
      if ((typ != 4 && typ != 3) || cnt < 1) None
      else if (typ == 3) short(e).map(_.toLong)
      else { val v = u32(vf); if (v < 0) None else Some(v) }
    }
    // count RATIONALs (u32 num / u32 den each)
    def rationals(e: (Int, Long, Int), want: Int): Option[Seq[Double]] = {
      val (typ, cnt, vf) = e
      if (typ != 5 || cnt < want) return None
      val o = valOff(typ, cnt, vf)
      val vs = (0 until want).map { i =>
        val num = u32(o + i * 8); val den = u32(o + i * 8 + 4)
        if (num < 0 || den <= 0) return None
        num.toDouble / den.toDouble
      }
      Some(vs)
    }

    val ifd0 = readIfd(u32(tiff + 4))
    val make = ifd0.get(0x010F).map(ascii).orNull
    val model = ifd0.get(0x0110).map(ascii).orNull
    val orientation = ifd0.get(0x0112).flatMap(short)
    val exifIfd = ifd0.get(0x8769).flatMap(long_).map(readIfd).getOrElse(Map.empty)
    val dtOrig = exifIfd.get(0x9003).map(ascii)
      .orElse(ifd0.get(0x0132).map(ascii)).orNull
    val gpsIfd = ifd0.get(0x8825).flatMap(long_).map(readIfd).getOrElse(Map.empty)
    // GPS position: 3 rationals (deg, min, sec) + ASCII hemisphere ref;
    // evaluation order d + m/60 + s/3600 is pinned — the gate's oracle
    // recomputes the same expression and IEEE addition is order-sensitive
    def gps(valTag: Int, refTag: Int, negRef: String): Option[Double] =
      for {
        e <- gpsIfd.get(valTag)
        Seq(d, m, s) <- rationals(e, 3)
        ref = gpsIfd.get(refTag).map(ascii).orNull
      } yield {
        val v = d + m / 60.0 + s / 3600.0
        if (ref != null && ref.equalsIgnoreCase(negRef)) -v else v
      }
    ExifInfo(make, model, orientation, dtOrig,
      gps(0x0002, 0x0001, "S"), gps(0x0004, 0x0003, "W"))
  }

  /** EXIF columns appended to a media frame — the DataFrame surface of
    * the reference's image plugin: exif_make, exif_model,
    * exif_orientation, exif_datetime (the EXIF local-time string — no
    * timezone is recorded in EXIF, so surfacing it as a naive string is
    * the honest type), exif_gps_lat/lon in signed decimal degrees. */
  def exifMetadata(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("exif_make", StringType, nullable = true),
      StructField("exif_model", StringType, nullable = true),
      StructField("exif_orientation", IntegerType, nullable = true),
      StructField("exif_datetime", StringType, nullable = true),
      StructField("exif_gps_lat", DoubleType, nullable = true),
      StructField("exif_gps_lon", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = media.schema.fieldIndex(payloadCol)
    media.mapPartitions { rows =>
      rows.map { r =>
        val info = parse(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(info.make, info.model,
          info.orientation.orNull, info.datetimeOriginal,
          info.gpsLat.orNull, info.gpsLon.orNull))
      }
    }(enc).toDF(outSchema.fieldNames: _*)
  }

  // ---- deterministic EXIF writer (fixture/gate support) ---------------

  /** Build a little-endian EXIF APP1 payload carrying exactly the tag
    * subset [[parse]] reads, and splice it into `jpeg` right after SOI.
    * Writer-side twin used by the gate: graft synthesizes JPEGs with
    * known tags, parses them back, and the oracle recomputes the tag
    * values arithmetically. Also exercised round-trip in the spec. */
  def withExif(jpeg: Array[Byte], make: String, model: String,
               orientation: Int, datetime: String,
               latDMS: (Long, Long, Long), latRef: String,
               lonDMS: (Long, Long, Long), lonRef: String): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "payload is not a JPEG")
    val bb = java.nio.ByteBuffer.allocate(4096)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def asciiBytes(s: String) = (s + "\u0000").getBytes("US-ASCII")
    // layout: header(8) | IFD0 | exifIFD | gpsIFD | data area
    val makeB = asciiBytes(make); val modelB = asciiBytes(model)
    val dtB = asciiBytes(datetime)
    val latRefB = asciiBytes(latRef); val lonRefB = asciiBytes(lonRef)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    val ifd0Entries = 6
    val ifd0Start = 8
    val exifStart = ifd0Start + 2 + ifd0Entries * 12 + 4
    val gpsStart = exifStart + 2 + 1 * 12 + 4
    val gpsEntries = 4
    var dataOff = gpsStart + 2 + gpsEntries * 12 + 4
    val data = java.nio.ByteBuffer.allocate(2048)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def extVal(bytes: Array[Byte]): Int = {
      val o = dataOff + data.position(); data.put(bytes); o
    }
    def entry(tag: Int, typ: Int, cnt: Int, inline: Option[Int],
              ext: Option[Array[Byte]]): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      inline match {
        case Some(v) if typ == 3 => bb.putShort(v.toShort).putShort(0)
        case Some(v) => bb.putInt(v)
        case None =>
          val bytes = ext.get
          if (bytes.length <= 4) { // TIFF 6.0: values <= 4 bytes are INLINE
            bb.put(bytes)
            (bytes.length until 4).foreach(_ => bb.put(0.toByte))
          } else bb.putInt(extVal(bytes))
      }
    }
    def rationalBytes(vs: Seq[(Long, Long)]): Array[Byte] = {
      val r = java.nio.ByteBuffer.allocate(vs.size * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach { case (n, d) => r.putInt(n.toInt).putInt(d.toInt) }
      r.array()
    }
    // IFD0 (tags ascending, per spec)
    bb.position(ifd0Start); bb.putShort(ifd0Entries.toShort)
    entry(0x010F, 2, makeB.length, None, Some(makeB))
    entry(0x0110, 2, modelB.length, None, Some(modelB))
    entry(0x0112, 3, 1, Some(orientation), None)
    entry(0x0132, 2, dtB.length, None, Some(dtB))
    entry(0x8769, 4, 1, Some(exifStart), None)
    entry(0x8825, 4, 1, Some(gpsStart), None)
    bb.putInt(0) // next-IFD pointer
    // Exif IFD: DateTimeOriginal
    bb.putShort(1)
    entry(0x9003, 2, dtB.length, None, Some(dtB))
    bb.putInt(0)
    // GPS IFD
    bb.putShort(gpsEntries.toShort)
    val latRefInline = (latRefB(0) & 0xFF) | ((latRefB(1) & 0xFF) << 8)
    val lonRefInline = (lonRefB(0) & 0xFF) | ((lonRefB(1) & 0xFF) << 8)
    entry(0x0001, 2, 2, Some(latRefInline), None)
    entry(0x0002, 5, 3, None, Some(rationalBytes(Seq(
      latDMS._1 -> 1L, latDMS._2 -> 1L, latDMS._3 -> 1L))))
    entry(0x0003, 2, 2, Some(lonRefInline), None)
    entry(0x0004, 5, 3, None, Some(rationalBytes(Seq(
      lonDMS._1 -> 1L, lonDMS._2 -> 1L, lonDMS._3 -> 1L))))
    bb.putInt(0)
    require(bb.position() == dataOff, s"layout bug: ${bb.position()} vs $dataOff")
    val tiff = java.util.Arrays.copyOf(bb.array(), dataOff + data.position())
    System.arraycopy(data.array(), 0, tiff, dataOff, data.position())
    val exifHdr = Array[Byte]('E', 'x', 'i', 'f', 0, 0)
    val segLen = 2 + exifHdr.length + tiff.length
    val o = new java.io.ByteArrayOutputStream(jpeg.length + segLen + 2)
    o.write(0xFF); o.write(0xD8)
    o.write(0xFF); o.write(0xE1)
    o.write((segLen >> 8) & 0xFF); o.write(segLen & 0xFF)
    o.write(exifHdr); o.write(tiff)
    o.write(jpeg, 2, jpeg.length - 2)
    o.toByteArray
  }
}
