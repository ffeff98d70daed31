package graft.sources

import java.io.DataInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ESRI shapefile reader — point geometry from `.shp`, attributes from
  * the sidecar `.dbf` (dBASE III), joined by record order as the format
  * specifies. Reference surface: contrib/format-esri/.../ShpBatchReader.java
  * (Drill likewise emits one row per shape record with dbf attributes).
  * Both binary layouts are public: the ESRI Shapefile Technical
  * Description (July 1998 white paper) and the dBASE III header spec.
  *
  * Output shape matches the GeoJSON reader (feature_idx, geom_type,
  * lon, lat, properties map), so heterogeneous geo sources union/join
  * cleanly — the same "one relational shape per domain" contract the
  * pcap pair follows.
  *
  * Scope: Point (type 1) and Null (type 0) records; other shape types
  * yield a row with the type name and null lon/lat rather than failing
  * (schema-on-read over mixed layers). Files parallelize one task per
  * file, like the other hand-rolled readers.
  */
object ShapefileReader {

  val schema: StructType = StructType(Seq(
    StructField("feature_idx", IntegerType, nullable = false),
    StructField("geom_type", StringType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("lat", DoubleType, nullable = true),
    StructField("properties", MapType(StringType, StringType), nullable = true)))

  private def leI32(b: Array[Byte], off: Int): Int =
    ((b(off + 3) & 0xFF) << 24) | ((b(off + 2) & 0xFF) << 16) |
      ((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)

  private def leU16(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)

  private def leF64(b: Array[Byte], off: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(off + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  private def shapeName(t: Int): String = t match {
    case 0 => "Null"
    case 1 => "Point"
    case 3 => "PolyLine"
    case 5 => "Polygon"
    case 8 => "MultiPoint"
    case other => s"Type$other"
  }

  /** Parse one .shp stream into (recordNumber, geomType, lon, lat). */
  private[graft] def parseShp(in: DataInputStream): Seq[(Int, String, Option[(Double, Double)])] = {
    val hdr = new Array[Byte](100)
    // shorter than the fixed 100-byte header = truncated, zero rows
    if (in.readNBytes(hdr, 0, 100) < 100) { in.close(); return Nil }
    val fileCode = ((hdr(0) & 0xFF) << 24) | ((hdr(1) & 0xFF) << 16) |
      ((hdr(2) & 0xFF) << 8) | (hdr(3) & 0xFF)
    require(fileCode == 9994, s"not a shapefile (file code $fileCode)")
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, Option[(Double, Double)])]()
    val rh = new Array[Byte](8)
    var more = true
    while (more) {
      val got = in.readNBytes(rh, 0, 8)
      if (got < 8) { more = false }
      else {
        val recNo = ((rh(0) & 0xFF) << 24) | ((rh(1) & 0xFF) << 16) |
          ((rh(2) & 0xFF) << 8) | (rh(3) & 0xFF)
        val contentWords = ((rh(4) & 0xFF) << 24) | ((rh(5) & 0xFF) << 16) |
          ((rh(6) & 0xFF) << 8) | (rh(7) & 0xFF)
        val contentLen = contentWords * 2
        if (contentLen < 4 || contentLen > (1 << 26)) { more = false }
        else {
          val body = new Array[Byte](contentLen)
          // a .shp truncated mid-record (partial copy) stops at the last
          // whole record like the pcap readers, instead of failing the
          // task with EOFException
          val gotBody = in.readNBytes(body, 0, contentLen)
          if (gotBody < contentLen) { more = false }
          else {
          val shapeType = leI32(body, 0)
          val pt =
            if (shapeType == 1 && contentLen >= 20)
              Some((leF64(body, 4), leF64(body, 12)))
            else None
          out += ((recNo, shapeName(shapeType), pt))
          }
        }
      }
    }
    in.close()
    out.toSeq
  }

  /** Parse a .dbf (dBASE III) stream into per-record attribute maps. */
  private[graft] def parseDbf(in: DataInputStream): Seq[Map[String, String]] = {
    val hdr = new Array[Byte](32)
    in.readFully(hdr)
    val nRecords = leI32(hdr, 4)
    val headerSize = leU16(hdr, 8)
    val recordSize = leU16(hdr, 10)
    // field descriptors: 32 bytes each until the 0x0D terminator
    val fieldArea = new Array[Byte](headerSize - 32)
    in.readFully(fieldArea)
    val fields = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var off = 0
    while (off + 32 <= fieldArea.length && fieldArea(off) != 0x0D) {
      val nameEnd = {
        var e = off
        while (e < off + 11 && fieldArea(e) != 0) e += 1
        e
      }
      val name = new String(fieldArea, off, nameEnd - off, "US-ASCII")
      val len = fieldArea(off + 16) & 0xFF
      fields += ((name, len))
      off += 32
    }
    val out = (0 until nRecords).map { _ =>
      val rec = new Array[Byte](recordSize)
      in.readFully(rec)
      var p = 1 // deletion flag
      fields.map { case (name, len) =>
        // ISO-8859-1, not US-ASCII: dBASE attribute tables are routinely
        // Latin-1/CP1252 ("Zürich") and ASCII mapped every byte >= 0x80
        // to U+FFFD — Latin-1 preserves the bytes losslessly
        val v = new String(rec, p, len, "ISO-8859-1").trim
        p += len
        name -> v
      }.toMap
    }
    in.close()
    out
  }

  /** Read .shp files (with sidecar .dbf attributes when present) under
    * `path` into the GeoJSON-shaped relation. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    FileList.asDataset(spark, path, Set(".shp"))
      .mapPartitions { paths =>
        val conf2 = sconf.value
        paths.flatMap { f =>
          val fp = new Path(f)
          val fs = fp.getFileSystem(conf2)
          val shapes = {
            val in = new DataInputStream(fs.open(fp))
            // parse is eager and closes at EOF; the finally covers a
            // mid-parse failure (close is idempotent)
            try parseShp(in) finally in.close()
          }
          // case-preserved candidates: FileList matches .shp
          // case-insensitively, and ROADS.SHP's sidecar is ROADS.DBF —
          // a case-sensitive replace left dbfPath == the .shp itself,
          // whose parse failed and silently dropped every attribute
          val stem = f.substring(0, f.length - 4)
          val dbfPath = Seq(".dbf", ".DBF", ".Dbf")
            .map(e => new Path(stem + e)).find(fs.exists)
            .getOrElse(new Path(stem + ".dbf"))
          val attrs: Seq[Map[String, String]] =
            if (fs.exists(dbfPath)) {
              val in = new DataInputStream(fs.open(dbfPath))
              try parseDbf(in)
              catch { case scala.util.control.NonFatal(_) => Seq.empty }
              finally in.close()
            } else Seq.empty
          shapes.iterator.zipWithIndex.map { case ((recNo, gt, pt), idx) =>
            val props = if (idx < attrs.length) attrs(idx) else null
            Row(recNo - 1, gt, // record numbers are 1-based in the format
              pt.map(_._1).map(Double.box).orNull,
              pt.map(_._2).map(Double.box).orNull,
              props)
          }
        }
      }(enc).toDF(schema.fieldNames.toSeq: _*)
  }
}
