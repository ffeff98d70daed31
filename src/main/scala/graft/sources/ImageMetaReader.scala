package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Image-metadata format reader — Drill's contrib/format-image (which
  * wraps the metadata-extractor library) re-expressed over the JDK's own
  * imageio: one row per image file with format, dimensions, and byte
  * size. "Query a directory of images like a table" is the Drill
  * contract; decode of pixel data stays in Multimodal.decodeImage.
  *
  * Scale shape: the file LIST parallelizes (one task per file, like
  * AvroReader/XlsxReader); only headers are decoded, not pixels, so a
  * task reads a few KB per image regardless of image size. Unreadable
  * files yield a row with null dims, not a failure (schema-on-read over
  * dirty media directories).
  */
object ImageMetaReader {

  val schema: StructType = StructType(Seq(
    StructField("filename", StringType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("size_bytes", LongType, nullable = false)))

  private val Extensions = Set("png", "bmp", "gif", "jpg", "jpeg", "wbmp")

  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    FileList.asDataset(spark, path, Extensions.map("." + _))
      .mapPartitions { paths =>
        val conf2 = sconf.value
        paths.map { f =>
          val fp = new Path(f)
          val fsx = fp.getFileSystem(conf2)
          val size = fsx.getFileStatus(fp).getLen
          val name = fp.getName
          val in = fsx.open(fp)
          // NonFatal, not just IOException: imageio throws RuntimeExceptions
          // (CMMException, IAE, ...) on malformed headers — all of them are
          // "dirty file" rows here, never task failures
          var iis: javax.imageio.stream.ImageInputStream = null
          var r: javax.imageio.ImageReader = null
          try {
            iis = javax.imageio.ImageIO.createImageInputStream(in)
            val readers =
              if (iis == null) java.util.Collections.emptyIterator[javax.imageio.ImageReader]()
              else javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              r = readers.next()
              r.setInput(iis)
              // header-only: width/height come from the stream metadata,
              // no pixel decode
              Row(name, r.getFormatName.toLowerCase,
                r.getWidth(0), r.getHeight(0), size)
            } else Row(name, null, null, null, size)
          } catch {
            case scala.util.control.NonFatal(_) => Row(name, null, null, null, size)
          } finally {
            // the ImageInputStream owns a disk-cache temp file per image
            // (FileCacheImageInputStream) — leaking it fills /tmp on a
            // long-running server; dispose the reader on error paths too
            if (r != null) try r.dispose() catch { case _: Throwable => () }
            if (iis != null) try iis.close() catch { case _: Throwable => () }
            in.close()
          }
        }
      }(enc).toDF(schema.fieldNames: _*)
  }
}
