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
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(f => Extensions(f.getName.reverse.takeWhile(_ != '.').reverse.toLowerCase))
          .map(_.toString).sorted
      else Seq(path)
    require(files.nonEmpty, s"no image files under $path")

    import spark.implicits._
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    spark.createDataset(files)
      .repartition(math.min(files.size, 32))
      .mapPartitions { paths =>
        val conf2 = new Configuration()
        paths.map { f =>
          val fp = new Path(f)
          val fsx = fp.getFileSystem(conf2)
          val size = fsx.getFileStatus(fp).getLen
          val name = fp.getName
          val in = fsx.open(fp)
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(in)
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val r = readers.next()
              r.setInput(iis)
              // header-only: width/height come from the stream metadata,
              // no pixel decode
              val row = Row(name, r.getFormatName.toLowerCase,
                r.getWidth(0), r.getHeight(0), size)
              r.dispose()
              row
            } else Row(name, null, null, null, size)
          } catch {
            case _: java.io.IOException => Row(name, null, null, null, size)
          } finally in.close()
        }
      }(enc).toDF(schema.fieldNames: _*)
  }
}
