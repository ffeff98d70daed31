package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file reader for FLAT records of primitive types — the
  * common interchange case Drill's core avro format covers (reference:
  * exec/.../store/avro/AvroRecordReader.java). This container ships the
  * avro-java library but not the spark-avro connector module, so decoding
  * runs inside mapPartitions: the file list parallelizes (one task per
  * file — avro's unit of parallel decode without block-split logic), the
  * schema comes from the first file's header.
  */
object AvroReader {

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(branches.size == 1, s"only [null, T] unions supported, got $s")
      (toSparkType(branches.head)._1, true)
    case t => throw new IllegalArgumentException(
      s"unsupported avro type for flat read: $t")
  }

  def sparkSchema(avro: Schema): StructType = StructType(
    avro.getFields.asScala.toSeq.map { f =>
      val (dt, _) = toSparkType(f.schema())
      // ALWAYS nullable: the cross-file degrade in convert() nulls a
      // missing/mismatched field — a non-nullable StructField made the
      // RowEncoder THROW on exactly the schema-evolution case that
      // null-out contract exists for (every other reader is nullable)
      StructField(f.name(), dt, nullable = true)
    })

  private[sources] def convert(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    // SchemaAlign's contract: a value whose runtime type disagrees with
    // the reference schema (schema evolution across files) NULLS OUT
    // instead of crashing the encoder with "not a valid external type"
    case (x: java.lang.Integer, IntegerType) => x
    case (x: java.lang.Long, LongType) => x
    case (x: java.lang.Float, FloatType) => x
    case (x: java.lang.Double, DoubleType) => x
    case (x: java.lang.Boolean, BooleanType) => x
    case (x: java.lang.Integer, LongType) => x.longValue // widening is safe
    case (x: java.lang.Float, DoubleType) => x.doubleValue
    case _ => null
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = FileList.resolve(spark, path, Set(".avro"))

    val avroSchema = {
      val in = new FsInput(new Path(files.head), conf)
      val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally { r.close() }
    }
    val schema = sparkSchema(avroSchema)
    val fieldTypes = schema.fields.map(_.dataType)
    val fieldNames = avroSchema.getFields.asScala.map(_.name()).toArray

    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val confB = spark.sparkContext.broadcast(new SerializableHadoopConf(conf))
    val pairs = fieldNames.zip(fieldTypes).toSeq // hoisted off the per-row path
    FileList.asDataset(spark, files) // listed once, above
      .mapPartitions { paths =>
        // the broadcast session conf, NOT a bare Configuration(): an
        // s3a/hdfs path resolves on the driver but a credential-less
        // executor conf fails every task (the ParquetMetadataCache
        // lesson, applied here)
        val conf2 = confB.value.value
        paths.flatMap { f =>
          val reader = new DataFileReader[GenericRecord](
            new FsInput(new Path(f), conf2), new GenericDatumReader[GenericRecord]())
          // LIMIT / failed tasks abandon the iterator before exhaustion —
          // close on task completion like the other streaming readers
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try reader.close() catch { case _: java.io.IOException => () }))
          new Iterator[Row] {
            def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
            def next(): Row = {
              val rec = reader.next()
              Row.fromSeq(pairs.map {
                case (n, dt) => convert(rec.get(n), dt)
              })
            }
          }
        }
      }(enc).toDF(schema.fieldNames: _*)
  }
}
