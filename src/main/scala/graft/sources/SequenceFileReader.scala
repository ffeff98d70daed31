package graft.sources

import org.apache.hadoop.io.{BytesWritable, DataOutputBuffer, NullWritable, Text, Writable}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hadoop SequenceFile reader — Drill's sequencefile format plugin
  * (reference: exec/java-exec/.../store/easy/sequencefile/
  * SequenceFileRecordReader.java), which surfaces each record as
  * `binary_key` / `binary_value`.
  *
  * Spark-native: the scan IS Spark's Hadoop-RDD machinery (splittable —
  * SequenceFiles carry sync markers, so one file fans out across tasks;
  * Drill's reader splits the same way via FileSplit), mapped once into a
  * DataFrame. Key/value classes come from the file header:
  *   - Text         → its exact bytes (UTF-8, no length prefix)
  *   - BytesWritable → the raw payload
  *   - NullWritable → null
  *   - anything else → its serialized form (what Drill's binary columns
  *     hold for arbitrary writables)
  * Writables are REUSED by the record reader, so bytes are copied out
  * before the row leaves the iterator.
  */
object SequenceFileReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[Writable], classOf[Writable])
      .map { case (k, v) => (toBytes(k), toBytes(v)) }
      .toDF("binary_key", "binary_value")
  }

  private def toBytes(w: Writable): Array[Byte] = w match {
    case t: Text           => java.util.Arrays.copyOf(t.getBytes, t.getLength)
    case b: BytesWritable  => b.copyBytes()
    case _: NullWritable   => null
    case other =>
      val buf = new DataOutputBuffer()
      other.write(buf)
      java.util.Arrays.copyOf(buf.getData, buf.getLength)
  }
}
