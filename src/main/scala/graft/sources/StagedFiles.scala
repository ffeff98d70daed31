package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared helpers for the staged-parquet commit pattern the hand-rolled
  * lakehouse writers use (write to a staging dir, walk the part files,
  * move them into the table layout, record row counts in the commit
  * metadata). One definition — the Iceberg and Paimon copies of these
  * had to be kept in sync by hand. */
private[sources] object StagedFiles {

  /** Every committed parquet part under `p`: recurses past partition
    * directories (`__p_c=v`), skips Spark's `_temporary`/hidden dirs and
    * marker files. */
  def walkParquet(fs: FileSystem, p: Path): Seq[Path] =
    fs.listStatus(p).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (s.isDirectory) {
        // exact _temporary, not a _t prefix: a partition dir like
        // _tier=gold would otherwise be silently skipped at commit
        if (n == "_temporary" || n.startsWith(".")) Nil
        else walkParquet(fs, s.getPath)
      }
      else if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        Seq(s.getPath)
      else Nil
    }

  /** Row count from the parquet footer (metadata read, no data scan). */
  def parquetRowCount(spark: SparkSession, p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}
