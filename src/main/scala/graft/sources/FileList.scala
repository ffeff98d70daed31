package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}

/** Shared plumbing for the hand-rolled file readers (Avro/XLSX/PCAP/PDF/
  * image-metadata): resolve a file-or-directory path to the matching
  * files and parallelize one task per file — a workbook/capture/document
  * is not block-splittable, so per-file tasks are the parallel unit.
  */
object FileList {

  /** Files under `path` (or `path` itself) whose lowercase name ends with
    * one of `extensions`; single explicit files skip the extension check
    * (the caller named the file deliberately). */
  def resolve(spark: SparkSession, path: String,
              extensions: Set[String]): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recurse into subdirectories (rotated-capture layouts nest files)
    // and keep only real FILES: a directory named day1.pcap/ must not be
    // handed to a per-file reader as if it were a capture
    def walk(d: Path): Seq[Path] =
      fs.listStatus(d).toSeq.flatMap { st =>
        val n = st.getPath.getName
        // hidden/bookkeeping prefixes skip for FILES too: macOS
        // AppleDouble forks (._x.pcap) and hadoop .crc sidecars match
        // the extension but are not decodable payloads
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (st.isFile &&
            extensions.exists(e => n.toLowerCase.endsWith(e)))
          Seq(st.getPath)
        else Nil
      }
    val files =
      if (fs.getFileStatus(p).isDirectory)
        walk(p).map(_.toString).sorted
      else Seq(path)
    require(files.nonEmpty,
      s"no ${extensions.mkString("/")} files under $path")
    files
  }

  /** The file list as a Dataset sized one task per file, capped at the
    * CLUSTER's parallelism — a constant 32 pinned a 10,000-file decode
    * to 32 tasks on any size cluster (the ParquetMetadataCache sweep
    * follows defaultParallelism for the same reason). Override with
    * `graft.filelist.parallelism`. */
  def asDataset(spark: SparkSession, path: String,
                extensions: Set[String]): Dataset[String] =
    asDataset(spark, resolve(spark, path, extensions))

  /** Overload over an ALREADY-RESOLVED list: readers that list once for
    * schema inference must not pay (and race against) a second full
    * directory walk for the task list. */
  def asDataset(spark: SparkSession, files: Seq[String]): Dataset[String] = {
    import spark.implicits._
    val par = spark.conf.getOption("graft.filelist.parallelism").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    spark.createDataset(files).repartition(math.min(files.size, math.max(par, 1)))
  }
}
