package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Hand-rolled Delta Lake transaction-log reader — no delta-core jar, the
  * same way AvroReader/XlsxReader/PdfReader parse their formats directly.
  * A Delta table is plain parquet data files plus `_delta_log/`, a
  * sequence of version-numbered JSON commits (`%020d.json`), each line
  * one action: `add` (file enters the snapshot), `remove` (file leaves
  * it), `metaData` (table schema as Spark DataType JSON + partition
  * columns), `protocol`, `commitInfo`. Public protocol:
  * github.com/delta-io/delta PROTOCOL.md. Reference surface:
  * contrib/format-deltalake/.../DeltaGroupScan.java + snapshot/ (Drill
  * reads the same log through the delta standalone library).
  *
  * Snapshot reconstruction replays versions 0..V in order; the LAST
  * action per data-file path wins (a re-add after a remove restores the
  * file). The log is metadata-scale (KBs per commit) and parses
  * driver-side — exactly what every Delta implementation does — while
  * the DATA files are read with the ordinary distributed parquet scan,
  * so column pruning and predicate pushdown still reach the footers.
  *
  * Partition values live in the LOG (`add.partitionValues`), not in the
  * data files (Delta spec): they are attached as literal columns cast to
  * the declared type, one scan per distinct partition tuple — partition
  * count is metadata-scale by design.
  *
  * Scope: JSON commits (checkpoint-parquet compaction not required for
  * correctness on tables whose full JSON history is present; a reader
  * hitting a vacuumed table with only checkpoints raises a clear error
  * rather than a wrong answer).
  */
object DeltaLogReader {

  private val mapper = new ObjectMapper()

  private case class AddFile(path: String, partitionValues: Map[String, String])

  /** Commit versions present in `_delta_log`, ascending. */
  def tableVersions(spark: SparkSession, tablePath: String): Seq[Long] = {
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir))
      throw new IllegalArgumentException(s"not a Delta table (no _delta_log): $tablePath")
    val versions = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted
    if (versions.isEmpty)
      throw new IllegalArgumentException(
        s"no JSON commits in $logDir (checkpoint-only/vacuumed logs unsupported)")
    versions
  }

  /** (schema, partitionColumns, active files) after replaying 0..version. */
  private def snapshot(spark: SparkSession, tablePath: String,
                       version: Option[Long]): (StructType, Seq[String], Seq[AddFile]) = {
    val versions = tableVersions(spark, tablePath)
    val upTo = version.getOrElse(versions.last)
    require(versions.contains(upTo),
      s"version $upTo not in log of $tablePath (have ${versions.mkString(", ")})")
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    var schema: StructType = null
    var partCols: Seq[String] = Nil
    val state = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    versions.takeWhile(_ <= upTo).foreach { v =>
      val p = new Path(new Path(tablePath, "_delta_log"), f"$v%020d.json")
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines.filter(_.trim.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("metaData")) {
          val md = n.get("metaData")
          schema = DataType.fromJson(md.get("schemaString").asText).asInstanceOf[StructType]
          partCols = Option(md.get("partitionColumns"))
            .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil)
        } else if (n.has("add")) {
          val a = n.get("add")
          val pv = Option(a.get("partitionValues"))
            .map(_.fields.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty[String, String])
          state(a.get("path").asText) = AddFile(a.get("path").asText, pv)
        } else if (n.has("remove")) {
          state.remove(n.get("remove").get("path").asText)
        } // protocol/commitInfo/txn actions carry no snapshot state
      }
    }
    require(schema != null, s"no metaData action in log of $tablePath")
    (schema, partCols, state.values.toSeq)
  }

  /** Relative paths of the data files in the current snapshot (writer
    * support: an Overwrite commit removes exactly these). */
  private[graft] def activeFiles(spark: SparkSession, tablePath: String): Seq[String] =
    snapshot(spark, tablePath, None)._3.map(_.path)

  /** Read the table at `version` (default: latest commit). */
  def read(spark: SparkSession, tablePath: String,
           version: Option[Long] = None): DataFrame = {
    val (schema, partCols, files) = snapshot(spark, tablePath, version)
    val dataSchema = StructType(schema.fields.filterNot(f => partCols.contains(f.name)))
    def absolute(p: String): String =
      if (p.startsWith("/") || p.contains("://")) p else s"$tablePath/$p"
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    if (partCols.isEmpty)
      spark.read.schema(dataSchema).parquet(files.map(f => absolute(f.path)): _*)
    else
      files.groupBy(_.partitionValues).toSeq.map { case (pv, group) =>
        val base = spark.read.schema(dataSchema)
          .parquet(group.map(f => absolute(f.path)): _*)
        partCols.foldLeft(base) { (df, c) =>
          val raw = pv.get(c).orNull // absent/null partitionValue => NULL partition
          df.withColumn(c,
            (if (raw == null) lit(null) else lit(raw)).cast(schema(c).dataType))
        }
      }.reduce(_ unionByName _).select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Append one hand-written JSON commit (fixture/spec helper; the action
    * lines must each be a complete JSON object per the Delta protocol). */
  private[graft] def writeCommit(spark: SparkSession, tablePath: String,
                                 version: Long, actions: Seq[String]): Unit = {
    val p = new Path(new Path(tablePath, "_delta_log"), f"$version%020d.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally os.close()
  }

  /** metaData action JSON for a schema (fixture/spec helper). */
  private[graft] def metaDataAction(schema: StructType,
                                    partCols: Seq[String]): String = {
    val schemaStr = mapper.writeValueAsString(schema.json)
    val parts = partCols.map(c => s""""$c"""").mkString("[", ",", "]")
    s"""{"metaData":{"id":"graft-fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":$schemaStr,"partitionColumns":$parts,"configuration":{}}}"""
  }

  /** Write `df` as ONE parquet file at tablePath/relName (fixture/spec
    * helper — Delta add actions reference single files, Spark writes
    * directories; the lone part-file is renamed into place). */
  private[graft] def writeDataFile(df: DataFrame, tablePath: String,
                                   relName: String): Long = {
    val spark = df.sparkSession
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(tablePath, s"_tmp_${relName.replace('/', '_')}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    val dest = new Path(tablePath, relName)
    fs.mkdirs(dest.getParent)
    fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(tmp, true)
    fs.getFileStatus(dest).getLen
  }
}
