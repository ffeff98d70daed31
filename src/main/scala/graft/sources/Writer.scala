package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writer / CTAS path — Drill's `CREATE TABLE AS` materialization
  * (reference: exec/.../physical/impl/WriterRecordBatch.java,
  * easy/json/JsonRecordWriter.java, parquet/ParquetRecordWriter.java),
  * re-expressed over Spark's DataFrameWriter so the write inherits the
  * plan's partitioning (each task writes its own file — the same
  * fragment-parallel layout Drill's writer produces).
  */
object Writer {

  /** CTAS: persist `df` at `path` in `format`, returning the re-read
    * table (what a follow-up `SELECT * FROM <new table>` sees).
    * Hive-style `partitionBy` columns become directory partitions —
    * Drill's dir0/dir1 layout with self-describing key=value names. */
  def ctas(df: DataFrame, path: String, format: String = "parquet",
           partitionBy: Seq[String] = Nil): DataFrame = format match {
    // lakehouse targets: CTAS commits through the table format's own log,
    // so the new table time-travels and streams like any other
    case "delta" =>
      require(partitionBy.isEmpty, "delta CTAS: use DeltaLogWriter for partitioned tables")
      DeltaLogWriter.write(df, path, org.apache.spark.sql.SaveMode.Overwrite)
      read(df.sparkSession, path, format)
    case "iceberg" =>
      IcebergTable.write(df, path, org.apache.spark.sql.SaveMode.Overwrite,
        partitionBy = partitionBy)
      read(df.sparkSession, path, format)
    case "paimon" =>
      require(partitionBy.isEmpty,
        "paimon CTAS: partitioned paimon tables are not supported")
      PaimonTable.write(df, path, org.apache.spark.sql.SaveMode.Overwrite)
      read(df.sparkSession, path, format)
    case _ =>
      val writer0 = df.write.format(format).mode("overwrite")
      val writer = format match {
        case "csv" => writer0.option("header", "true")
        case _ => writer0
      }
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .save(path)
      read(df.sparkSession, path, format)
  }

  /** Bucketed CTAS — the storage-time sibling of Drill's query-time
    * hash exchanges (ref exec/.../physical/config/HashToRandomExchange
    * plans re-hash both join sides on EVERY query): hash-clustering the
    * table into `buckets` files per the bucket columns once at write
    * time lets every later equi-join or aggregation on those columns
    * run with ZERO shuffle — Spark's FileSourceScanExec reports the
    * bucket spec as its outputPartitioning, so sort-merge joins between
    * co-bucketed tables skip both ShuffleExchanges (and both sorts if
    * `sortCols` matches). At 100 TB the shuffle IS the cost of a
    * fact-fact join; bucketing amortizes it across all downstream
    * queries. Mismatched bucket counts still co-locate when one is a
    * multiple of the other via `spark.sql.bucketing.coalesceBucketsIn
    * Join.enabled`. Registered as a catalog table (bucket metadata
    * lives in the catalog, not the files), overwriting any previous
    * `table`. */
  def bucketedCtas(df: DataFrame, table: String, buckets: Int,
                   bucketCols: Seq[String], sortCols: Seq[String] = Nil,
                   format: String = "parquet",
                   path: Option[String] = None): DataFrame = {
    require(bucketCols.nonEmpty, "bucketedCtas: at least one bucket column")
    require(buckets > 0, s"bucketedCtas: buckets must be positive, got $buckets")
    val spark = df.sparkSession
    // a location left by a PREVIOUS session is invisible to this
    // session's in-memory catalog — clear it, or CREATE refuses on the
    // stale directory (overwrite only covers catalog-known tables).
    // Only clear what LOOKS like a previous table write (_SUCCESS /
    // part- files): recursively deleting an arbitrary caller-supplied
    // path would destroy unrelated data beyond overwrite semantics.
    if (!spark.catalog.tableExists(table)) {
      // the CATALOG's own location resolution, not a string guess: the
      // guess missed default-db tables (stored FLAT at <wh>/<t>, not
      // <wh>/default.db/<t>) and unqualified names after USE <db> —
      // exactly the stale dirs this cleanup exists to clear
      val loc = path.getOrElse {
        val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
        spark.sessionState.catalog.defaultTablePath(ident).toString
      }
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        val entries = fs.listStatus(p).toSeq
        val looksLikeTable = entries.isEmpty || entries.exists { s =>
          val n = s.getPath.getName
          n == "_SUCCESS" || n.startsWith("part-") || n == "_temporary"
        }
        // automatic stale-dir cleanup applies ONLY to the session
        // warehouse's own default location (graft owns it): an EXPLICIT
        // caller path holding part- files is indistinguishable from an
        // unrelated team's parquet dataset — "looks like a table"
        // cannot authorize destroying it
        require(entries.isEmpty || (path.isEmpty && looksLikeTable),
          s"bucketedCtas: $loc exists and is not empty — refusing to " +
            "delete a caller-supplied location (only the warehouse's " +
            "own stale table dirs clear automatically); remove it " +
            "explicitly or point `path` elsewhere")
        fs.delete(p, true)
      }
    }
    val w0 = df.write.format(format).mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val w1 = path.fold(w0)(p => w0.option("path", p))
    (if (sortCols.nonEmpty) w1.sortBy(sortCols.head, sortCols.tail: _*) else w1)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Read a table previously written by [[ctas]]. */
  def read(spark: SparkSession, path: String, format: String = "parquet"): DataFrame =
    format match {
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true")
        .csv(path)
      case "json" => spark.read.json(path)
      case "delta" => DeltaLogReader.read(spark, path)
      case "iceberg" => IcebergTable.read(spark, path)
      case "paimon" => PaimonTable.read(spark, path)
      case f => spark.read.format(f).load(path)
    }

  /** Drill-style unnamed directory columns (dir0, dir1, ...) for data laid
    * out as base/<v0>/<v1>/file — the layout PartitionExplorer.java walks.
    * Spark only auto-derives key=value partitions, so derive dirN from the
    * file path; the values come from the directory names, never the rows. */
  def withDirColumns(df: DataFrame, basePath: String, levels: Int = 2): DataFrame = {
    // Anchor on the FULL base path (URI-encoded, since input_file_name()
    // returns an encoded URI): a leaf-name-only anchor broke BOTH ways —
    // greedy matched through a partition value equal to the base name,
    // non-greedy matched an ANCESTOR directory of the same name
    // (/data/logs/logs) and shifted every dirN by one.
    val encBase = new org.apache.hadoop.fs.Path(
        basePath.stripSuffix("/")).toUri.toString
      .replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
      .replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
    // strip any scheme from the runtime path the same way, then the base
    val rel = regexp_replace(
      regexp_replace(regexp_replace(input_file_name(),
        "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
        "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"),
      "^" + java.util.regex.Pattern.quote(encBase) + "/", "")
    val parts = split(rel, "/")
    (0 until levels).foldLeft(df) { (d, i) =>
      // a path segment is a dir level only if a deeper segment follows it
      d.withColumn(s"dir$i", when(size(parts) > i + 1, element_at(parts, i + 1)))
    }
  }
}
