package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, element_at, regexp_replace}

/** Hive-metastore catalog federation — Drill's most-used service-backed
  * storage plugin (reference contrib/storage-hive/core/src/main/java/
  * org/apache/drill/exec/store/hive/HiveStoragePlugin.java:60),
  * re-expressed the way Drill itself works: the METASTORE supplies
  * catalog metadata (databases, tables, columns, storage descriptors)
  * and the engine scans the underlying FILES with its own readers —
  * Drill never routes data through Hive execution, and neither does
  * this (data goes through Spark's distributed parquet/orc/csv scans,
  * so pushdown, pruning, and AQE all apply).
  *
  * Zero-egress posture: the metastore is EMBEDDED — a Derby-backed HMS
  * in-process via the shipped hive-metastore/datanucleus/derby jars
  * (exactly the stack `spark-hive` uses for its derby-backed catalog).
  * A remote HMS (`thrift://...`) would use the same client API but
  * cannot be exercised in this container; the `root` parameter is the
  * local metastore directory (derby database + default warehouse).
  *
  * SQL surface: with `graft.hive.metastore` set on the session, the
  * `hive` namespace resolves — `SELECT * FROM hive.db.tbl` (or
  * `hive.tbl` in `default`) — via the [[DfsParser]] parse-time rewrite
  * (the "hive" head must be claimed before Spark's ResolveSQLOnFile
  * treats it as a datasource provider), so hive tables join
  * dfs/parquet/JDBC relations in one query like every other federated
  * source. `SHOW SCHEMAS` lists `hive.<db>` entries.
  */
object HiveMetastore {

  /** Session conf naming the embedded metastore root directory. */
  val ConfKey = "graft.hive.metastore"

  private def hiveConf(root: String): org.apache.hadoop.hive.conf.HiveConf = {
    val c = new org.apache.hadoop.hive.conf.HiveConf()
    // embedded mode: empty uris => in-process HMSHandler over local derby
    c.set("hive.metastore.uris", "")
    c.set("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$root/metastore_db;create=true")
    c.set("javax.jdo.option.ConnectionDriverName",
      "org.apache.derby.jdbc.EmbeddedDriver")
    c.set("hive.metastore.warehouse.dir",
      new java.io.File(s"$root/warehouse").toURI.toString)
    // first-boot schema creation without the schematool ceremony; DBCP
    // pooling because the hive 2.3 default (BoneCP) is not on the image
    c.set("hive.metastore.schema.verification", "false")
    c.set("datanucleus.schema.autoCreateAll", "true")
    c.set("datanucleus.autoCreateSchema", "true")
    c.set("datanucleus.fixedDatastore", "false")
    c.set("datanucleus.connectionPoolingType", "DBCP")
    c.set("hive.metastore.try.direct.sql", "false")
    c
  }

  /** Run `f` with a metastore client against the embedded HMS at `root`
    * (created on first use). Clients are cheap per-call wrappers over the
    * in-process handler; metadata volumes are KB-scale. */
  def withClient[A](root: String)(
      f: org.apache.hadoop.hive.metastore.IMetaStoreClient => A): A = {
    new java.io.File(root).mkdirs()
    val client = new org.apache.hadoop.hive.metastore.HiveMetaStoreClient(
      hiveConf(root))
    try f(client) finally client.close()
  }

  // ------------------------------------------------------------ catalog

  /** Databases in the metastore (always includes `default`). */
  def databases(root: String): Seq[String] =
    withClient(root)(_.getAllDatabases.asScala.toSeq)

  def createDatabase(root: String, name: String): Unit =
    withClient(root) { c =>
      if (!c.getAllDatabases.asScala.contains(name)) {
        val db = new org.apache.hadoop.hive.metastore.api.Database()
        db.setName(name)
        c.createDatabase(db)
      }
    }

  /** Table names in one database. */
  def tables(root: String, db: String): Seq[String] =
    withClient(root)(_.getAllTables(db).asScala.toSeq)

  /** INFORMATION_SCHEMA-shaped listing of every table with its location
    * and format — what Drill's ischema shows for hive schemas. */
  def tablesDf(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rows = withClient(root) { c =>
      c.getAllDatabases.asScala.toSeq.flatMap { db =>
        c.getAllTables(db).asScala.toSeq.map { t =>
          val tbl = c.getTable(db, t)
          (db, t, tbl.getTableType,
            Option(tbl.getSd.getLocation).getOrElse(""),
            formatOf(tbl.getSd.getInputFormat))
        }
      }
    }
    rows.toDF("table_schema", "table_name", "table_type", "location", "format")
  }

  private def formatOf(inputFormat: String): String = {
    val f = Option(inputFormat).getOrElse("").toLowerCase
    if (f.contains("parquet")) "parquet"
    else if (f.contains("orc")) "orc"
    else if (f.contains("text")) "text"
    else f
  }

  // --------------------------------------------------------------- read

  /** Read one hive table as a DataFrame: metastore supplies location,
    * format, and declared schema; Spark's distributed scan reads the
    * files. Parquet/ORC scan with the DECLARED schema requested
    * explicitly: no footer inference (zero driver-side jobs at
    * resolution time), declared types win, columns missing from older
    * files NULL-fill and extra file columns drop, which IS hive's
    * schema-on-read contract. TEXTFILE reads with the serde's field
    * delimiter (hive's default \u0001 when unset).
    *
    * Partitioned tables: ONE scan over every partition location (not a
    * union of per-partition scans, so plan size and resolve cost stay
    * O(1) in partition count) with the partition columns attached by a
    * broadcast (directory -> values) join on each row's file path;
    * the metastore values are authoritative, exactly Drill's HiveScan
    * expansion. */
  def read(spark: SparkSession, root: String, db: String,
           table: String): DataFrame = {
    val (sd, partKeys, partVals, cols) = withClient(root) { c =>
      val t = c.getTable(db, table)
      val parts =
        if (t.getPartitionKeysSize > 0)
          // max_parts -1 = ALL partitions (a positive cap silently
          // truncates the table beyond 32767 partitions)
          c.listPartitions(db, table, (-1).toShort).asScala.toSeq
            .map(p => (p.getSd.getLocation, p.getValues.asScala.toSeq))
        else Nil
      (t.getSd, t.getPartitionKeys.asScala.toSeq.map(f => f.getName -> f.getType),
        parts, t.getSd.getCols.asScala.toSeq.map(f => f.getName -> f.getType))
    }
    val fmt = formatOf(sd.getInputFormat)
    val dataSchema = org.apache.spark.sql.types.StructType(cols.map {
      case (n, ty) => org.apache.spark.sql.types.StructField(
        n, org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(ty), nullable = true)
    }.toArray)
    def readLocs(locs: Seq[String]): DataFrame = fmt match {
      case "parquet" => spark.read.schema(dataSchema).parquet(locs: _*)
      case "orc"     => spark.read.schema(dataSchema).orc(locs: _*)
      case "text" =>
        // hive's LazySimpleSerDe default separator is \u0001 (^A)
        val delim = Option(sd.getSerdeInfo)
          .flatMap(s => Option(s.getParameters.get("field.delim")))
          .filter(_.nonEmpty).getOrElse("\u0001")
        val raw = spark.read.option("sep", delim).option("header", "false")
          .csv(locs: _*)
        raw.select(raw.columns.zip(cols).map { case (c0, (n, ty)) =>
          col(c0).cast(ty).as(n)
        }.toSeq: _*)
      case other =>
        throw new IllegalArgumentException(
          s"hive table $db.$table: unsupported storage format '$other' " +
            "(parquet/orc/textfile supported)")
    }
    if (partKeys.isEmpty) readLocs(Seq(sd.getLocation))
    else {
      require(partVals.nonEmpty,
        s"hive table $db.$table is partitioned but has no partitions")
      import spark.implicits._
      // normalize scheme differences ("file:///x" vs "/x") on both sides
      def norm(s: String) = s.replaceFirst("^[a-zA-Z0-9]+:/+", "/")
        .stripSuffix("/")
      val lookup = broadcast(partVals.map { case (loc, vals) =>
        (norm(loc), vals)
      }.toDF("__g_dir", "__g_vals"))
      val scanned = readLocs(partVals.map(_._1))
        .withColumn("__g_dir", regexp_replace(regexp_replace(
          col("_metadata.file_path"), "/[^/]*$", ""),
          "^[a-zA-Z0-9]+:/+", "/"))
      scanned.join(lookup, Seq("__g_dir"))
        .select((cols.map { case (n, _) => col(n) } ++
          partKeys.zipWithIndex.map { case ((n, ty), i) =>
            element_at(col("__g_vals"), i + 1).cast(ty).as(n)
          }).toSeq: _*)
    }
  }

  // -------------------------------------------------------------- write

  /** CTAS into the metastore: write `df` as parquet under the warehouse
    * and register the table (columns from the DataFrame schema via
    * Catalyst's catalogString — the hive type-string dialect). The
    * result is a real hive table any HMS client sees. */
  def createTable(spark: SparkSession, root: String, db: String,
                  name: String, df: DataFrame): Unit = {
    val loc = new java.io.File(s"$root/warehouse/$db.db/$name").toURI.toString
    df.write.mode("overwrite").parquet(loc)
    registerExternal(root, db, name,
      df.schema.fields.map(f => f.name -> f.dataType.catalogString).toSeq,
      loc, "parquet")
  }

  /** Register an EXTERNAL table over existing files (no data movement) —
    * the hive pattern for cataloging data that already lives on the
    * filesystem. */
  def registerExternal(root: String, db: String, name: String,
                       columns: Seq[(String, String)], location: String,
                       format: String): Unit = {
    import org.apache.hadoop.hive.metastore.api.{FieldSchema, SerDeInfo, StorageDescriptor, Table}
    val (inF, outF, serde) = format match {
      case "parquet" => (
        "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
        "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat",
        "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe")
      case "orc" => (
        "org.apache.hadoop.hive.ql.io.orc.OrcInputFormat",
        "org.apache.hadoop.hive.ql.io.orc.OrcOutputFormat",
        "org.apache.hadoop.hive.ql.io.orc.OrcSerde")
      case "text" => (
        "org.apache.hadoop.mapred.TextInputFormat",
        "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
        "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
      case other =>
        throw new IllegalArgumentException(s"unsupported format '$other'")
    }
    withClient(root) { c =>
      if (!c.getAllDatabases.asScala.contains(db)) {
        val d = new org.apache.hadoop.hive.metastore.api.Database()
        d.setName(db)
        c.createDatabase(d)
      }
      val sd = new StorageDescriptor()
      sd.setCols(columns.map { case (n, ty) => new FieldSchema(n, ty, "") }
        .asJava)
      sd.setLocation(location)
      sd.setInputFormat(inF)
      sd.setOutputFormat(outF)
      val si = new SerDeInfo()
      si.setSerializationLib(serde)
      si.setParameters(new java.util.HashMap[String, String]())
      sd.setSerdeInfo(si)
      sd.setParameters(new java.util.HashMap[String, String]())
      val t = new Table()
      t.setDbName(db)
      t.setTableName(name)
      t.setTableType("EXTERNAL_TABLE")
      t.setSd(sd)
      t.setPartitionKeys(java.util.Collections.emptyList[FieldSchema]())
      t.setParameters(new java.util.HashMap[String, String]())
      t.getParameters.put("EXTERNAL", "TRUE")
      if (c.tableExists(db, name)) c.dropTable(db, name, false, true)
      c.createTable(t)
    }
  }

  def dropTable(root: String, db: String, name: String): Unit =
    withClient(root)(_.dropTable(db, name, false, true))
}
