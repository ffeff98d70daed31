package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
    withClient(root)(ensureDb(_, name))

  private def ensureDb(c: org.apache.hadoop.hive.metastore.IMetaStoreClient,
                       name: String): Unit =
    if (!c.getAllDatabases.asScala.contains(name)) {
      val db = new org.apache.hadoop.hive.metastore.api.Database()
      db.setName(name)
      c.createDatabase(db)
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
    * TEXTFILE parses LINE-SPLIT (spark.read.text + split on the
    * literal delimiter + try_element_at + null-format match +
    * try_cast), which IS LazySimpleSerDe's contract: quotes are
    * literal bytes, \N (serialization.null.format) is NULL while a
    * bare empty cell is the EMPTY string, short rows null-fill
    * trailing declared columns, extra cells drop — a CSV parse can
    * express none of the first three for unquoted fields.
    *
    * Partitioned tables PRUNE at plan time — the role of the
    * reference's HivePushPartitionFilterIntoScan (contrib/storage-hive/
    * core/src/main/java/org/apache/drill/exec/planner/sql/logical/
    * HivePushPartitionFilterIntoScan.java): the metastore partitions
    * are mirrored into Spark's OWN session catalog as a partitioned
    * external datasource table (`tracksPartitionsInCatalog`, one
    * catalog partition per metastore partition with its location and
    * authoritative values), and the returned frame is `spark.table` of
    * that mirror — so Catalyst's PruneFileSourcePartitions turns a
    * `WHERE dt = '...'` into a catalog `listPartitionsByFilter` and the
    * scan LISTS only matching partition directories. Plan size stays
    * O(1) in partition count (no per-partition union) and pruning works
    * at ANY partition count — asserted on executed-plan file counts in
    * HiveCatalogSpec at both small and >64-partition scale. The mirror
    * lives in the session catalog as `graft_hive_<db>_<table>`,
    * dropped and re-created on each read() so metastore changes are
    * picked up (metadata-only work, milliseconds at thousands of
    * partitions; concurrent readers of the SAME table in one session
    * should share the returned frame). A partition whose directory is
    * missing on disk reads as EMPTY — hive's own semantics (the
    * catalog is repaired with MSCK, not errored on) — spec-asserted
    * in HiveCatalogSpec's fault-injection tests alongside the
    * metastore-down and missing-object surfaces. */
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
    require(fmt == "parquet" || fmt == "orc" || fmt == "text",
      s"hive table $db.$table: unsupported storage format '$fmt' " +
        "(parquet/orc/textfile supported)")
    def parse(ty: String) = org.apache.spark.sql.catalyst.parser
      .CatalystSqlParser.parseDataType(ty)
    val dataSchema = org.apache.spark.sql.types.StructType(cols.map {
      case (n, ty) => org.apache.spark.sql.types.StructField(
        n, parse(ty), nullable = true)
    }.toArray)
    // hive's LazySimpleSerDe default separator is \u0001 (^A)
    val textDelim = Option(sd.getSerdeInfo)
      .flatMap(s => Option(s.getParameters.get("field.delim")))
      .filter(_.nonEmpty).getOrElse("\u0001")
    // LazySimpleSerDe semantics are NOT Spark-CSV semantics: no quote
    // concept (quotes are literal bytes), \N (serialization.null.format)
    // is NULL while a bare empty cell is the EMPTY STRING, short rows
    // null-fill, extra cells drop. A CSV parse cannot express the
    // empty-vs-null distinction for unquoted fields, so BOTH text read
    // sites parse line-split: spark.read.text -> split on the literal
    // delimiter -> try_element_at (null-fill) -> null-format match ->
    // try_cast (null-on-dirty, ANSI-proof).
    val textNull = Option(sd.getSerdeInfo)
      .flatMap(s => Option(s.getParameters.get("serialization.null.format")))
      .getOrElse("\\N")
    def parseTextLines(lines: DataFrame,
                       carry: Seq[String] = Nil): DataFrame = {
      import org.apache.spark.sql.functions.{split => fsplit, lit, when, try_element_at}
      val parts = fsplit(col("value"),
        java.util.regex.Pattern.quote(textDelim))
      lines.select(cols.zipWithIndex.map { case ((n, ty), i) =>
        val raw = try_element_at(parts, lit(i + 1))
        when(raw === textNull, lit(null)).otherwise(raw)
          .try_cast(ty).as(n)
      }.toSeq ++ carry.map(col): _*)
    }
    def readLocs(locs: Seq[String]): DataFrame = fmt match {
      case "parquet" => spark.read.schema(dataSchema).parquet(locs: _*)
      case "orc"     => spark.read.schema(dataSchema).orc(locs: _*)
      case _ => parseTextLines(spark.read.text(locs: _*))
    }
    if (partKeys.isEmpty) readLocs(Seq(sd.getLocation))
    else if (partVals.isEmpty) {
      // hive semantics: a partitioned table with zero partitions is
      // EMPTY (register-then-add workflows, or all partitions dropped)
      // — not an error
      val full = org.apache.spark.sql.types.StructType(
        cols.map { case (n, ty) =>
          org.apache.spark.sql.types.StructField(n, parse(ty),
            nullable = true) }.toArray ++
          partKeys.map { case (n, ty) =>
            org.apache.spark.sql.types.StructField(n, parse(ty),
              nullable = true) })
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    }
    else {
      import org.apache.spark.sql.catalyst.TableIdentifier
      import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTablePartition, CatalogTableType}
      // name sanitization alone can COLLIDE across distinct tables
      // (db "logs"/table "web_events" vs db "logs_web"/table "events",
      // or "my-db" vs "my_db") — and a collision means one table's
      // frame silently resolves the OTHER table's partitions at
      // execution (CatalogFileIndex lists by identifier, live). A short
      // digest of the exact (db, table) pair disambiguates.
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$db\u0000$table".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val shadow = (s"graft_hive_${db}_$table"
        .replaceAll("[^a-zA-Z0-9_]", "_")) + "_" + tag
      val ident = TableIdentifier(shadow)
      val catalog = spark.sessionState.catalog
      // TEXTFILE mirrors declare data columns as STRING and cast after
      // the scan — the same parse-then-cast shape as the unpartitioned
      // path, so a partitioned and an unpartitioned table over the same
      // bytes return the same values (a TYPED csv parse differs on
      // whitespace and dirty cells)
      val mirrorData =
        if (fmt == "text")
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.StringType, nullable = true)))
        else dataSchema
      val fullSchema = org.apache.spark.sql.types.StructType(
        mirrorData.fields ++ partKeys.map { case (n, ty) =>
          org.apache.spark.sql.types.StructField(n, parse(ty),
            nullable = true)
        })
      val (provider, opts) =
        if (fmt == "text") ("text", Map.empty[String, String])
        else (fmt, Map.empty[String, String])
      def locUri(s: String) = new org.apache.hadoop.fs.Path(s).toUri
      val storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(locUri(sd.getLocation)), properties = opts)
      catalog.dropTable(ident, ignoreIfNotExists = true, purge = false)
      catalog.createTable(CatalogTable(
        identifier = ident,
        tableType = CatalogTableType.EXTERNAL,
        storage = storage,
        schema = fullSchema,
        provider = Some(provider),
        partitionColumnNames = partKeys.map(_._1),
        tracksPartitionsInCatalog = true), ignoreIfExists = false)
      catalog.createPartitions(ident, partVals.map { case (loc, vals) =>
        CatalogTablePartition(
          spec = partKeys.map(_._1).zip(vals).toMap,
          storage = storage.copy(locationUri = Some(locUri(loc))))
      }, ignoreIfExists = false)
      val mirror = spark.table(shadow)
      if (fmt == "text")
        // the line parse sits ABOVE the scan; partition columns
        // (already typed) CARRY through, so partition predicates still
        // prune the catalog listing
        parseTextLines(mirror, partKeys.map(_._1))
      else mirror
    }
  }

  // -------------------------------------------------------------- write

  /** CTAS into the metastore: write `df` as parquet under the warehouse
    * and register the table (columns from the DataFrame schema via
    * Catalyst's catalogString — the hive type-string dialect). The
    * result is a real hive table any HMS client sees.
    *
    * With `partitionBy` set, the write lays out hive-style
    * `key=value` directories (Spark's partitioned writer — the same
    * escaping rules hive uses, null values as the hive default
    * partition name) and EACH written partition is registered via
    * `add_partition` with its values and location, so the read path's
    * catalog mirror prunes on partition predicates and any other HMS
    * client (hive, presto, spark-hive) sees a properly partitioned
    * table. The partition list comes from LISTING the written
    * directories (metadata-only, one level per key) — never from
    * re-executing `df`, which would pay a second source scan and could
    * diverge from the written layout on a nondeterministic frame. */
  def createTable(spark: SparkSession, root: String, db: String,
                  name: String, df: DataFrame,
                  partitionBy: Seq[String] = Nil): Unit = {
    val loc = new java.io.File(s"$root/warehouse/$db.db/$name").toURI.toString
    if (partitionBy.isEmpty) {
      df.write.mode("overwrite").parquet(loc)
      registerExternal(root, db, name,
        df.schema.fields.map(f => f.name -> f.dataType.catalogString).toSeq,
        loc, "parquet")
    } else {
      partitionBy.foreach(c => require(df.columns.contains(c),
        s"partition column '$c' not in DataFrame (${df.columns.mkString(",")})"))
      df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(loc)
      val dataCols = df.schema.fields
        .filterNot(f => partitionBy.contains(f.name))
        .map(f => f.name -> f.dataType.catalogString).toSeq
      val pKeys = partitionBy.map(c =>
        c -> df.schema(c).dataType.catalogString)
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      // partition tuples from the WRITTEN `key=value` directories, not
      // a second pass over `df`: re-executing the frame would scan the
      // source again and — for a nondeterministic frame (sampling, a
      // source that changed mid-call) — could register partitions that
      // disagree with what the writer actually laid out. The directory
      // walk is metadata-only (one listing level per partition key) and
      // by construction matches the data on disk.
      val locPath = new org.apache.hadoop.fs.Path(loc)
      val fs = locPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(dir: org.apache.hadoop.fs.Path, depth: Int,
               vals: List[String]): Seq[(Seq[String], String)] =
        if (depth == partitionBy.length) Seq((vals.reverse, dir.toString))
        else {
          // spark ESCAPES the key name in the path too (a column named
          // "a b" writes "a%20b=..."); matching the raw name registered
          // zero partitions for special-char columns
          val prefix =
            ExternalCatalogUtils.escapePathName(partitionBy(depth)) + "="
          fs.listStatus(dir).toSeq
            .filter(st => st.isDirectory &&
              st.getPath.getName.startsWith(prefix))
            .flatMap { st =>
              val raw = st.getPath.getName.substring(prefix.length)
              walk(st.getPath, depth + 1,
                ExternalCatalogUtils.unescapePathName(raw) :: vals)
            }
        }
      val parts = walk(locPath, 0, Nil)
      registerExternal(root, db, name, dataCols, loc, "parquet",
        pKeys, parts)
    }
  }

  /** Register an EXTERNAL table over existing files (no data movement) —
    * the hive pattern for cataloging data that already lives on the
    * filesystem. `partitionKeys` (name -> hive type) declares partition
    * columns; `partitions` supplies (values, location) per partition to
    * register via `add_partition` — values are positional against
    * `partitionKeys`, hive's layout. */
  def registerExternal(root: String, db: String, name: String,
                       columns: Seq[(String, String)], location: String,
                       format: String,
                       partitionKeys: Seq[(String, String)] = Nil,
                       partitions: Seq[(Seq[String], String)] = Nil): Unit = {
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
      ensureDb(c, db)
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
      t.setPartitionKeys(partitionKeys.map { case (n, ty) =>
        new FieldSchema(n, ty, "")
      }.asJava)
      t.setParameters(new java.util.HashMap[String, String]())
      t.getParameters.put("EXTERNAL", "TRUE")
      if (c.tableExists(db, name)) c.dropTable(db, name, false, true)
      c.createTable(t)
      partitions.foreach { case (vals, ploc) =>
        require(vals.length == partitionKeys.length,
          s"partition values $vals do not match keys " +
            partitionKeys.map(_._1).mkString(","))
        val p = new org.apache.hadoop.hive.metastore.api.Partition()
        p.setDbName(db)
        p.setTableName(name)
        p.setValues(vals.asJava)
        val psd = new StorageDescriptor(sd)
        psd.setLocation(ploc)
        p.setSd(psd)
        p.setParameters(new java.util.HashMap[String, String]())
        c.add_partition(p)
      }
    }
  }

  def dropTable(root: String, db: String, name: String): Unit =
    withClient(root)(_.dropTable(db, name, false, true))
}
