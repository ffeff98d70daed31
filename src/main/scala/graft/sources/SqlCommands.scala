package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Drill's session-management / maintenance SQL commands, claimed by
  * [[DfsParser]] before delegation — none of these are Spark grammar.
  *
  *  - `ALTER SESSION|SYSTEM SET `opt` = value` — ref
  *    exec/.../planner/sql/handlers/SetOptionHandler.java (Drill scopes
  *    SESSION vs SYSTEM in its OptionManager hierarchy; a single-session
  *    Spark app has one live scope, so both write the session conf and
  *    the scope is recorded in the summary).
  *  - `ALTER SESSION|SYSTEM RESET `opt`` / `RESET ALL` — ref
  *    ResetOptionHandler.java. RESET ALL restores every option that was
  *    set through this command surface (the tracked set — Spark's conf
  *    has no session/system split to diff against).
  *  - `ANALYZE TABLE t COMPUTE STATISTICS [(cols)] [SAMPLE n PERCENT]` —
  *    ref AnalyzeTableHandler.java. Writes the [[StatsCatalog]] stats
  *    file (ndv/nulls/min/max + equi-depth histograms per
  *    `graft.stats.histogram.buckets`) under `graft.stats.dir`.
  *  - `REFRESH TABLE METADATA `dir`` — ref RefreshMetadataHandler.java.
  *    Runs the [[ParquetMetadataCache]] distributed footer sweep.
  *  - `SHOW FILES IN|FROM <workspace or dir>` — ref
  *    ShowFilesHandler.java. The [[DfsSql.showFiles]] listing relation
  *    (name / is_directory / is_file / length / modification_time).
  *
  * Each command returns Drill's (ok, summary) single-row shape (ref
  * exec/.../physical/impl/DirectRowSet usage in the handlers).
  */
object SqlCommands {

  private val Opt = "`?([^`\\s=]+)`?" // option name, backticks optional
  private val AlterSet =
    s"""(?is)\\s*ALTER\\s+(SESSION|SYSTEM)\\s+SET\\s+$Opt\\s*=\\s*(.+?)\\s*;?\\s*""".r
  private val AlterResetAll =
    """(?is)\s*ALTER\s+(SESSION|SYSTEM)\s+RESET\s+ALL\s*;?\s*""".r
  private val AlterReset =
    s"""(?is)\\s*ALTER\\s+(SESSION|SYSTEM)\\s+RESET\\s+$Opt\\s*;?\\s*""".r
  private val Analyze =
    ("""(?is)\s*ANALYZE\s+TABLE\s+(.+?)\s+COMPUTE\s+STATISTICS""" +
      """(?:\s*\(\s*([^)]+?)\s*\))?(?:\s+SAMPLE\s+(\d+)\s+PERCENT)?\s*;?\s*""").r
  private val RefreshMeta =
    """(?is)\s*REFRESH\s+TABLE\s+METADATA\s+(.+?)\s*;?\s*""".r
  // Drill's `SHOW FILES [IN|FROM] <workspace or dir>` — ref
  // planner/sql/handlers/ShowFilesHandler.java
  private val ShowFilesIn =
    """(?is)\s*SHOW\s+FILES\s+(?:IN|FROM)\s+(.+?)\s*;?\s*""".r
  // Drill 1.21 alias DDL — ref planner/sql/handlers/CreateAliasHandler
  // .java (kind defaults to TABLE), DropAliasHandler.java,
  // DropAllAliasesHandler.java
  private val CreateAlias =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?(PUBLIC\s+)?ALIAS\s+`?(\w+)`?""" +
      """\s+FOR\s+(?:(TABLE|STORAGE)\s+)?(.+?)\s*;?\s*""").r
  private val DropAllAliases =
    """(?is)\s*DROP\s+ALL\s+(PUBLIC\s+)?ALIASES(?:\s+FOR\s+\(?\s*(TABLE|STORAGE)\s*\)?)?\s*;?\s*""".r
  private val DropAlias =
    """(?is)\s*DROP\s+(PUBLIC\s+)?ALIAS\s+`?(\w+)`?(?:\s+FOR\s+\(?\s*(TABLE|STORAGE)\s*\)?)?\s*;?\s*""".r

  // dfs DDL — only dfs-headed targets are claimed, so Spark's native
  // DDL keeps catalog tables. Refs: CreateTableHandler.java (CTAS with
  // PARTITION BY, format from Drill's `store.format` session option),
  // DropTableHandler.java, DescribeTableHandler.java.
  private val Ctas =
    ("""(?is)\s*CREATE\s+TABLE\s+(dfs\b.*?)\s+""" +
      """(?:PARTITION\s+BY\s*\(\s*([^)]+?)\s*\)\s+)?AS\s+(.+?)\s*;?\s*""").r
  // Drill 1.10's CTTAS (ref exec/.../planner/sql/handlers/
  // CreateTableHandler.java temporary branch, drill.exec.default_temporary_
  // workspace): session-scoped MATERIALIZED temp table — parquet under
  // the temp workspace, visible as a bare name, gone with the session.
  private val Cttas =
    """(?is)\s*CREATE\s+TEMPORARY\s+TABLE\s+`?(\w+)`?\s+AS\s+(.+?)\s*;?\s*""".r
  private val DropBare =
    """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?`?(\w+)`?\s*;?\s*""".r
  private val DropTable =
    """(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(dfs\b.+?)\s*;?\s*""".r
  // Drill's DESCRIBE SCHEMA (ref planner/sql/handlers/
  // DescribeSchemaHandler.java): one (schema, properties) row with the
  // workspace's configuration as JSON
  private val DescribeSchema =
    """(?is)\s*DESC(?:RIBE)?\s+SCHEMA\s+(dfs(?:\s*\.\s*\w+)?)\s*;?\s*""".r
  private val Describe =
    """(?is)\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?(dfs\b.+?)\s*;?\s*""".r

  // Drill's session schema context (ref exec/.../planner/sql/handlers/
  // UseSchemaHandler.java): `USE dfs.ws` makes bare backticked names
  // resolve in that workspace; SHOW SCHEMAS / SHOW TABLES enumerate the
  // Drill-visible namespace (dfs workspaces + sys + information_schema
  // + catalog databases).
  // Drill's EXPLAIN PLAN FOR (ref exec/.../planner/sql/handlers/
  // ExplainHandler.java): `EXPLAIN PLAN [INCLUDING ALL ATTRIBUTES]
  // [WITH|WITHOUT IMPLEMENTATION] FOR q` returns one (text, json) row.
  // WITHOUT IMPLEMENTATION = the optimized logical plan (Drill's
  // logical level); default/WITH = the physical plan; INCLUDING ALL
  // ATTRIBUTES = the formatted explain (codegen ids + per-node detail,
  // Drill's cost/attribute dump role). Spark's own `EXPLAIN [mode]`
  // grammar still works untouched — this claims only the PLAN FOR form.
  private val ExplainPlan =
    ("""(?is)\s*EXPLAIN\s+PLAN(\s+INCLUDING\s+ALL\s+ATTRIBUTES)?""" +
      """(\s+WITH\s+IMPLEMENTATION|\s+WITHOUT\s+IMPLEMENTATION)?""" +
      """\s+FOR\s+(.+?)\s*;?\s*""").r

  private val UseSql =
    """(?is)\s*USE\s+(dfs(?:\s*\.\s*\w+)?)\s*;?\s*""".r
  private val UseOther =
    """(?is)\s*USE\s+(?!dfs\b)([\w.`]+)\s*;?\s*""".r
  private val ShowSchemas =
    """(?is)\s*SHOW\s+SCHEMAS\s*;?\s*""".r
  private val ShowTablesIn =
    """(?is)\s*SHOW\s+TABLES\s+(?:IN|FROM)\s+((?:dfs|hive)\s*\.\s*\w+)\s*;?\s*""".r
  private val ShowTablesBare =
    """(?is)\s*SHOW\s+TABLES\s*;?\s*""".r

  // Drill's durable views live in the workspace directory as dot-files
  // (ref planner/sql/handlers/ViewHandler.java, dotdrill/View.java):
  // `CREATE VIEW dfs.<ws>.name AS q` persists through [[ViewCatalog]].
  private val CreateView =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+""" +
      """(dfs\s*\.\s*\w+)\s*\.\s*`?(\w+)`?\s+AS\s+(.+?)\s*;?\s*""").r
  private val DropView =
    """(?is)\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?(dfs\s*\.\s*\w+)\s*\.\s*`?(\w+)`?\s*;?\s*""".r

  /** Keys set via ALTER ... SET, with their pre-command value (None =
    * was unset) — what RESET ALL restores. */
  private val touched =
    new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  /** CTTAS name -> backing directory; dirs die with the JVM (Drill
    * drops temporary tables when the session ends). */
  private val cttasDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  sys.addShutdownHook {
    cttasDirs.values.forEach { d =>
      try {
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          .delete(p, true)
      } catch { case _: Throwable => () }
    }
  }

  /** True if `sqlText` is one of this object's commands (or a DmlSql
    * verb) — a pure regex check with NO side effects, used by EXPLAIN
    * to refuse statements that would EXECUTE when touched. */
  def isGraftCommand(sqlText: String): Boolean = (sqlText match {
    case AlterSet(_, _, _) | AlterResetAll(_) | AlterReset(_, _) |
         CreateAlias(_, _, _, _, _) |
         DropAllAliases(_, _) | DropAlias(_, _, _) | RefreshMeta(_) |
         ShowFilesIn(_) | Cttas(_, _) | ExplainPlan(_, _, _) => true
    // USE mutates the session schema as a claim-time side effect (the
    // UseOther case is unguarded in claim) — explaining it would
    // execute that mutation through the inner parsePlan
    case UseOther(_) => true
    // the guards MUST mirror claim()'s, or EXPLAIN PLAN FOR refuses
    // statements claim() would delegate to Spark (e.g. ANALYZE on a
    // catalog table, SHOW TABLES with no default workspace)
    case ShowTablesIn(schema) => dfsClaimable &&
      (!schema.trim.toLowerCase.startsWith("hive") ||
        SparkSession.active.conf
          .getOption(HiveMetastore.ConfKey).isDefined)
    case UseSql(_) | ShowSchemas() | CreateView(_, _, _, _) |
         DropView(_, _, _) | Ctas(_, _, _) | DropTable(_, _) |
         DescribeSchema(_) | Describe(_) => dfsClaimable
    case ShowTablesBare() => dfsClaimable && SparkSession.active.conf
      .getOption("graft.dfs.defaultWorkspace").isDefined
    case Analyze(target, _, _) => dfsClaimable &&
      target.trim.toLowerCase.matches("^`?dfs`?\\s*[.].*")
    case DropBare(name) => cttasDirs.containsKey(name.toLowerCase)
    case _ => false
  }) || DmlSql.wouldClaim(sqlText) ||
    // DfsParser's own pre-delegation claims (dynamic UDF jars)
    sqlText.matches("(?is)\\s*(CREATE|DROP)\\s+FUNCTION\\s+USING\\s+JAR\\s+'[^']+'\\s*;?\\s*")

  /** Claim `sqlText` if it is one of the commands above; None delegates.
    * `parseIdent` is the delegate parser's multipart-identifier reader
    * (handles backticked parts — dfs.`/a/b.parquet`). */
  def claim(sqlText: String,
            parseIdent: String => Seq[String]): Option[LogicalPlan] =
    sqlText match {
      case AlterSet(scope, key, rawValue) =>
        val spark = SparkSession.active
        val value = unquote(rawValue)
        // record AFTER the set succeeds: a static-conf failure used to
        // leave a poisoned `touched` entry that made every later
        // RESET ALL throw mid-iteration forever
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, value)
        touched.putIfAbsent(key, prev)
        Some(result(ok = true,
          s"${scope.toLowerCase} option $key = $value"))
      case AlterResetAll(scope) =>
        val spark = SparkSession.active
        val n = touched.size
        touched.forEach { (k, prev) =>
          // keep draining even if one key turned unsettable since
          try prev.fold(spark.conf.unset(k))(v => spark.conf.set(k, v))
          catch { case _: Exception => () }
        }
        touched.clear()
        Some(result(ok = true, s"${scope.toLowerCase}: $n options reset"))
      case AlterReset(scope, key) =>
        val spark = SparkSession.active
        touched.remove(key) match {
          case null =>
            // never set through ALTER SESSION here: RESET is a NO-OP —
            // unsetting would silently drop the deployment's
            // spark-submit/defaults baseline to Spark's factory default
            // (Drill's RESET restores the SYSTEM scope, not factory)
            Some(result(ok = true,
              s"${scope.toLowerCase} option $key was not set in this " +
                "session — nothing to reset"))
          case Some(prev) =>
            spark.conf.set(key, prev)
            Some(result(ok = true, s"${scope.toLowerCase} option $key reset"))
          case None =>
            spark.conf.unset(key)
            Some(result(ok = true, s"${scope.toLowerCase} option $key reset"))
        }
      case ExplainPlan(allAttrs, impl, query) =>
        val spark = SparkSession.active
        import spark.implicits._
        // NEVER execute what we explain. Graft-claimed commands run
        // inside claim()/parsePlan itself, so even touching the parser
        // with one would execute it — refuse them up front. Spark-native
        // commands (CREATE TABLE, INSERT, ...) parse to lazy Command
        // nodes, and Dataset creation is what executes them — so plan
        // through sessionState.executePlan and read the plan phases
        // WITHOUT constructing a Dataset over the command.
        require(!isGraftCommand(query),
          s"EXPLAIN PLAN FOR: [${query.trim.take(60)}...] is a command — " +
            "commands execute immediately and have no separate plan")
        // WITH/WITHOUT may be separated by any whitespace (the regex
        // allows it); key off the distinguishing word only
        val withImpl = impl == null ||
          !impl.trim.toUpperCase.startsWith("WITHOUT")
        val parsed = spark.sessionState.sqlParser.parsePlan(query)
        val qe = spark.sessionState.executePlan(parsed)
        val isCommand = qe.analyzed.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.Command]
        val text =
          if (isCommand) qe.analyzed.toString // command: logical only, no run
          else if (allAttrs != null && withImpl)
            qe.explainString(org.apache.spark.sql.execution.FormattedMode)
          else if (withImpl) qe.executedPlan.toString
          else qe.optimizedPlan.toString
        val json =
          if (isCommand) qe.analyzed.toJSON
          else if (withImpl) qe.executedPlan.toJSON
          else qe.optimizedPlan.toJSON
        Some(Seq((text, json)).toDF("text", "json").queryExecution.analyzed)
      case UseSql(target) if dfsClaimable =>
        val spark = SparkSession.active
        val ws = target.split('.').map(_.trim).toSeq match {
          case Seq(_)     => "root"
          case Seq(_, w)  => w
        }
        require(DfsSql.workspaceDir(spark, ws).isDefined,
          s"dfs: unknown workspace '$ws' — set graft.dfs.workspace.$ws")
        spark.conf.set("graft.dfs.defaultWorkspace", ws)
        Some(result(ok = true, s"Default schema changed to [dfs.$ws]"))
      case UseOther(target) =>
        // Drill's USE REPLACES the session schema: switching to a
        // catalog database must drop the sticky dfs workspace, or bare
        // SHOW TABLES / bare-name resolution stays hijacked to the old
        // workspace indefinitely. The USE itself delegates to Spark —
        // but a FAILING `USE nosuchdb` must leave the session schema
        // unchanged (Drill semantics), so only unset once the target
        // database is known to exist.
        val spark = SparkSession.active
        val db = target.split('.').last.trim.stripPrefix("`").stripSuffix("`")
        val exists =
          try spark.catalog.databaseExists(db) ||
            spark.catalog.databaseExists(target.trim)
          catch { case _: Exception => false }
        if (exists) spark.conf.unset("graft.dfs.defaultWorkspace")
        None
      case ShowSchemas() if dfsClaimable =>
        val spark = SparkSession.active
        import spark.implicits._
        val wsNames = DfsSql.workspaces(spark).map(_._1) // canonical registry
        val dbs = spark.catalog.listDatabases().collect().map(_.name).toSeq
        // federated hive metastore databases (graft.hive.metastore set).
        // A LISTING must not bootstrap a metastore on disk (withClient
        // creates root/metastore_db with create=true), so only an
        // already-initialized root lists; real metastore errors
        // propagate instead of silently hiding a misconfigured path.
        val hiveDbs = spark.conf.getOption(HiveMetastore.ConfKey).toSeq
          .filter(root => new java.io.File(root, "metastore_db").exists())
          .flatMap(root => HiveMetastore.databases(root).map(d => s"hive.$d"))
        Some((wsNames.sorted.distinct.map(w => s"dfs.$w") ++
          Seq("information_schema", "sys") ++ hiveDbs.sorted ++ dbs)
          .toDF("SCHEMA_NAME")
          .queryExecution.analyzed)
      case ShowTablesIn(schema) if dfsClaimable =>
        val name = schema.split('.')(1).trim
        if (schema.trim.toLowerCase.startsWith("hive")) {
          val spark = SparkSession.active
          spark.conf.getOption(HiveMetastore.ConfKey).map { root =>
            import spark.implicits._
            HiveMetastore.tables(root, name).sorted
              .map(t => (s"hive.$name", t))
              .toDF("TABLE_SCHEMA", "TABLE_NAME").queryExecution.analyzed
          } // no metastore conf: fall through to Spark's own error
        } else Some(showTables(name))
      case ShowTablesBare() if dfsClaimable &&
          SparkSession.active.conf
            .getOption("graft.dfs.defaultWorkspace").isDefined =>
        Some(showTables(SparkSession.active.conf
          .get("graft.dfs.defaultWorkspace")))
      case Analyze(target, colList, samplePct)
          // dfs-headed targets only: claiming a catalog table would
          // silently shadow Spark's native ANALYZE (catalog statistics
          // for CBO would never be computed)
          if dfsClaimable &&
            parseIdent(target).headOption.exists(_.equalsIgnoreCase("dfs")) =>
        Some(analyze(target, Option(colList), Option(samplePct), parseIdent))
      case CreateAlias(replace, pub, alias, kind, target) =>
        val spark = SparkSession.active
        val storage = kind != null && kind.equalsIgnoreCase("STORAGE")
        val kindName = if (storage) "Storage" else "Table"
        val created = AliasRegistry.create(spark, alias, target.trim,
          storage, isPublic = pub != null, replace = replace != null)
        if (!created) throw new IllegalArgumentException(
          s"Alias with given name [$alias] already exists")
        Some(result(ok = true,
          s"$kindName alias '$alias' for '${target.trim}' created successfully"))
      case DropAllAliases(pub, kind) =>
        val spark = SparkSession.active
        val storage = Option(kind).map(_.equalsIgnoreCase("STORAGE"))
        val n = AliasRegistry.dropAll(spark, storage, isPublic = pub != null)
        Some(result(ok = true, s"$n aliases dropped successfully"))
      case DropAlias(pub, alias, kind) =>
        val spark = SparkSession.active
        val storage = kind != null && kind.equalsIgnoreCase("STORAGE")
        val dropped = AliasRegistry.drop(spark, alias, storage,
          isPublic = pub != null)
        if (!dropped) throw new IllegalArgumentException(
          s"No alias found with given name [$alias]")
        Some(result(ok = true, s"Alias '$alias' dropped successfully"))
      case RefreshMeta(target) =>
        val spark = SparkSession.active
        val dir = targetPath(spark, target, parseIdent)
        val n = ParquetMetadataCache.refresh(spark, dir)
        Some(result(ok = true, s"$n footers read, metadata cached at $dir"))
      case ShowFilesIn(target) =>
        val spark = SparkSession.active
        val dir = targetPath(spark, target, parseIdent)
        Some(DfsSql.showFiles(spark, dir).queryExecution.analyzed)
      case CreateView(replace, schema, name, query) if dfsClaimable =>
        val spark = SparkSession.active
        val ws = parseIdent(schema.replaceAll("\\s", "")).last
        val base = DfsSql.workspaceDir(spark, ws).getOrElse(
          throw new IllegalArgumentException(
            s"dfs: unknown workspace '$ws' — set graft.dfs.workspace.$ws"))
        ViewCatalog.create(spark, base, name, query, replace = replace != null)
        Some(result(ok = true,
          s"View '$name' ${if (replace != null) "replaced" else "created"} " +
            s"successfully in '$base'"))
      case DropView(ifExists, schema, name) if dfsClaimable =>
        val spark = SparkSession.active
        val ws = parseIdent(schema.replaceAll("\\s", "")).last
        val base = DfsSql.workspaceDir(spark, ws).getOrElse(
          throw new IllegalArgumentException(s"dfs: unknown workspace '$ws'"))
        val existed = ViewCatalog.drop(spark, base, name)
        if (!existed && ifExists == null) throw new IllegalArgumentException(
          s"Unknown view [$name] in schema [$base]")
        Some(result(ok = true,
          if (existed) s"View [$name] deleted successfully from schema [$base]"
          else s"View [$name] not found in schema [$base]"))
      case Cttas(name, query) =>
        val spark = SparkSession.active
        require(!spark.catalog.tableExists(name),
          s"A table or view with given name [$name] already exists")
        val dir = s"${System.getProperty("java.io.tmpdir", "/tmp")}" +
          s"/graft_cttas/${spark.sparkContext.applicationId}/$name"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
        spark.sql(query).write.parquet(dir)
        spark.read.parquet(dir).createTempView(name)
        // keys lowercased: Spark resolves temp views case-insensitively,
        // so a differently-cased DROP must still claim (else the backing
        // dir and registry entry leaked for the JVM lifetime)
        cttasDirs.put(name.toLowerCase, dir)
        Some(result(ok = true,
          s"Temporary table [$name] created (session-scoped, $dir)"))
      // claimed ONLY for names this session's CTTAS created — every
      // other DROP TABLE stays with Spark's grammar
      case DropBare(name) if cttasDirs.containsKey(name.toLowerCase) =>
        val spark = SparkSession.active
        spark.catalog.dropTempView(name)
        val dir = cttasDirs.remove(name.toLowerCase)
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
        Some(result(ok = true, s"Temporary table [$name] dropped"))
      case Ctas(target, partCols, query) if dfsClaimable =>
        val spark = SparkSession.active
        val path = targetPath(spark, target, parseIdent)
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (f.exists(p)) throw new IllegalArgumentException(
          s"A table or view with given name [$path] already exists")
        val fmt = spark.conf.get("store.format", "parquet")
        val parts = Option(partCols).map(_.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))).getOrElse(Nil)
        // row count observed DURING the single write — counting the
        // read-back table re-scanned the entire new table
        val obs = new org.apache.spark.sql.Observation()
        Writer.ctas(spark.sql(query).observe(obs,
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n")), path, fmt, parts)
        val n = obs.get("n")
        Some(result(ok = true,
          s"$n records written to $path ($fmt)"))
      case DropTable(ifExists, target) if dfsClaimable =>
        val spark = SparkSession.active
        val path = targetPath(spark, target, parseIdent)
        val p = new org.apache.hadoop.fs.Path(path)
        val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!f.exists(p)) {
          if (ifExists != null)
            Some(result(ok = true, s"Table [$path] not found"))
          else throw new IllegalArgumentException(
            s"Table [$path] not found")
        } else {
          f.delete(p, true)
          Some(result(ok = true, s"Table [$path] dropped"))
        }
      case DescribeSchema(target) if dfsClaimable =>
        val spark = SparkSession.active
        import spark.implicits._
        val ws = target.split('.').map(_.trim).toSeq match {
          case Seq(_)    => "root"
          case Seq(_, w) => w
        }
        val dir = DfsSql.workspaceDir(spark, ws).getOrElse(
          throw new IllegalArgumentException(
            s"dfs: unknown workspace '$ws' — set graft.dfs.workspace.$ws"))
        val props = s"""{"type":"file","location":"$dir","writable":true,""" +
          s""""defaultInputFormat":null,"allowAccessOutsideWorkspace":false}"""
        Some(Seq((s"dfs.$ws", props)).toDF("schema", "properties")
          .queryExecution.analyzed)
      case Describe(target) if dfsClaimable =>
        val spark = SparkSession.active
        import spark.implicits._
        val parts = parseIdent(target.trim)
        val df = DfsSql.load(spark, parts.tail)
        Some(df.schema.fields.toSeq
          .map(fld => (fld.name, fld.dataType.sql,
            if (fld.nullable) "YES" else "NO"))
          .toDF("COLUMN_NAME", "DATA_TYPE", "IS_NULLABLE")
          .queryExecution.analyzed)
      case _ => None
    }

  /** dfs DDL engages only when no real `dfs` database owns the name
    * (same graceful degrade as the relation namespace). */
  private def dfsClaimable: Boolean =
    !SparkSession.active.catalog.databaseExists("dfs")

  /** Drill's SHOW TABLES shape (TABLE_SCHEMA, TABLE_NAME) over a dfs
    * workspace: every visible file/directory is a table. */
  private def showTables(ws: String): LogicalPlan = {
    val spark = SparkSession.active
    import spark.implicits._
    val base = DfsSql.workspaceDir(spark, ws).getOrElse(
      throw new IllegalArgumentException(
        s"dfs: unknown workspace '$ws' — set graft.dfs.workspace.$ws"))
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names =
      if (!fs.exists(p)) Seq.empty[String]
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
        // a persisted view's backing file lists under its VIEW name
        // (Drill lists `v`, not `v.view.json`)
        .map(n => n.stripSuffix(".view.json"))
        .distinct
        .sorted
    names.map(n => (s"dfs.$ws", n)).toDF("TABLE_SCHEMA", "TABLE_NAME")
      .queryExecution.analyzed
  }

  private def analyze(target: String, colList: Option[String],
                      samplePct: Option[String],
                      parseIdent: String => Seq[String]): LogicalPlan = {
    val spark = SparkSession.active
    val parts = parseIdent(target)
    // claim() only routes dfs-headed targets here (catalog tables keep
    // Spark's native ANALYZE) — re-testing that guard hid an unreachable
    // catalog branch; the one degenerate form it let through (a bare
    // `dfs` with no table part) now errors clearly instead
    require(parts.length >= 2 && parts.head.equalsIgnoreCase("dfs"),
      s"ANALYZE: expected dfs.<workspace>.<table>, got '$target'")
    val df0 = DfsSql.load(spark, parts.tail)
    // display name: path basename minus the format extension. The FILE
    // key appends a short hash of the full resolved path — same-named
    // tables in different workspaces must not overwrite each other's
    // stats (the optimizer would apply ws2's histograms to ws1's table)
    val resolved = DfsSql.resolvePath(spark, parts.tail)
    val name = new org.apache.hadoop.fs.Path(resolved)
      .getName.split('.').head
    val crc = new java.util.zip.CRC32()
    crc.update(resolved.getBytes("UTF-8"))
    val fileKey = f"${name}_${crc.getValue}%08x"
    val selected = colList.fold(df0) { cl =>
      val cols = cl.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
      df0.select(cols.head, cols.tail.toIndexedSeq: _*)
    }
    // Bernoulli sample, fixed seed: reproducible like Drill's
    // deterministic sample clause intent (AnalyzeTableHandler SAMPLE n
    // PERCENT plans a SampleRel over the scan)
    val sampled = samplePct.map(_.toInt).filter(_ < 100)
      .fold(selected)(p => selected.sample(p / 100.0, seed = 42L))
    val stats = StatsCatalog.analyze(spark, statsDir(spark), name, sampled,
      histogramBuckets =
        spark.conf.get("graft.stats.histogram.buckets", "10").toInt,
      fileKey = fileKey)
    result(ok = true,
      s"$name: ${stats.rowCount} rows, ${stats.columns.size} columns analyzed")
  }

  /** Where ANALYZE persists stats files: `graft.stats.dir`, defaulting
    * to `<warehouse>/_graft_stats` (Drill: the table workspace's
    * `.stats.drill` directory). */
  def statsDir(spark: SparkSession): String =
    spark.conf.getOption("graft.stats.dir").getOrElse(
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        "/_graft_stats")

  private def targetPath(spark: SparkSession, target: String,
                         parseIdent: String => Seq[String]): String = {
    val t = target.trim
    if (t.startsWith("'") && t.endsWith("'")) t.substring(1, t.length - 1)
    else {
      val parts = parseIdent(t)
      if (parts.length >= 2 && parts.head.equalsIgnoreCase("dfs"))
        DfsSql.resolvePath(spark, parts.tail)
      else parts.mkString("/")
    }
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2))
      t.substring(1, t.length - 1)
    else t
  }

  private def result(ok: Boolean, summary: String): LogicalPlan = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((ok, summary)).toDF("ok", "summary").queryExecution.analyzed
  }
}
