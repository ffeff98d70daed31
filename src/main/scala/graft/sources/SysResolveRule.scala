package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer rule making the `sys` and `INFORMATION_SCHEMA` namespaces
  * SQL-queryable (`SELECT * FROM sys.version`, `... FROM
  * information_schema.\`tables\``) — Drill's system-table storage plugin
  * surface (reference exec/.../store/sys/SystemTablePlugin.java and
  * store/ischema/InfoSchemaStoragePlugin.java), where BI tools connected
  * over JDBC introspect the engine by querying exactly these names.
  *
  * The backing DataFrames already exist ([[SysTables]], [[GraftCatalog]],
  * [[QueryProfiles]]); this rule only routes the SQL names to them, the
  * same mechanism as [[DfsResolveRule]]: substitute the ANALYZED plan so
  * downstream optimization sees an ordinary relation. A real catalog
  * database named `sys`/`information_schema` wins outright (same guard as
  * dfs) — including its error paths. Unknown table names under a claimed
  * head fall through to Spark's TABLE_OR_VIEW_NOT_FOUND rather than a
  * custom error, so typos read idiomatically.
  *
  * Scale posture: every backing frame is metadata-scale (session
  * registry, JVM introspection, profile ring) — localRelation-sized, no
  * distributed work.
  */
case class SysResolveRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def sysTable(name: String): Option[DataFrame] = name match {
    case "options"           => Some(SysTables.options(spark))
    case "version"           => Some(SysTables.version(spark))
    case "bits" | "drillbits" => Some(SysTables.bits(spark))
    case "functions"         => Some(SysTables.functions(spark))
    case "memory"            => Some(SysTables.memory(spark))
    case "threads"           => Some(SysTables.threads(spark))
    case "table_aliases"     => Some(SysTables.tableAliases(spark))
    case "storage_aliases"   => Some(SysTables.storageAliases(spark))
    case "profiles"          => Some(QueryProfiles.profiles(spark))
    case "profile_stages"    => Some(QueryProfiles.stageProfiles(spark))
    case "profile_operators" => Some(QueryProfiles.operatorProfiles(spark))
    case "running_queries"   => Some(RunningQueries.running(spark))
    case _                   => None
  }

  private def infoSchemaTable(name: String): Option[DataFrame] = name match {
    case "catalogs" => Some(GraftCatalog.catalogs(spark))
    case "schemata" => Some(GraftCatalog.schemata(spark))
    case "tables"   => Some(GraftCatalog.tables(spark))
    case "columns"  => Some(GraftCatalog.allColumns(spark))
    case "files"    => Some(GraftCatalog.files(spark))
    case _          => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("sys") &&
          !spark.catalog.databaseExists("sys") =>
      // Locale.ROOT: default-locale lowercasing breaks uppercase member
      // names under Turkish-family locales (I -> dotless i)
      sysTable(u.multipartIdentifier(1).toLowerCase(java.util.Locale.ROOT))
        .map(_.queryExecution.analyzed).getOrElse(u) // unknown member: Spark's error
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("information_schema") &&
          !spark.catalog.databaseExists("information_schema") =>
      infoSchemaTable(u.multipartIdentifier(1).toLowerCase(java.util.Locale.ROOT))
        .map(_.queryExecution.analyzed).getOrElse(u)
  }
}
