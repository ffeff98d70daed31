package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Drill's context functions (reference: exec/.../expr/fn/impl/
  * ContextFunctions.java — session_id, user, current_schema) mapped onto
  * the Spark session's identity. Values are session-dependent, so these
  * are asserted in ScalaTest rather than against a SQL oracle.
  */
object ContextFunctions {

  /** Drill `user` / `session_user` / `current_user`. */
  def user(): Column = expr("current_user()")

  /** Drill `current_schema` — the session's current database. */
  def currentSchema(): Column = expr("current_database()")

  /** Catalog qualifier (Drill exposes the storage-plugin name here). */
  def currentCatalog(): Column = expr("current_catalog()")

  /** Drill `session_id` — a stable id for the session's lifetime (the
    * Spark application id plays that role). */
  def sessionId(spark: SparkSession): Column = lit(spark.sparkContext.applicationId)

  /** Engine version (Drill exposes its build version the same way). */
  def engineVersion(): Column = version()

  /** Drill `localtime`/`localtimestamp` role: the statement-evaluation
    * instant in the session timezone. */
  def localTime(): Column = expr("localtimestamp()")

  /** Drill/postgres `timeofday()` — the wall-clock instant as a
    * human-readable string (ref ContextFunctions' DateTypeFunctions
    * sibling `timeofday`): formatted current timestamp with zone. */
  def timeOfDay(): Column =
    date_format(current_timestamp(), "EEE MMM dd HH:mm:ss.SSS zzz yyyy")

  /** `statement_timestamp()` / `transaction_timestamp()` (postgres-role
    * fns Drill carries): both the query-start instant — Spark's
    * current_timestamp() is already fixed per query, which is exactly
    * the statement/transaction-stability contract. */
  def statementTimestamp(): Column = current_timestamp()
  def transactionTimestamp(): Column = current_timestamp()

  /** All context columns at once — the shape of Drill's
    * `SELECT session_id, user, current_schema FROM (VALUES(1))`. */
  def contextRow(spark: SparkSession): Seq[Column] = Seq(
    sessionId(spark).as("session_id"),
    user().as("session_user"),
    currentSchema().as("current_schema"),
    currentCatalog().as("current_catalog"),
    engineVersion().as("engine_version"))
}
