package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** Per-user AUTHORIZATION for graft's two front doors — the
  * re-expression of Drill's inbound impersonation + workspace/view
  * authorization surface (reference exec/.../rpc/security and the
  * `exec.impersonation.inbound_policies` option): the REST and JDBC
  * endpoints authenticate a principal, the principal travels with the
  * request, named dfs WORKSPACES and persistent VIEWS can be scoped by
  * allow-list, and sys.profiles records who ran what.
  *
  * The policy is a JVM-GLOBAL registry set programmatically by the
  * session owner ([[grantWorkspace]] / [[grantView]] /
  * [[allowImpersonation]]) — deliberately NOT session conf, which a
  * JDBC client could rewrite in its own connection (`SET graft.auth…`)
  * to grant itself access. One front-door server per JVM (the
  * JdbcEndpoint constraint) means one policy per JVM by construction,
  * the same shape as its credential store.
  *  - workspace allow-list: users allowed to resolve `dfs.<ws>.…`
  *    (no entry = workspace open to all)
  *  - view allow-list: users allowed to reference the view by name
  *    (no entry = view open to all)
  *  - impersonation policy: run-as targets a proxy user may assume
  *    (`*` = any) — Drill's `exec.impersonation.inbound_policies`;
  *    the REST door reads the target from the `X-Run-As` header
  *
  * Enforcement model, stated honestly: ACLs bind to the REQUEST
  * principal. In-process library use has no principal and sees
  * everything — the session owner already holds the data. On the REST
  * door the principal is the basic-auth user (spoof-proof once
  * credentials are configured). On the JDBC door it is the HiveServer2
  * session user — verified when the endpoint runs with CUSTOM
  * credentials, client-CLAIMED in NONE mode (the same posture as
  * Drill impersonation without authentication). The allow-lists scope
  * NAMED resources (workspaces, views); they are not a filesystem
  * sandbox — raw-path reads (`dfs.`/abs/path``, `parquet.`…``) stay
  * open to any authenticated user, as in Drill's dfs plugin before
  * per-path authorization. */
object AccessControl {

  /** Thrown on an allow-list denial — a SecurityException subclass so
    * front doors and specs can match it through Spark's analysis
    * wrapping. */
  final class DeniedException(msg: String) extends SecurityException(msg)

  /** sys.profiles user channel: [[runAs]] stamps the principal on the
    * calling thread's Spark job tags; QueryProfiles reads it back from
    * SQLExecutionStart.jobTags. */
  val UserTag = "graft.auth.user:"

  private val principal = new ThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }

  /** The request principal for `spark`: the [[runAs]] thread scope if
    * one is active (REST), else the JDBC connection that owns this
    * exact session clone ([[JdbcEndpoint.sessionUser]] — synchronous,
    * thread-independent), else none (in-process library use). */
  def currentUser(spark: SparkSession): Option[String] = {
    val p = principal.get()
    if (p.isDefined) p else JdbcEndpoint.sessionUser(spark)
  }

  /** Run `body` as `user`: allow-list checks during analysis see the
    * principal, and a Spark job tag carries it into the SQL-execution
    * events so sys.profiles can record it. */
  def runAs[T](spark: SparkSession, user: String)(body: => T): T = {
    val prev = principal.get()
    principal.set(Some(user))
    // job tags refuse commas (tag-list separator) — strip rather than
    // fail the query; the ACL checks still see the exact name
    val tag = UserTag + user.replace(",", "_")
    spark.sparkContext.addJobTag(tag)
    try body
    finally {
      spark.sparkContext.removeJobTag(tag)
      principal.set(prev)
    }
  }

  // ---- the policy registry (JVM-global, owner-set; names lowercase)
  @volatile private var workspaceAcl: Map[String, Set[String]] = Map.empty
  @volatile private var viewAcl: Map[String, Set[String]] = Map.empty
  @volatile private var impersonationAcl: Map[String, Set[String]] = Map.empty
  @volatile private var adminAcl: Set[String] = Set.empty

  /** Restrict `dfs.<ws>.…` to `users`; empty set removes the entry. */
  def grantWorkspace(ws: String, users: Set[String]): Unit = synchronized {
    workspaceAcl =
      if (users.isEmpty) workspaceAcl - ws.toLowerCase
      else workspaceAcl + (ws.toLowerCase -> users)
  }

  /** Restrict references to view `name` to `users`. */
  def grantView(name: String, users: Set[String]): Unit = synchronized {
    viewAcl =
      if (users.isEmpty) viewAcl - name.toLowerCase
      else viewAcl + (name.toLowerCase -> users)
  }

  /** Allow `proxy` to run as each of `targets` (`*` = anyone). */
  def allowImpersonation(proxy: String, targets: Set[String]): Unit =
    synchronized {
      impersonationAcl =
        if (targets.isEmpty) impersonationAcl - proxy
        else impersonationAcl + (proxy -> targets)
    }

  /** ADMIN principals (Drill's security.admin.users): may cancel any
    * user's query through the front doors. Owner-set like the other
    * registries; empty = no admins. */
  def grantAdmins(users: Set[String]): Unit = synchronized {
    adminAcl = users
  }

  def isAdmin(user: String): Boolean = adminAcl.contains(user)

  def clearPolicy(): Unit = synchronized {
    workspaceAcl = Map.empty; viewAcl = Map.empty
    impersonationAcl = Map.empty; adminAcl = Set.empty
  }

  private[sources] def hasViewAcls: Boolean = viewAcl.nonEmpty

  /** Whether `ws` carries a workspace allow-list (the REST storage
    * mutation's fail-closed probe for principal-less requests). */
  private[sources] def isWorkspaceProtected(ws: String): Boolean =
    workspaceAcl.contains(ws.toLowerCase)

  /** Deny `dfs.<ws>.…` resolution when the workspace carries an
    * allow-list the request principal is not on. The ACL map is tested
    * BEFORE resolving the principal: currentUser walks the JDBC session
    * registry reflectively whenever a server is live, and the common
    * posture (no ACL on this workspace) must not pay that per
    * resolution. */
  def checkWorkspace(spark: SparkSession, ws: String): Unit =
    workspaceAcl.get(ws.toLowerCase).foreach { allowed =>
      currentUser(spark).foreach { u =>
        if (!allowed.contains(u))
          throw new DeniedException(
            if (u == JdbcEndpoint.UnresolvedPrincipal)
              s"dfs workspace '$ws' is ACL-protected and the JDBC " +
                "principal could not be resolved (thrift-server registry " +
                "walk failed) — failing closed; see the server log"
            else s"user '$u' is not authorized for dfs workspace '$ws'")
      }
    }

  /** Deny a view reference when the view carries an allow-list the
    * principal `u` is not on (called by [[AccessControlRule]], which
    * resolves the principal ONCE per rule application). */
  private[sources] def checkViewFor(u: String, name: String): Unit =
    viewAcl.get(name.toLowerCase).foreach { allowed =>
      if (!allowed.contains(u))
        throw new DeniedException(
          if (u == JdbcEndpoint.UnresolvedPrincipal)
            s"view '$name' is ACL-protected and the JDBC principal " +
              "could not be resolved (thrift-server registry walk " +
              "failed) — failing closed; see the server log"
          else s"user '$u' is not authorized for view '$name'")
    }

  /** Resolve the EFFECTIVE principal for a request authenticated as
    * `auth` and asking to run as `runAsTarget` (Drill's INBOUND
    * IMPERSONATION): allowed iff the impersonation policy names the
    * target (or `*`). No target = the authenticated user. */
  def effectiveUser(spark: SparkSession, auth: String,
                    runAsTarget: Option[String]): String =
    runAsTarget.map(_.trim).filter(t => t.nonEmpty && t != auth) match {
      case None => auth
      case Some(t) =>
        val policy = impersonationAcl.getOrElse(auth, Set.empty)
        if (policy.contains("*") || policy.contains(t)) t
        else throw new DeniedException(
          s"user '$auth' is not allowed to impersonate '$t' " +
            "(inbound-impersonation policy)")
    }
}

/** Analyzer rule enforcing VIEW allow-lists: runs in the resolution
  * batch's fixed point, so it sees the SubqueryAlias a view expands to
  * right after Spark's own relation resolution substitutes it. Zero
  * cost without a request principal (one ThreadLocal read).
  *
  * Matching is by ALIAS NAME, so a non-granted user's own subquery
  * aliased to a protected view's name is also denied — a conservative
  * false positive (fail-closed beats a bypass; rename the alias). */
case class AccessControlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (AccessControl.hasViewAcls)
      AccessControl.currentUser(spark).foreach { u =>
        plan.foreach {
          case s: SubqueryAlias =>
            AccessControl.checkViewFor(u, s.alias)
          case _ => ()
        }
      }
    plan
  }
}
