package graft.sources

import org.apache.spark.sql.SparkSession

/** PER-USER storage credentials — the re-expression of Drill 1.20's
  * user-translation surface (reference
  * exec/.../server/rest/CredentialResources.java + logical/.../security/
  * PlainCredentialsProvider.java, `authMode: USER_TRANSLATION` on the
  * plugin config): when a storage source runs in per-user mode, each
  * authenticated principal reaches the downstream system AS ITSELF —
  * its own stored username/password or OAuth client pair — instead of
  * every graft user sharing one source-level identity downstream.
  *
  * The registry is JVM-global and owner/REST-set (the AccessControl
  * recipe: session conf would let a client grant itself someone else's
  * identity); keys are (source, principal). The effective principal is
  * whatever [[AccessControl.currentUser]] resolves — the same identity
  * the allow-lists and sys.profiles bind to, on both front doors.
  *
  * Fail-closed contract: a per-user source NEVER falls back to a shared
  * credential — a principal with nothing stored fails loudly, and an
  * UNAUTHENTICATED caller (in-process library use, the open loopback
  * door) cannot read a per-user source at all, because "which user?"
  * has no answer there.
  */
object UserCredentials {

  // (source -> (principal -> credential map)); sources in per-user mode
  @volatile private var store: Map[String, Map[String, Map[String, String]]] =
    Map.empty
  @volatile private var perUserSources: Set[String] = Set.empty

  /** Switch `source` to per-user mode (Drill's `authMode:
    * USER_TRANSLATION` on the plugin config) — owner-set, like the
    * plugin config it re-expresses. */
  def enablePerUser(source: String): Unit = synchronized {
    perUserSources += source.toLowerCase
  }

  def isPerUser(source: String): Boolean =
    perUserSources.contains(source.toLowerCase)

  /** Store `user`'s credentials for `source` (empty map removes them —
    * Drill's "update credentials" POST semantics). */
  def set(source: String, user: String,
          creds: Map[String, String]): Unit = synchronized {
    val s = source.toLowerCase
    val bySrc = store.getOrElse(s, Map.empty)
    store =
      if (creds.isEmpty) {
        val next = bySrc - user
        if (next.isEmpty) store - s else store + (s -> next)
      } else store + (s -> (bySrc + (user -> creds)))
  }

  def get(source: String, user: String): Option[Map[String, String]] =
    store.get(source.toLowerCase).flatMap(_.get(user))

  /** Sources that carry per-user credentials for `user` (the REST
    * listing surface — values never leave through this). */
  def sourcesFor(user: String): Seq[String] =
    store.collect { case (s, m) if m.contains(user) => s }.toSeq.sorted

  def clear(): Unit = synchronized {
    store = Map.empty; perUserSources = Set.empty
  }

  /** Resolve the credentials the CURRENT principal uses against
    * `source`. Not per-user mode: None (caller keeps its source-level
    * config). Per-user mode: the principal's stored map, failing
    * LOUDLY when the caller is unauthenticated or has nothing stored —
    * never a shared-identity fallback. */
  def resolve(spark: SparkSession, source: String)
      : Option[Map[String, String]] =
    if (!isPerUser(source)) None
    else AccessControl.currentUser(spark) match {
      case None =>
        throw new AccessControl.DeniedException(
          s"source '$source' runs per-user credentials — it needs an " +
            "authenticated principal, and this call has none (open " +
            "endpoint / in-process use)")
      case Some(u) =>
        Some(get(source, u).getOrElse {
          throw new AccessControl.DeniedException(
            s"user '$u' has no stored credential for per-user source " +
              s"'$source' — store one via POST /credentials/$source " +
              "(or UserCredentials.set); per-user sources never fall " +
              "back to a shared identity")
        })
    }

  /** Filesystem-safe per-user suffix for partitioned token files. */
  private def fsSafe(user: String): String =
    java.net.URLEncoder.encode(user, "UTF-8")

  /** The OAuth config the current principal uses for per-user `source`:
    * the principal's own client pair, and a token FILE partitioned per
    * user (Drill keeps per-user token tables the same way) — one user's
    * refresh can never clobber another's token. Not per-user: `cfg`
    * unchanged. */
  def resolveOAuth(spark: SparkSession, source: String,
                   cfg: OAuth.Config): OAuth.Config =
    resolve(spark, source) match {
      case None => cfg
      case Some(c) =>
        val u = AccessControl.currentUser(spark).get // resolve() proved it
        // a stored map WITHOUT a client pair must not quietly grant as
        // the shared operator client — that would defeat exactly the
        // isolation this module promises (and write the shared
        // identity's tokens into the user's partitioned file)
        val pair = for (id <- c.get("clientId");
                        sec <- c.get("clientSecret")) yield (id, sec)
        val (cid, sec) = pair.getOrElse(throw new AccessControl.DeniedException(
          s"user '$u' stored credentials for per-user source '$source' " +
            "without an OAuth client pair (clientId/clientSecret) — " +
            "per-user sources never fall back to the shared client"))
        cfg.copy(clientId = cid, clientSecret = sec,
          tokenFile = s"${cfg.tokenFile}.user-${fsSafe(u)}")
    }

  /** The Basic (username, password) pair the current principal uses for
    * per-user `source`, when its stored map carries one. */
  def resolveBasic(spark: SparkSession, source: String)
      : Option[(String, String)] =
    resolve(spark, source).flatMap(c =>
      for (u <- c.get("username"); p <- c.get("password")) yield (u, p))
}
