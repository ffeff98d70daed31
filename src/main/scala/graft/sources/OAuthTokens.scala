package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** OAuth2 token acquisition / refresh / persistence for the HTTP storage
  * source — the re-expression of Drill's OAuth surface (reference
  * exec/java-exec/.../oauth/PersistentTokenTable.java,
  * oauth/OAuthTokenProvider.java and server/rest/OAuthRequests.java):
  * Drill's HTTP plugin keeps an access/refresh token pair in a
  * persistent store and replays the refresh grant when a fetch comes
  * back 401; graft does the same with the view/alias-registry recipe —
  * one JSON file, atomic tmp+rename writes, re-read before use.
  *
  * Two grants are spoken, both standard RFC 6749 form-encoded POSTs:
  *  - `client_credentials` (bootstrap, §4.4) — when no token file
  *    exists or it holds no refresh token
  *  - `refresh_token` (§6) — when the server handed one out
  *
  * Scale shape: the token FILE rides the same shared filesystem the
  * data does; EXECUTOR tasks read it before each URL fetch and any task
  * that meets a 401 refreshes and persists (atomic rename, last writer
  * wins — refreshes are idempotent at the provider, and a lost race
  * just means one redundant grant). No driver round-trip per fetch.
  */
object OAuth {

  /** `tokenFile` is the persistent token table (one JSON object);
    * `tokenUrl` the provider's token endpoint. */
  final case class Config(tokenUrl: String, clientId: String,
                          clientSecret: String, tokenFile: String)
      extends Serializable

  final case class Tokens(accessToken: String, refreshToken: Option[String],
                          expiresAtMs: Long)

  /** A token-endpoint POST answered non-2xx; carries the HTTP status so
    * callers can tell a PROVIDER REJECTION (4xx — the token is bad,
    * re-bootstrap is correct) from a PROVIDER OUTAGE (5xx — the token
    * may be fine, retrying with a second grant type just doubles the
    * traffic and can burn a still-valid refresh token). */
  final class GrantException(msg: String, val status: Int)
      extends IllegalStateException(msg)

  private def mapper = new ObjectMapper()

  /** Read the persisted token table; None when absent/unreadable. */
  def load(cfg: Config): Option[Tokens] =
    try {
      val p = java.nio.file.Paths.get(cfg.tokenFile)
      if (!java.nio.file.Files.isRegularFile(p)) None
      else {
        val n = mapper.readTree(java.nio.file.Files.readAllBytes(p))
        Option(n.get("access_token")).map(_.asText).map { at =>
          Tokens(at,
            Option(n.get("refresh_token")).map(_.asText).filter(_.nonEmpty),
            Option(n.get("expires_at_ms")).map(_.asLong).getOrElse(0L))
        }
      }
    } catch { case _: Exception => None }

  /** Persist ATOMICALLY (tmp + rename, the ViewCatalog recipe) — a
    * reader never sees a torn token file. */
  def persist(cfg: Config, t: Tokens): Unit = {
    val root = mapper.createObjectNode()
    root.put("access_token", t.accessToken)
    t.refreshToken.foreach(root.put("refresh_token", _))
    root.put("expires_at_ms", t.expiresAtMs)
    val p = java.nio.file.Paths.get(cfg.tokenFile)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp." +
      java.util.UUID.randomUUID().toString.take(8))
    java.nio.file.Files.write(tmp, mapper.writeValueAsBytes(root))
    try
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** One token-endpoint POST (RFC 6749 form encoding). Throws with the
    * provider's error body on non-2xx — a misconfigured client id must
    * fail loudly, not loop. */
  private def grant(cfg: Config, form: Map[String, String]): Tokens = {
    val conn = java.net.URI.create(cfg.tokenUrl).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.setDoOutput(true)
    val body = form.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }.mkString("&")
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    val code = conn.getResponseCode
    def readAll(s: java.io.InputStream): String =
      if (s == null) "" else try new String(s.readAllBytes(), "UTF-8")
      finally s.close()
    if (code >= 300) {
      val err = readAll(conn.getErrorStream)
      conn.disconnect()
      throw new GrantException(
        s"OAuth token grant failed (HTTP $code) at ${cfg.tokenUrl}: " +
          err.take(300), code)
    }
    val n = mapper.readTree(readAll(conn.getInputStream))
    conn.disconnect()
    val at = Option(n.get("access_token")).map(_.asText)
      .getOrElse(throw new IllegalStateException(
        "OAuth token response carries no access_token"))
    // expires_in is SECONDS from now (RFC 6749 §5.1); absent = treat as
    // non-expiring and rely on 401-driven refresh
    val expMs = Option(n.get("expires_in")).map(_.asLong)
      .map(s => System.currentTimeMillis() + s * 1000L)
      .getOrElse(Long.MaxValue)
    Tokens(at, Option(n.get("refresh_token")).map(_.asText), expMs)
  }

  /** The bootstrap grant (client_credentials). */
  def fetchInitial(cfg: Config): Tokens =
    grant(cfg, Map("grant_type" -> "client_credentials",
      "client_id" -> cfg.clientId, "client_secret" -> cfg.clientSecret))

  /** The refresh grant; falls back to client_credentials ONLY when the
    * provider REJECTS the refresh token — a 4xx token-endpoint answer
    * (invalid_grant: expired/revoked — the re-bootstrap path Drill's
    * token table supports via updateTokens). A 5xx (provider outage)
    * and a malformed 2xx (no access_token — misconfiguration) both
    * RETHROW: re-bootstrapping on a transient outage doubles every
    * refresh into two grants and can discard a still-valid refresh
    * token, and grant()'s fail-loudly promise must not be masked. */
  def refresh(cfg: Config, refreshToken: String): Tokens =
    try grant(cfg, Map("grant_type" -> "refresh_token",
      "refresh_token" -> refreshToken,
      "client_id" -> cfg.clientId, "client_secret" -> cfg.clientSecret))
    catch {
      case e: GrantException if e.status >= 400 && e.status < 500 =>
        fetchInitial(cfg)
    }

  /** A usable access token: the persisted one if fresh (30 s skew
    * margin), else refresh-or-bootstrap + persist. */
  def currentToken(cfg: Config): String = {
    val now = System.currentTimeMillis()
    load(cfg) match {
      case Some(t) if t.expiresAtMs > now + 30000 => t.accessToken
      case prior =>
        val t = prior.flatMap(_.refreshToken) match {
          case Some(rt) => refresh(cfg, rt)
          case None     => fetchInitial(cfg)
        }
        persist(cfg, t)
        t.accessToken
    }
  }

  /** Force-refresh after a 401 (the persisted token LOOKED fresh but the
    * provider disagrees — revocation, clock skew) and persist. */
  def refreshAfter401(cfg: Config): String = {
    val t = load(cfg).flatMap(_.refreshToken) match {
      case Some(rt) => refresh(cfg, rt)
      case None     => fetchInitial(cfg)
    }
    persist(cfg, t)
    t.accessToken
  }
}
