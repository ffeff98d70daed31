package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Federation, OAuth}

/** OAuth token flow for the HTTP storage source (Drill exec/oauth/
  * PersistentTokenTable + server/rest/OAuthRequests): bootstrap via
  * client_credentials, 401-driven refresh MID-PAGINATION on the executor
  * fetch path, and atomic token-file persistence. All against an
  * in-process RFC 6749 token endpoint — zero egress. */
class OAuthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** In-process provider: /token speaks both grants and counts them;
    * /data?page=N requires a Bearer token the provider still honors.
    * The FIRST access token is revoked server-side after `revokeAfter`
    * successful data fetches — the deterministic "expires mid-
    * pagination" shape. */
  private final class Provider(clientId: String, secret: String,
                               revokeAfter: Int) {
    val ccGrants = new AtomicInteger(0)
    val rtGrants = new AtomicInteger(0)
    private val tokenSeq = new AtomicInteger(0)
    // SETS, not single slots: pages fetch in parallel, so two tasks can
    // both 401 and both refresh — a provider that only honors its
    // latest token would fail the first task's retry (real providers
    // keep every unexpired token live)
    private val validTokens =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val validRefresh =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val served = new AtomicInteger(0)
    @volatile private var firstTokenRevoked = false
    private var firstToken = ""

    val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def port: Int = server.getAddress.getPort

    private def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b); x.close()
    }

    private def issue(x: HttpExchange): Unit = {
      val n = tokenSeq.incrementAndGet()
      val at = s"tok-$n"; val rt = s"rt-$n"
      validTokens.add(at); validRefresh.add(rt)
      if (n == 1) firstToken = at
      respond(x, 200,
        s"""{"access_token":"$at","refresh_token":"$rt","expires_in":3600}""")
    }

    server.createContext("/token", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val form = new String(x.getRequestBody.readAllBytes(), "UTF-8")
          .split('&').map(_.split("=", 2))
          .map(a => a(0) -> java.net.URLDecoder.decode(a.lift(1).getOrElse(""), "UTF-8"))
          .toMap
        form.get("grant_type") match {
          case Some("client_credentials")
              if form.get("client_id").contains(clientId) &&
                form.get("client_secret").contains(secret) =>
            ccGrants.incrementAndGet(); issue(x)
          case Some("refresh_token")
              if form.get("refresh_token").exists(validRefresh.contains) =>
            rtGrants.incrementAndGet(); issue(x)
          case Some("client_credentials") =>
            respond(x, 401, """{"error":"invalid_client"}""")
          case _ =>
            respond(x, 400, """{"error":"invalid_grant"}""")
        }
      }
    })
    server.createContext("/data", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
          .getOrElse("")
        val tok = auth.stripPrefix("Bearer ").trim
        val ok = tok.nonEmpty && validTokens.contains(tok) &&
          !(firstTokenRevoked && tok == firstToken)
        if (!ok) { respond(x, 401, """{"error":"invalid_token"}"""); return }
        val n = served.incrementAndGet()
        if (n >= revokeAfter && tok == firstToken) firstTokenRevoked = true
        val page = x.getRequestURI.getQuery.stripPrefix("page=").toInt
        respond(x, 200, (1 to 3)
          .map(i => s"""{"page":$page,"id":${page * 10 + i}}""")
          .mkString("\n"))
      }
    })
    server.start()
    def stop(): Unit = server.stop(0)
  }

  test("httpJsonLines with OAuth: bootstrap via client_credentials, " +
      "first token revoked mid-pagination, 401 triggers an executor-side " +
      "refresh grant and the read COMPLETES; token file updated") {
    val p = new Provider("cid", "shh", revokeAfter = 2)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_oauth")
      val cfg = OAuth.Config(s"http://127.0.0.1:${p.port}/token",
        "cid", "shh", s"$dir/tokens.json")
      // pages fetched one per task; the provider revokes tok-1 after 2
      // served pages, so later pages 401 with the bootstrap token
      val urls = (1 to 6).map(n => s"http://127.0.0.1:${p.port}/data?page=$n")
      val df = Federation.httpJsonLines(spark, urls, oauth = Some(cfg))
      assert(df.count() == 18) // every page completed despite the revocation
      assert(p.ccGrants.get() >= 1, "no client_credentials bootstrap")
      assert(p.rtGrants.get() >= 1,
        "mid-pagination 401 never exercised the refresh grant")
      // the persisted table moved past the revoked bootstrap token
      val t = OAuth.load(cfg).get
      assert(t.accessToken != "tok-1" && t.accessToken.startsWith("tok-"))
      assert(t.refreshToken.exists(_.startsWith("rt-")))
      // no stray tmp files: persistence is tmp+atomic-rename
      val stray = java.nio.file.Files.list(dir).iterator()
      var names = List.empty[String]
      while (stray.hasNext) names ::= stray.next().getFileName.toString
      assert(names == List("tokens.json"), s"stray files: $names")
    } finally p.stop()
  }

  test("token persistence round-trips; a fresh persisted token is used " +
      "as-is; an EXPIRED one refreshes through the provider") {
    val p = new Provider("cid", "shh", revokeAfter = Int.MaxValue)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_oauth2")
      val cfg = OAuth.Config(s"http://127.0.0.1:${p.port}/token",
        "cid", "shh", s"$dir/t.json")
      // bootstrap + persist
      val tok1 = OAuth.currentToken(cfg)
      assert(tok1 == "tok-1" && p.ccGrants.get() == 1)
      // fresh: NO second grant
      assert(OAuth.currentToken(cfg) == tok1 && p.ccGrants.get() == 1 &&
        p.rtGrants.get() == 0)
      // plant an expired copy with the same refresh token: currentToken
      // must take the refresh_token grant, not re-bootstrap
      val t = OAuth.load(cfg).get
      OAuth.persist(cfg, t.copy(expiresAtMs = System.currentTimeMillis() - 1))
      val tok2 = OAuth.currentToken(cfg)
      assert(tok2 == "tok-2" && p.rtGrants.get() == 1 && p.ccGrants.get() == 1)
      assert(OAuth.load(cfg).get.accessToken == tok2)
    } finally p.stop()
  }

  test("a bad client secret fails LOUDLY with the provider's error, and " +
      "a rejected refresh token falls back to re-bootstrap") {
    val p = new Provider("cid", "shh", revokeAfter = Int.MaxValue)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_oauth3")
      val bad = OAuth.Config(s"http://127.0.0.1:${p.port}/token",
        "cid", "WRONG", s"$dir/bad.json")
      val e = intercept[IllegalStateException](OAuth.fetchInitial(bad))
      assert(e.getMessage.contains("401") &&
        e.getMessage.contains("invalid_client"))
      // stale refresh token: the provider 400s the refresh grant, and
      // refresh() re-bootstraps via client_credentials
      val cfg = OAuth.Config(s"http://127.0.0.1:${p.port}/token",
        "cid", "shh", s"$dir/ok.json")
      val t = OAuth.refresh(cfg, "rt-never-issued")
      assert(t.accessToken.startsWith("tok-") && p.ccGrants.get() >= 1)
    } finally p.stop()
  }

  test("PER-USER storage credentials (Drill USER_TRANSLATION): two " +
      "principals read the SAME http source with DISTINCT downstream " +
      "identities (the provider sees each user's own client pair, " +
      "never a shared one), OAuth token files partition per user, a " +
      "principal with nothing stored fails loudly, and so does an " +
      "identity-less in-process call") {
    import graft.sources.{AccessControl, UserCredentials}
    val granted = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val bearers = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b); x.close()
    }
    server.createContext("/token", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val form = new String(x.getRequestBody.readAllBytes(), "UTF-8")
          .split('&').map(_.split("=", 2))
          .map(a => a(0) -> java.net.URLDecoder
            .decode(a.lift(1).getOrElse(""), "UTF-8")).toMap
        val cid = form.getOrElse("client_id", "?")
        granted.add(cid)
        respond(x, 200,
          s"""{"access_token":"tok-$cid","expires_in":3600}""")
      }
    })
    server.createContext("/data", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        bearers.add(Option(x.getRequestHeaders.getFirst("Authorization"))
          .getOrElse("").stripPrefix("Bearer ").trim)
        respond(x, 200, """{"id":1}""" + "\n" + """{"id":2}""")
      }
    })
    server.start()
    val dir = java.nio.file.Files.createTempDirectory("graft_peruser")
    val cfg = OAuth.Config(
      s"http://127.0.0.1:${server.getAddress.getPort}/token",
      "SHARED-cid", "SHARED-secret", dir.resolve("tok.json").toString)
    UserCredentials.enablePerUser("api")
    UserCredentials.set("api", "alice",
      Map("clientId" -> "cid-alice", "clientSecret" -> "sec-a"))
    UserCredentials.set("api", "bob",
      Map("clientId" -> "cid-bob", "clientSecret" -> "sec-b"))
    try {
      val urls = Seq(s"http://127.0.0.1:${server.getAddress.getPort}/data")
      val a = AccessControl.runAs(spark, "alice")(
        Federation.httpJsonLines(spark, urls, oauth = Some(cfg),
          credentialSource = Some("api")))
      val b = AccessControl.runAs(spark, "bob")(
        Federation.httpJsonLines(spark, urls, oauth = Some(cfg),
          credentialSource = Some("api")))
      assert(a.count() == 2 && b.count() == 2)
      // DISTINCT downstream identities; the shared pair never used
      assert(granted.contains("cid-alice") && granted.contains("cid-bob"),
        s"granted=$granted")
      assert(!granted.contains("SHARED-cid"),
        "per-user source must never fall back to the shared client")
      assert(bearers.contains("tok-cid-alice") &&
        bearers.contains("tok-cid-bob"), s"bearers=$bearers")
      // token files PARTITION per user; the shared file is never written
      assert(java.nio.file.Files.exists(dir.resolve("tok.json.user-alice")))
      assert(java.nio.file.Files.exists(dir.resolve("tok.json.user-bob")))
      assert(!java.nio.file.Files.exists(dir.resolve("tok.json")))
      // nothing stored -> loud, named failure (never shared fallback)
      val e = intercept[AccessControl.DeniedException] {
        AccessControl.runAs(spark, "mallory")(
          Federation.httpJsonLines(spark, urls, oauth = Some(cfg),
            credentialSource = Some("api")))
      }
      assert(e.getMessage.contains("mallory") &&
        e.getMessage.contains("no stored credential"), e.getMessage)
      // identity-less (in-process, open door) -> loud failure too
      val e2 = intercept[AccessControl.DeniedException] {
        Federation.httpJsonLines(spark, urls, oauth = Some(cfg),
          credentialSource = Some("api"))
      }
      assert(e2.getMessage.contains("authenticated principal"), e2.getMessage)
      // a stored map WITHOUT an OAuth client pair must refuse an OAuth
      // read, not silently grant as the shared operator client
      UserCredentials.set("api", "dave",
        Map("username" -> "dave-dw", "password" -> "pw"))
      val e3 = intercept[AccessControl.DeniedException] {
        AccessControl.runAs(spark, "dave")(
          Federation.httpJsonLines(spark, urls, oauth = Some(cfg),
            credentialSource = Some("api")))
      }
      assert(e3.getMessage.contains("client pair") &&
        e3.getMessage.contains("dave"), e3.getMessage)
      assert(!granted.contains("SHARED-cid"),
        "the shared client must not have been used for dave")
      // a source NOT in per-user mode keeps the source-level config
      val plain = Federation.httpJsonLines(spark, urls, oauth = Some(cfg),
        credentialSource = Some("other_api"))
      assert(plain.count() == 2)
      assert(granted.contains("SHARED-cid"))
    } finally {
      UserCredentials.clear()
      server.stop(0)
    }
  }

  test("refresh: a provider 5xx RETHROWS with the status — no " +
      "client_credentials fallback (a transient outage must not double " +
      "every refresh into two grants or burn a still-valid refresh " +
      "token); only a 4xx rejection re-bootstraps") {
    val cc = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val form = new String(x.getRequestBody.readAllBytes(), "UTF-8")
        val (code, body) =
          if (form.contains("grant_type=refresh_token"))
            (503, """{"error":"temporarily_unavailable"}""")
          else {
            cc.incrementAndGet()
            (200, """{"access_token":"cc-tok","expires_in":3600}""")
          }
        val b = body.getBytes("UTF-8")
        x.sendResponseHeaders(code, b.length)
        x.getResponseBody.write(b); x.close()
      }
    })
    server.start()
    try {
      val cfg = OAuth.Config(
        s"http://127.0.0.1:${server.getAddress.getPort}/token", "cid", "sec",
        java.nio.file.Files.createTempDirectory("oauth5xx")
          .resolve("tok.json").toString)
      val e = intercept[OAuth.GrantException] { OAuth.refresh(cfg, "rt-1") }
      assert(e.status == 503 && e.getMessage.contains("503"))
      assert(cc.get == 0, "5xx must not fall back to client_credentials")
    } finally server.stop(0)
  }
}
