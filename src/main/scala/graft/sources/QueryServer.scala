package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import org.apache.spark.sql.SparkSession

/** In-process REST query endpoint — the "point curl at it" half of
  * Drill's identity (reference exec/.../server/rest/DrillRestServer.java,
  * BaseQueryRunner.java, QueryWrapper). `POST /query` with
  * `{"query": "SELECT ..."}` returns Drill's REST response shape:
  * `{"columns": [...], "rows": [ {col: value, ...}, ... ]}`.
  *
  * The server is a thin shell: the SQL plans and executes on the session
  * exactly as a programmatic `spark.sql` call would (same catalog, same
  * registered views/extensions), rows serialize through the engine's own
  * JSON writer, and an explicit `maxRows` cap bounds the driver-side
  * materialization — the REST surface is for interactive/result-set
  * queries, not bulk export (that's CTAS's job, as in Drill).
  */
object QueryServer {

  private val mapper = new ObjectMapper()

  /** An AccessControl denial anywhere in the cause chain (Spark wraps
    * analysis-time failures) is a 403, not a generic 400. */
  private def isDenied(e: Throwable): Boolean = {
    var c: Throwable = e
    var guard = 0
    while (c != null && guard < 20) {
      if (c.isInstanceOf[AccessControl.DeniedException]) return true
      c = c.getCause; guard += 1
    }
    false
  }

  final class Running(server: HttpServer,
                      pool: java.util.concurrent.ExecutorService) {
    val port: Int = server.getAddress.getPort
    def stop(): Unit = { server.stop(0); pool.shutdownNow() }
  }

  /** `tls` = Some((keystorePath, password)) serves EVERY endpoint over
    * HTTPS (an `HttpsServer` with the keystore's key — Drill's web
    * server does exactly this, self-generating a cert when none is
    * configured; reference exec/.../server/rest/ssl/
    * SslContextFactoryConfigurator.java, ssl/SSLConfigServer.java).
    * Generate the PKCS12 pair with [[TlsSupport.generateKeyStore]]; a
    * client trusts the matching truststore and verifies the HOSTNAME
    * against the cert's SubjectAlternativeName (the generator writes
    * DNS/IP SANs, so stock verification works — no trust-all clients).
    * Plaintext HTTP against a TLS port dies in the handshake, so
    * enabling TLS IS the plaintext refusal. With TLS on, basic-auth
    * credentials ride the encrypted channel — the posture that makes
    * `credentials` safe past loopback.
    *
    * `credentials` non-empty enables HTTP BASIC auth on EVERY endpoint
    * (Drill's REST surface under security: rest API auth, reference
    * exec/.../server/rest with security.auth enabled) — the password
    * check is constant-time (MessageDigest.isEqual, the JdbcEndpoint
    * CUSTOM-provider rule: short-circuiting compares leak prefix length
    * to a timing probe) and failures answer 401 + WWW-Authenticate with
    * a GENERIC message (never "unknown user" — username enumeration).
    * Empty credentials = open loopback endpoint, unchanged.
    *
    * Known, accepted bounds on a LOOPBACK-BOUND endpoint (r13 verdict
    * note): the credentials map holds plaintext passwords in process
    * memory (no hashing — the map is operator-supplied at start and
    * never persisted), and MessageDigest.isEqual returns early on a
    * LENGTH mismatch, so password length is in principle observable to
    * a local timing probe. A deployment past loopback must terminate
    * TLS+auth in front (the JdbcEndpoint posture) rather than harden
    * this shell. */
  def start(spark: SparkSession, port: Int = 0, maxRows: Int = 10000,
            credentials: Map[String, String] = Map.empty,
            tls: Option[(String, String)] = None): Running = {
    val server = tls match {
      case None =>
        HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
      case Some((ksPath, ksPass)) =>
        val s = com.sun.net.httpserver.HttpsServer
          .create(new InetSocketAddress("127.0.0.1", port), 0)
        s.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(
          TlsSupport.serverContext(ksPath, ksPass)))
        s
    }
    // the AUTHENTICATED principal of this exchange, derived from the
    // per-exchange Authorization header; None = invalid/absent. Handlers
    // needing the principal re-derive it from the SAME header — NEVER
    // through HttpExchange.setAttribute, whose store is the
    // HttpContext-wide SHARED map, so concurrent requests would read
    // each other's principals (a confirmed principal-swap race).
    def authUser(x: HttpExchange): Option[String] = {
      val hdr = Option(x.getRequestHeaders.getFirst("Authorization"))
        .getOrElse("")
      if (!hdr.startsWith("Basic ")) None
      else {
        val dec =
          try new String(java.util.Base64.getDecoder
            .decode(hdr.drop(6).trim), "UTF-8")
          catch { case _: IllegalArgumentException => "" }
        val i = dec.indexOf(':')
        if (i <= 0) None
        else {
          val (u, pw) = (dec.take(i), dec.drop(i + 1))
          // unknown users still run the constant-time compare
          // against a dummy — skipping it returns measurably
          // faster and re-opens the username-enumeration timing
          // channel the generic 401 body closes
          val expected = credentials.getOrElse(u,
            "\u0000graft-no-such-user")
          if (java.security.MessageDigest.isEqual(
              expected.getBytes("UTF-8"), pw.getBytes("UTF-8")) &&
              credentials.contains(u)) Some(u)
          else None
        }
      }
    }
    def guarded(h: HttpHandler): HttpHandler =
      if (credentials.isEmpty) h
      else new HttpHandler {
        override def handle(x: HttpExchange): Unit = {
          if (authUser(x).isEmpty) {
            x.getResponseHeaders.add("WWW-Authenticate",
              "Basic realm=\"graft\"")
            respond(x, 401, error("authentication required"))
          } else h.handle(x)
        }
      }
    server.createContext("/query", guarded(new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        try {
          // DELETE /query/<queryId> — cancel a RUNNING query (Drill's
          // /profiles/cancel/{queryid}, reference server/rest/
          // QueryResources.java): running and future jobs of the query's
          // job group die, the submitter sees a failed action, the
          // session survives. Ids come from sys.running_queries /
          // GET /queries.json.
          if (x.getRequestMethod == "DELETE") {
            val path = x.getRequestURI.getPath
            val id = path.stripPrefix("/query").stripPrefix("/")
            if (id.isEmpty) { respond(x, 400, error(
              "DELETE /query/<queryId> — id required")); return }
            // on an AUTHENTICATED door, cancellation is scoped like
            // Drill's (QueryResources checks owner-or-admin): a
            // principal may cancel its OWN queries, admins
            // (AccessControl.grantAdmins) may cancel anyone's. The
            // open loopback endpoint keeps the session-owner posture.
            if (credentials.nonEmpty) {
              val principal = authUser(x).getOrElse("")
              val owner = RunningQueries.ownerOf(id)
              if (owner.isDefined && owner.get != principal &&
                  !AccessControl.isAdmin(principal)) {
                respond(x, 403, error(s"user '$principal' may not " +
                  s"cancel a query owned by '${owner.get}' (not an admin)"))
                return
              }
            }
            if (RunningQueries.cancel(spark, id))
              respond(x, 200, s"""{"cancelled":"$id"}""")
            else respond(x, 404, error(
              s"no running query '$id' (already finished?)"))
            return
          }
          if (x.getRequestMethod != "POST") { respond(x, 405, error("POST only")); return }
          // CSRF hardening: loopback binding does not stop a BROWSER on
          // this machine from firing cross-site POSTs at localhost.
          // Requiring application/json forces a CORS preflight (simple
          // no-preflight requests can only carry form/text types) which
          // this server never approves, and the Host check blocks DNS
          // rebinding. Non-browser clients (curl/Federation) just set
          // the header.
          val ct = Option(x.getRequestHeaders.getFirst("Content-Type"))
            .getOrElse("").toLowerCase
          if (!ct.startsWith("application/json")) {
            respond(x, 415, error(
              "Content-Type must be application/json")); return
          }
          // Strip the :port suffix (bracketed IPv6 keeps its brackets)
          // and require EXACT equality: prefix matching would pass
          // attacker DNS names like 127.0.0.1.evil.com pointed at
          // loopback, defeating the rebinding check.
          val host = Option(x.getRequestHeaders.getFirst("Host"))
            .getOrElse("").toLowerCase
          val hostName =
            if (host.startsWith("[")) host.take(host.indexOf(']') + 1)
            else host.takeWhile(_ != ':')
          if (!(hostName == "127.0.0.1" || hostName == "localhost" ||
                hostName == "[::1]")) {
            respond(x, 403, error("unrecognized Host")); return
          }
          val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
          val sql = Option(mapper.readTree(body)).flatMap(n => Option(n.get("query")))
            .map(_.asText).getOrElse("")
          if (sql.trim.isEmpty) { respond(x, 400, error("missing \"query\"")); return }
          def run(asUser: String): String =
              RunningQueries.track(spark, sql, asUser, "rest") {
            val df = spark.sql(sql).limit(maxRows)
            val cols = mapper.createObjectNode()
            val colArr = cols.putArray("columns")
            df.columns.foreach(colArr.add)
            val rows = df.toJSON.collect() // engine-serialized, maxRows-bounded
            val sb = new StringBuilder()
            sb.append("{\"columns\":").append(mapper.writeValueAsString(cols.get("columns")))
            // result schema as DDL: peers re-type zero-row results instead
            // of failing JSON inference (Federation.graftPeer)
            sb.append(",\"schema\":").append(mapper.writeValueAsString(df.schema.toDDL))
            sb.append(",\"rows\":[").append(rows.mkString(",")).append("]}")
            sb.toString
          } // track(): job group + cancel registration + admission queue
          // authenticated requests execute AS the effective principal:
          // the basic-auth user, or the X-Run-As target when the
          // inbound-impersonation policy allows it (AccessControl) —
          // allow-list checks and sys.profiles both see that user
          val out = (if (credentials.isEmpty) None else authUser(x)) match {
            case None => run("") // open endpoint: session-owner posture
            case Some(auth) =>
              val eff = AccessControl.effectiveUser(spark, auth,
                Option(x.getRequestHeaders.getFirst("X-Run-As")))
              AccessControl.runAs(spark, eff)(run(eff))
          }
          respond(x, 200, out)
        } catch {
          case e: RunningQueries.AdmissionException =>
            // Drill's queue-timeout surface: the engine is at its
            // configured concurrency — a retryable 503, not a 400
            respond(x, 503, error(e.getMessage))
          case e: Throwable =>
            respond(x, if (isDenied(e)) 403 else 400, error(
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
        }
      }
    }))
    // shared GET->JSON-array handler: the four DataFrame endpoints are
    // identical except for the frame expression — one copy of the
    // method-check / toJSON / error plumbing, no drift
    def jsonGet(path: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      server.createContext(path, guarded(new HttpHandler {
        override def handle(x: HttpExchange): Unit = try {
          if (x.getRequestMethod != "GET") { respond(x, 405, error("GET only")); return }
          respond(x, 200, df.toJSON.collect().mkString("[", ",", "]"))
        } catch {
          case e: Throwable => respond(x, 400, error(
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
        }
      }))
    // Drill web UI's profile listing (ref server/rest/profile/
    // ProfileResources.java): the QueryProfiles ring as JSON. Empty until
    // QueryProfiles.enable(spark) — profiling is opt-in.
    jsonGet("/profiles")(QueryProfiles.profiles(spark))
    // per-stage metric rows (Drill's operator-level profile fragments,
    // ref server/rest/profile/ProfileResources.java detail view); join
    // to /profiles on execution_id
    jsonGet("/profiles/stages")(QueryProfiles.stageProfiles(spark))
    // per-OPERATOR metric rows (the deepest level of Drill's profile
    // detail view: each operator's output rows / build times / spills)
    jsonGet("/profiles/operators")(QueryProfiles.operatorProfiles(spark))
    // GET /options.json — Drill's option listing (ref server/rest/
    // StatusResources.java): the sys.options table as JSON
    jsonGet("/options.json")(SysTables.options(spark))
    // GET /queries.json — the LIVE query registry (Drill's running-
    // profiles view, ref server/rest/profile/ProfileResources.java):
    // ids here feed DELETE /query/<id> and the console's cancel button
    jsonGet("/queries.json")(RunningQueries.running(spark))
    // GET /storage.json — the storage/workspace registry (ref
    // server/rest/StorageResources.java): dfs workspaces from the
    // session conf + the catalog's databases, with enabled flags
    server.createContext("/storage.json", guarded(new HttpHandler {
      override def handle(x: HttpExchange): Unit = try {
        if (x.getRequestMethod != "GET") { respond(x, 405, error("GET only")); return }
        val ws = DfsSql.workspaces(spark) // the one canonical registry
        val arr = mapper.createArrayNode()
        ws.sortBy(_._1).foreach { case (name, dir) =>
          val n = arr.addObject()
          n.put("name", s"dfs.$name"); n.put("type", "file")
          n.put("location", dir); n.put("enabled", true)
        }
        spark.catalog.listDatabases().collect().foreach { db =>
          val n = arr.addObject()
          n.put("name", db.name); n.put("type", "catalog")
          n.put("location", db.locationUri); n.put("enabled", true)
        }
        respond(x, 200, mapper.writeValueAsString(arr))
      } catch {
        case e: Throwable => respond(x, 400, error(
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
      }
    }))
    // GET /logs.json + /logs/<name>?tail=N — Drill's log browser (ref
    // server/rest/LogsResources.java: list the log dir, serve a file's
    // tail). The dir comes from `graft.log.dir` (session conf or system
    // property — Drill reads drill.log.dir the same way); unset = an
    // empty listing, never an error. Tails are BYTE-bounded (default
    // 64 KiB, cap 1 MiB) so a runaway log cannot be pulled through the
    // driver in one response.
    def logDir(): Option[String] =
      spark.conf.getOption("graft.log.dir")
        .orElse(Option(System.getProperty("graft.log.dir")))
    server.createContext("/logs.json", guarded(new HttpHandler {
      override def handle(x: HttpExchange): Unit = try {
        if (x.getRequestMethod != "GET") { respond(x, 405, error("GET only")); return }
        val arr = mapper.createArrayNode()
        logDir().foreach { d =>
          val dir = new java.io.File(d)
          Option(dir.listFiles()).getOrElse(Array.empty)
            .filter(f => f.isFile && (f.getName.endsWith(".log") ||
              f.getName.endsWith(".out") || f.getName.contains(".log.")))
            .sortBy(_.getName).foreach { f =>
              val n = arr.addObject()
              n.put("name", f.getName); n.put("size", f.length())
              n.put("mtime_ms", f.lastModified())
            }
        }
        respond(x, 200, mapper.writeValueAsString(arr))
      } catch {
        case e: Throwable => respond(x, 400, error(
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
      }
    }))
    server.createContext("/logs/", guarded(new HttpHandler {
      override def handle(x: HttpExchange): Unit = try {
        if (x.getRequestMethod != "GET") { respond(x, 405, error("GET only")); return }
        val name = x.getRequestURI.getPath.stripPrefix("/logs/")
        // the listing is the namespace: a name with separators (or any
        // name outside the dir's own listing) never touches the fs —
        // no path traversal out of the log dir
        if (name.contains('/') || name.contains('\\') || name.isEmpty) {
          respond(x, 400, error("bad log name")); return
        }
        val dir = logDir().getOrElse {
          respond(x, 404, error("graft.log.dir is not configured")); return
        }
        val f = new java.io.File(dir, name)
        // the LISTING is the namespace (same suffix filter as
        // /logs.json) — an unlisted name 404s without touching the fs
        val listed = Option(new java.io.File(dir).listFiles())
          .getOrElse(Array.empty).exists(l => l.isFile && l.getName == name &&
            (name.endsWith(".log") || name.endsWith(".out") ||
              name.contains(".log.")))
        if (!listed) { respond(x, 404, error(s"no log file '$name'")); return }
        val tail = Option(x.getRequestURI.getQuery).getOrElse("")
          .split('&').map(_.split("=", 2))
          .collectFirst { case Array("tail", v) => v.toLong }
          .getOrElse(65536L)
        val n = math.min(math.max(tail, 1L), 1048576L)
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val start = math.max(0L, raf.length() - n)
          raf.seek(start)
          val buf = new Array[Byte](math.min(n, raf.length() - start).toInt)
          raf.readFully(buf)
          val bytes = buf
          x.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
          x.sendResponseHeaders(200, bytes.length)
          x.getResponseBody.write(bytes)
          x.close()
        } finally raf.close()
      } catch {
        case e: Throwable => respond(x, 400, error(
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
      }
    }))
    // GET /metrics.json — Drill's metrics endpoint (ref server/rest/
    // MetricsResources.java serving the codahale registry): flat JVM /
    // process gauges an operator's monitoring scrapes — heap, GC,
    // threads, CPU, uptime, plus the engine's live-query count
    server.createContext("/metrics.json", guarded(new HttpHandler {
      override def handle(x: HttpExchange): Unit = try {
        if (x.getRequestMethod != "GET") { respond(x, 405, error("GET only")); return }
        import java.lang.management.ManagementFactory
        val mem = ManagementFactory.getMemoryMXBean
        val th = ManagementFactory.getThreadMXBean
        val rt = ManagementFactory.getRuntimeMXBean
        val os = ManagementFactory.getOperatingSystemMXBean
        val root = mapper.createObjectNode()
        val g = root.putObject("gauges")
        g.put("heap.used", mem.getHeapMemoryUsage.getUsed)
        g.put("heap.max", mem.getHeapMemoryUsage.getMax)
        g.put("non-heap.used", mem.getNonHeapMemoryUsage.getUsed)
        g.put("threads.live", th.getThreadCount)
        g.put("threads.peak", th.getPeakThreadCount)
        g.put("uptime.ms", rt.getUptime)
        g.put("os.load", os.getSystemLoadAverage)
        g.put("cores", os.getAvailableProcessors)
        // O(1) registry size — a DataFrame count would run a Spark job
        // (and post a profile row) per monitoring poll
        g.put("queries.running", RunningQueries.liveCount)
        val gc = root.putObject("gc")
        import scala.jdk.CollectionConverters._
        ManagementFactory.getGarbageCollectorMXBeans.asScala.foreach { b =>
          val n = gc.putObject(b.getName.replace(' ', '_'))
          n.put("count", b.getCollectionCount)
          n.put("time.ms", b.getCollectionTime)
        }
        respond(x, 200, mapper.writeValueAsString(root))
      } catch {
        case e: Throwable => respond(x, 400, error(
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
      }
    }))
    // storage MUTATION (ref server/rest/StorageResources.java PUT/
    // DELETE /storage/{name}.json): register / drop a dfs WORKSPACE at
    // runtime — POST /storage/<name> {"location": dir} sets the
    // graft.dfs.workspace.<name> conf key (the one canonical registry),
    // DELETE /storage/<name> unsets it. An ACL-protected workspace name
    // only mutates for a principal ON its allow-list (re-pointing a
    // protected name at other data would leak it under the grant);
    // fail-closed when the endpoint has no principal channel.
    server.createContext("/storage/", guarded(new HttpHandler {
      override def handle(x: HttpExchange): Unit = try {
        val name = x.getRequestURI.getPath.stripPrefix("/storage/")
          .stripSuffix(".json")
        if (!name.matches("[A-Za-z0-9_]+")) {
          respond(x, 400, error(s"bad workspace name '$name'")); return
        }
        val key = s"graft.dfs.workspace.${name.toLowerCase}"
        // the allow-list check: principal from basic auth (None on the
        // open endpoint); checkWorkspace throws DeniedException for
        // off-list principals, and an ACL'd name with NO principal
        // refuses here explicitly
        val principal = if (credentials.isEmpty) None else authUser(x)
        principal match {
          case Some(u) => AccessControl.runAs(spark, u)(
            AccessControl.checkWorkspace(spark, name))
          case None =>
            if (AccessControl.isWorkspaceProtected(name))
              throw new AccessControl.DeniedException(
                s"workspace '$name' is ACL-protected — mutation needs an " +
                  "authenticated principal on its allow-list")
        }
        x.getRequestMethod match {
          case "POST" | "PUT" =>
            val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
            val loc = Option(mapper.readTree(body))
              .flatMap(n => Option(n.get("location"))).map(_.asText)
              .getOrElse("")
            if (loc.isEmpty) {
              respond(x, 400, error("missing \"location\"")); return
            }
            spark.conf.set(key, loc)
            respond(x, 200,
              s"""{"result":"ok","name":"dfs.$name","location":${
                mapper.writeValueAsString(loc)}}""")
          case "DELETE" =>
            if (spark.conf.getOption(key).isEmpty) {
              respond(x, 404, error(s"no workspace '$name'")); return
            }
            spark.conf.unset(key)
            respond(x, 200, s"""{"result":"ok","dropped":"dfs.$name"}""")
          case _ => respond(x, 405, error("POST, PUT or DELETE"))
        }
      } catch {
        case e: Throwable =>
          respond(x, if (isDenied(e)) 403 else 400, error(
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
      }
    }))
    // ---- human-facing HTML console (reference exec/java-exec/src/main/
    // resources/rest/: index.ftl + profile/list.ftl, served by
    // DrillRestServer) — a minimal static shell over the SAME JSON
    // endpoints above; the JSON contracts are the API, these pages are
    // just eyes on them. Registered under "/" (com.sun HttpServer gives
    // the longer /query, /profiles... contexts precedence) with the
    // profile page under /web/ so it can't shadow the /profiles JSON.
    server.createContext("/", guarded(new HttpHandler {
      override def handle(x: HttpExchange): Unit = try {
        if (x.getRequestMethod != "GET") { respond(x, 405, error("GET only")); return }
        x.getRequestURI.getPath match {
          case "/" | "/index.html" => respondHtml(x, 200, indexHtml)
          case "/web/profiles.html" => respondHtml(x, 200, profilesHtml)
          case p => respond(x, 404, error(s"no such path: $p"))
        }
      } catch {
        case e: Throwable => respond(x, 400, error(
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
      }
    }))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    server.setExecutor(pool)
    server.start()
    new Running(server, pool)
  }

  private def error(msg: String): String = {
    val n = mapper.createObjectNode()
    n.put("errorMessage", msg)
    mapper.writeValueAsString(n)
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private def respondHtml(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private val style =
    """<style>body{font-family:sans-serif;margin:2em;max-width:70em}
      |table{border-collapse:collapse;margin:1em 0}
      |td,th{border:1px solid #999;padding:.25em .6em;text-align:left}
      |textarea{width:100%;font-family:monospace}
      |nav a{margin-right:1.2em}</style>""".stripMargin

  /** index.ftl role: a query box over POST /query + links to every JSON
    * surface. */
  private val indexHtml: String =
    s"""<!doctype html><html><head><title>graft</title>$style</head><body>
       |<h1>graft query console</h1>
       |<nav><a href="/web/profiles.html">profiles</a>
       |<a href="/options.json">options.json</a>
       |<a href="/storage.json">storage.json</a></nav>
       |<form onsubmit="run();return false">
       |<textarea id="q" rows="4">SELECT 1 AS one</textarea><br>
       |<button>Run</button></form><div id="out"></div>
       |<script>
       |// query results are UNTRUSTED data — escape before innerHTML, or
       |// a cell containing markup executes in the console origin
       |function esc(s){return String(s).replace(/&/g,'&amp;')
       | .replace(/</g,'&lt;').replace(/>/g,'&gt;').replace(/"/g,'&quot;')}
       |async function run(){
       | const r=await fetch('/query',{method:'POST',
       |   headers:{'Content-Type':'application/json'},
       |   body:JSON.stringify({query:document.getElementById('q').value})});
       | const j=await r.json();
       | const out=document.getElementById('out');
       | if(j.errorMessage){out.textContent=j.errorMessage;return}
       | let h='<table><tr>'+j.columns.map(c=>'<th>'+esc(c)+'</th>').join('')+'</tr>';
       | for(const row of j.rows){h+='<tr>'+j.columns.map(c=>
       |   '<td>'+(row[c]===undefined?'':esc(row[c]))+'</td>').join('')+'</tr>'}
       | out.innerHTML=h+'</table>';
       |}
       |</script></body></html>""".stripMargin

  /** profile/list.ftl role: the profile ring + per-stage/per-operator
    * depth, fetched from the JSON endpoints. */
  private val profilesHtml: String =
    s"""<!doctype html><html><head><title>graft profiles</title>$style</head>
       |<body><h1>query profiles</h1><nav><a href="/">console</a></nav>
       |<h2>running <button onclick="loadRunning()">refresh</button></h2>
       |<div id="r"></div>
       |<div id="p"></div><h2>stages</h2><div id="s"></div>
       |<h2>operators</h2><div id="o"></div>
       |<script>
       |// profile rows carry user SQL / plan text — escape (see index)
       |function esc(s){return String(s).replace(/&/g,'&amp;')
       | .replace(/</g,'&lt;').replace(/>/g,'&gt;').replace(/"/g,'&quot;')}
       |function tab(rows,extra){
       | if(!rows.length)return '<p>(none — enable profiling)</p>';
       | const cols=Object.keys(rows[0]);
       | let h='<table><tr>'+cols.map(c=>'<th>'+esc(c)+'</th>').join('')
       |   +(extra?'<th></th>':'')+'</tr>';
       | for(const r of rows){h+='<tr>'+cols.map(c=>
       |   '<td>'+(r[c]===undefined?'':esc(r[c]))+'</td>').join('')
       |   +(extra?'<td>'+extra(r)+'</td>':'')+'</tr>'}
       | return h+'</table>';
       |}
       |async function load(id,url){
       | document.getElementById(id).innerHTML=tab(await (await fetch(url)).json());
       |}
       |// the per-row CANCEL button (Drill web UI's cancel link): DELETE
       |// /query/<id> kills the query's running+future jobs
       |async function loadRunning(){
       | const rows=await (await fetch('/queries.json')).json();
       | document.getElementById('r').innerHTML=rows.length?tab(rows,
       |   r=>'<button onclick="cancelQ(\\''+esc(r.query_id)+'\\')">cancel</button>')
       |   :'<p>(no queries running)</p>';
       |}
       |async function cancelQ(id){
       | await fetch('/query/'+encodeURIComponent(id),{method:'DELETE'});
       | loadRunning();
       |}
       |loadRunning();load('p','/profiles');load('s','/profiles/stages');
       |load('o','/profiles/operators');
       |</script></body></html>""".stripMargin
}
