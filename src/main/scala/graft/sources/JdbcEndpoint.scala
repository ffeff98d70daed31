package graft.sources

import org.apache.spark.sql.SparkSession

/** JDBC front door — Drill's PRIMARY client surface (reference
  * exec/jdbc/src/main/java/org/apache/drill/jdbc/Driver.java,
  * DrillConnection.java; the jdbc-all distribution module), re-expressed
  * Spark-first: an IN-PROCESS HiveServer2 (Spark's thrift server) bound
  * to the live graft session, so every BI tool that speaks
  * `jdbc:hive2://` gets the whole engine — dfs.`path` queries, the sys
  * and INFORMATION_SCHEMA namespaces, persistent views, graft-native
  * functions — because those all live in the session the server wraps.
  *
  * Off by default, started explicitly like [[QueryServer]]; binds
  * 127.0.0.1 only (same loopback posture as the REST endpoint — a
  * cluster deployment terminates TLS/auth in front). Each connection
  * gets a `newSession()` clone — Drill's per-connection session model —
  * sharing SharedState (catalog tables, persistent views, GLOBAL temp
  * views) and every GraftExtensions rule/function; plain temp views
  * stay session-scoped by definition. NOT singleSession: Spark's
  * session manager force-sets `datetime.java8API.enabled` on every
  * connection open, which under singleSession would silently flip Row
  * timestamp types for all other consumers of the live session.
  * Per-query work executes on the cluster exactly as a spark.sql call
  * would, so the 100 TB posture is the engine's own (the endpoint adds
  * only row STREAMING through thrift's fetch protocol, never a
  * driver-side materialization beyond the client's fetch size).
  */
object JdbcEndpoint {

  final case class Running(port: Int, private val server: AnyRef) {
    def stop(): Unit = {
      server.getClass.getMethod("stop").invoke(server)
      // drop the sessionUser channel's reference: after stop() the
      // registries are dead weight, and reflecting into a stopped
      // server's session map on every ACL check is wasted work (a
      // NEWER server may have replaced the reference — leave that one)
      JdbcEndpoint.synchronized {
        if (liveServer.exists(_ eq server)) liveServer = None
      }
    }
  }

  /** Static credential store for [[GraftPasswdAuth]] — hive instantiates
    * the provider REFLECTIVELY (no-arg, per connection), so the accepted
    * credential map rides a JVM-global here. One server per JVM (the
    * HiveServer2 constraint documented on [[start]]) means one
    * credential set per JVM by construction. */
  @volatile private[sources] var authCredentials: Map[String, String] =
    Map.empty

  /** The live server, for [[sessionUser]] — one per JVM (see start). */
  @volatile private var liveServer: Option[AnyRef] = None

  /** Sentinel principal returned when a LIVE server's session registry
    * cannot be walked (a Spark upgrade renamed the private method or
    * changed the map's value type). It is never on any allow-list, so
    * ACL-protected resources FAIL CLOSED instead of silently open —
    * before this, every reflective break turned all JDBC workspace/view
    * allow-lists into "no principal, allow everything". */
  val UnresolvedPrincipal = "!graft-unresolved-principal"

  /** Log the reflective break ONCE per JVM, loudly — per-resolution
    * logging would flood on a hot ACL path. */
  private val warnedUnresolved = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** TEST SEAM: run `body` with `srv` installed as the live server, so
    * specs can plant a registry whose reflective walk FAILS and assert
    * the fail-closed path without a real HiveServer2 (one per JVM). */
  private[graft] def withLiveServer[T](srv: AnyRef)(body: => T): T = {
    val prev = liveServer
    liveServer = Some(srv)
    try body finally liveServer = prev
  }

  /** The authenticated username of the JDBC connection OWNING `session`
    * — every connection gets an EXCLUSIVE newSession() clone, so session
    * identity IS connection identity. Resolved through the server's own
    * registries (CLIService → SessionManager → the operation manager's
    * sessionToContexts map); None when no JDBC server runs or `session`
    * is not a connection's clone (in-process library use). This is the
    * synchronous principal channel AccessControl uses for JDBC
    * authorization — listener events are async and hive's SessionState
    * thread-local does not reach Spark's async operation threads. */
  def sessionUser(session: SparkSession): Option[String] =
    liveServer.flatMap { srv =>
      try {
        import scala.jdk.CollectionConverters._
        val services = srv.getClass.getMethod("getServices").invoke(srv)
          .asInstanceOf[java.util.Collection[_]].asScala
        services.collectFirst {
          case cli: org.apache.hive.service.cli.CLIService =>
            val sm = cli.getSessionManager
            val om = sm.getOperationManager
            // SparkSQLOperationManager is private[thriftserver] at the
            // Scala level; sessionToContexts is public in bytecode
            val map = om.getClass.getMethod("sessionToContexts").invoke(om)
              .asInstanceOf[java.util.concurrent.ConcurrentHashMap[
                org.apache.hive.service.cli.SessionHandle, SparkSession]]
            map.asScala.collectFirst {
              case (h, s) if s eq session => sm.getSession(h).getUsername
            }
        }.flatten.map(_.trim).filter(_.nonEmpty)
      } catch {
        case e: Exception =>
          // the registry walk THREW with a live server — the private
          // surface changed (ReflectiveOperationException / cast) or a
          // session closed mid-walk. Either way the principal is
          // UNKNOWN, not absent: return the sentinel so configured
          // allow-lists deny rather than wave everything through.
          if (warnedUnresolved.compareAndSet(false, true))
            System.err.println(
              "graft: JDBC principal resolution FAILED against the live " +
                s"HiveServer2 (${e.getClass.getName}: ${e.getMessage}) — " +
                "ACL-protected workspaces/views now fail CLOSED for JDBC " +
                "sessions until this is fixed (incompatible Spark " +
                "thrift-server internals?)")
          Some(UnresolvedPrincipal)
      }
    }

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Start HiveServer2 on `port` (0 = pick a free ephemeral port) against
    * `spark`. Blocks until the thrift socket accepts.
    *
    * ONE server per JVM: HiveServer2 holds JVM-global service state, so
    * after stop() a second start() in the same JVM does not come up —
    * the process lifetime is the server lifetime (same as running the
    * stock Spark thrift server). Consequently the AUTH POSTURE is also
    * one-per-JVM: `credentials` chosen at first start() stick for the
    * process lifetime.
    *
    * `credentials` non-empty enables hive's CUSTOM password
    * authentication (`hive.server2.authentication=CUSTOM` +
    * [[GraftPasswdAuth]]): every connection must present a (user,
    * password) pair from the map or the SASL PLAIN handshake refuses —
    * the minimum for a front door deployable beyond loopback (pair it
    * with TLS termination in front for the wire). Empty (default) keeps
    * hive's NONE mode: any user, loopback-only posture.
    *
    * `maxConcurrentStatements` > 0 bounds how many statements EXECUTE
    * at once on this door — the JDBC half of Drill's workload queues
    * (reference exec/resourcemgr/ThrottledResourceManager.java),
    * re-expressed over HiveServer2's own admission machinery: the async
    * exec pool (`hive.server2.async.exec.threads`) is the executing-
    * statement semaphore, and excess statements WAIT in its bounded
    * queue — exactly Drill's queue-then-run behavior. The REST door's
    * equivalent is the graft.queue.* options ([[RunningQueries]]),
    * which also applies plan-size tiers; thrift's own pool has no
    * cost model, so this door gets the single-queue form.
    *
    * `ssl` = Some((keystorePath, password)) serves the thrift socket
    * over TLS (hive's own `hive.server2.use.SSL` + keystore machinery —
    * the same knobs a standalone HiveServer2 deployment uses; reference
    * Drill ships the equivalent for its doors in
    * exec/.../ssl/SSLConfigServer.java). Generate the keystore with
    * [[TlsSupport.generateKeyStore]]; clients connect with
    * `;ssl=true;sslTrustStore=...;trustStorePassword=...` on the JDBC
    * URL. Like the auth posture, the TLS posture is one-per-JVM: fixed
    * at first start(). */
  def start(spark: SparkSession, port: Int = 0,
            credentials: Map[String, String] = Map.empty,
            maxConcurrentStatements: Int = 0,
            ssl: Option[(String, String)] = None,
            auth: Option[String] = None): Running = {
    // DOCUMENTED REFUSAL — Kerberos/SASL-GSSAPI (the reference's
    // exec/.../rpc/security/kerberos/: KerberosFactory.java wraps
    // hadoop UGI + JAAS around the drillbit RPC). A Kerberos handshake
    // cannot be implemented honestly here: zero-egress means no KDC to
    // authenticate against, so every byte of the GSSAPI token exchange
    // (mutual auth, ticket decryption, replay cache) would ship
    // UNVERIFIED — and an auth path that was never seen succeeding
    // fails closed at a real deployment's first ticket, the worst
    // possible place to discover it. The shipped posture covers the
    // secured-door role: TLS on the thrift channel (`ssl`) + SASL-PLAIN
    // password auth riding it (`credentials`), or terminate Kerberos at
    // a fronting proxy that speaks PLAIN to this door. An explicit
    // request for the unverifiable mode refuses LOUDLY, never silently
    // downgrades.
    auth.map(_.toUpperCase).filter(a => a == "KERBEROS" || a == "GSSAPI")
      .foreach { a =>
        throw new IllegalArgumentException(
          s"JDBC auth mode $a refuses: SASL-GSSAPI needs a reachable " +
            "KDC to validate the token exchange and none exists " +
            "zero-egress — an unverified Kerberos path would fail " +
            "closed at first ticket. Use ssl=Some(keystore) + " +
            "credentials (TLS + SASL-PLAIN over the encrypted channel) " +
            "or terminate Kerberos at a fronting proxy.")
      }
    auth.map(_.toUpperCase).foreach { a =>
      require(a == "NONE" || a == "CUSTOM",
        s"unsupported JDBC auth mode $a (NONE, CUSTOM; KERBEROS/GSSAPI " +
          "is a documented refusal)")
      require((a == "CUSTOM") == credentials.nonEmpty,
        "auth mode and credentials disagree: CUSTOM needs a non-empty " +
          "credentials map, NONE an empty one")
    }
    // NOTE: freePort() is check-then-bind — a foreign process could in
    // principle grab the port between the probe and HiveServer2's bind,
    // in which case awaitPort would accept against the squatter. The
    // window is microseconds on a loopback-only dev/test port; callers
    // that care pass an explicit reserved port.
    val p = if (port == 0) freePort() else port
    // fresh scratch dirs: HiveSessionImpl insists on writable pipeout/
    // scratch paths and the defaults land in shared /tmp locations that
    // may be stale or owned by another user
    val scratch = java.nio.file.Files.createTempDirectory("graft_hs2").toString
    new java.io.File(s"$scratch/scratch").mkdirs()
    new java.io.File(s"$scratch/local").mkdirs()
    // SessionState.newHadoopConf() copies every SQLConf entry into the
    // HiveConf the server is init'd with — the documented way to
    // configure an in-process thrift server. Every key is SNAPSHOT and
    // RESTORED after start: the server keeps its own HiveConf copy, and
    // the endpoint must not leave its private plumbing (ports, scratch
    // dirs) or semantic flips (java8API datetime types, which
    // startWithSparkSession force-sets) in the live session's conf.
    val authConf =
      if (credentials.isEmpty) Map.empty[String, String]
      else {
        authCredentials = credentials
        // hive's CustomAuthenticationProviderImpl constructs a FRESH
        // `new HiveConf()` per connection, which sees hive-site.xml and
        // SYSTEM properties but not the server's conf — the class name
        // must ride a system property to be found (the auth MODE itself
        // reads from the server conf and rides startConf below)
        System.setProperty("hive.server2.custom.authentication.class",
          classOf[GraftPasswdAuth].getName)
        Map("hive.server2.authentication" -> "CUSTOM",
          "hive.server2.custom.authentication.class" ->
            classOf[GraftPasswdAuth].getName)
      }
    val admissionConf =
      if (maxConcurrentStatements <= 0) Map.empty[String, String]
      else Map(
        "hive.server2.async.exec.threads" -> maxConcurrentStatements.toString,
        // the wait queue holds statements past the concurrency bound;
        // 128 is deep enough that a bursty BI tool queues rather than
        // errors, and bounded so a runaway client cannot OOM the door
        "hive.server2.async.exec.wait.queue.size" -> "128")
    val sslConf = ssl match {
      case None => Map.empty[String, String]
      case Some((ksPath, ksPass)) =>
        require(new java.io.File(ksPath).isFile,
          s"JDBC TLS keystore not found: $ksPath")
        Map("hive.server2.use.SSL" -> "true",
          "hive.server2.keystore.path" -> ksPath,
          "hive.server2.keystore.password" -> ksPass)
    }
    val startConf = authConf ++ admissionConf ++ sslConf ++ Map(
      "hive.server2.thrift.port" -> p.toString,
      "hive.server2.thrift.bind.host" -> "127.0.0.1",
      // hive 2.x: webui disabled when port <= 0; operation-log dirs are
      // per-session filesystem noise this embedded server never needs
      "hive.server2.webui.port" -> "0",
      "hive.server2.logging.operation.enabled" -> "false",
      "hive.exec.scratchdir" -> s"$scratch/scratch",
      "hive.exec.local.scratchdir" -> s"$scratch/local")
    val restoreKeys = startConf.keys.toSeq :+
      "spark.sql.datetime.java8API.enabled"
    val before = restoreKeys.map(k => k -> spark.conf.getOption(k)).toMap
    startConf.foreach { case (k, v) => spark.conf.set(k, v) }
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithSparkSession(spark, exitOnError = false)
    restoreKeys.foreach { k =>
      before(k) match {
        case Some(v) => spark.conf.set(k, v)
        case None    => spark.conf.unset(k)
      }
    }
    // FILE-based derby for the per-session metastore boots: the server's
    // HiveConf (copied into every HiveSessionImpl) carries Spark's
    // execution-hive IN-MEMORY derby URL, and hive's SessionState.setupAuth
    // boots a metastore client per JDBC session — create=true against an
    // existing in-memory derby db fails XBM0J from the second session on,
    // and the resulting JDO exception in remote error chains crashes
    // hive-jdbc's exception reconstruction client-side. A file db attaches
    // cleanly on every later boot (datanucleus autoCreateAll is already in
    // the execution-hive conf). Must be set POST-start: the pre-start conf
    // is overridden by newTemporaryConfiguration.
    server.getHiveConf.set("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$scratch/metastore_db;create=true")
    awaitPort(p)
    liveServer = Some(server)
    Running(p, server)
  }

  /** Hive CUSTOM-mode password provider (instantiated reflectively by
    * hive's CustomAuthenticationProviderImpl per connection): accepts a
    * (user, password) pair iff it is in [[JdbcEndpoint.authCredentials]].
    * Constant-time comparison — a password check that short-circuits on
    * the first differing byte leaks prefix length to a timing probe. */
  final class GraftPasswdAuth
      extends org.apache.hive.service.auth.PasswdAuthenticationProvider {
    override def Authenticate(user: String, password: String): Unit = {
      val ok = authCredentials.get(user).exists { expect =>
        java.security.MessageDigest.isEqual(
          expect.getBytes("UTF-8"),
          Option(password).getOrElse("").getBytes("UTF-8"))
      }
      if (!ok)
        throw new javax.security.sasl.AuthenticationException(
          s"invalid credentials for user '$user'")
    }
  }

  private def awaitPort(p: Int, timeoutMs: Long = 30000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var up = false
    while (!up && System.nanoTime() < deadline) {
      try {
        val s = new java.net.Socket()
        try { s.connect(new java.net.InetSocketAddress("127.0.0.1", p), 500); up = true }
        finally s.close()
      } catch { case _: java.io.IOException => Thread.sleep(100) }
    }
    require(up, s"HiveServer2 did not accept on 127.0.0.1:$p within ${timeoutMs}ms")
  }
}
