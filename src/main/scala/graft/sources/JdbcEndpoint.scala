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
    def stop(): Unit =
      server.getClass.getMethod("stop").invoke(server)
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
    * stock Spark thrift server). */
  def start(spark: SparkSession, port: Int = 0): Running = {
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
    val startConf = Map(
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
    Running(p, server)
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
