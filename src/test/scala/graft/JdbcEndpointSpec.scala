package graft

import org.scalatest.funsuite.AnyFunSuite

/** The JDBC front door (reference exec/jdbc/.../Driver.java — Drill's
  * primary client surface): an in-process HiveServer2 over the live
  * graft session, exercised through java.sql.DriverManager with the
  * stock hive-jdbc driver, exactly as a BI tool would connect. */
class JdbcEndpointSpec extends AnyFunSuite {
  import TestSpark._

  private def withConn[A](port: Int)(f: java.sql.Connection => A): A = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:hive2://127.0.0.1:$port/default",
      TestSpark.JdbcUser, TestSpark.JdbcPassword)
    try f(conn) finally conn.close()
  }

  test("CUSTOM auth: wrong password and unknown user refuse; right " +
      "credentials connect") {
    val server = TestSpark.jdbcServer
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    def connect(u: String, p: String) = java.sql.DriverManager
      .getConnection(s"jdbc:hive2://127.0.0.1:${server.port}/default", u, p)
    // the SASL PLAIN refusal surfaces client-side as a closed transport
    // (hive-jdbc does not forward the server's auth message on PLAIN)
    intercept[java.sql.SQLException] {
      connect(TestSpark.JdbcUser, "not-the-password").close()
    }
    intercept[java.sql.SQLException] {
      connect("nobody", TestSpark.JdbcPassword).close()
    }
    // anonymous (the pre-auth default) refuses too — NONE mode is off
    intercept[java.sql.SQLException] { connect("anonymous", "").close() }
    // and the real credentials still serve queries
    withConn(server.port) { conn =>
      val rs = conn.createStatement().executeQuery("SELECT 1 + 1")
      assert(rs.next() && rs.getInt(1) == 2)
      rs.close()
    }
  }

  test("JDBC per-user authorization: workspace and view allow-lists " +
      "deny the second authenticated user what only the first holds, " +
      "and sys.profiles records the JDBC principal") {
    import TestSpark.spark
    import spark.implicits._
    val server = TestSpark.jdbcServer
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc_acl").toString
    spark.range(4).toDF("id").write.mode("overwrite").parquet(s"$dir/t.parquet")
    Seq((1, "x")).toDF("k", "v").createOrReplaceGlobalTempView("grafts_view")
    // policy lives in the server-side registry (a JDBC client can SET
    // session conf freely — including the workspace REGISTRATION below,
    // which is location binding, not authorization)
    graft.sources.AccessControl.grantWorkspace("jvault",
      Set(TestSpark.JdbcUser))
    graft.sources.AccessControl.grantView("grafts_view",
      Set(TestSpark.JdbcUser))
    graft.sources.QueryProfiles.enable(spark, capacity = 50)
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    def runAs(u: String, pw: String, sql: String): Either[String, Long] = {
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:hive2://127.0.0.1:${server.port}/default", u, pw)
      try {
        val st = conn.createStatement()
        // per-connection session: register the workspace locally — the
        // ACL (server-side) is what decides whether it resolves
        st.execute(s"SET graft.dfs.workspace.jvault=$dir")
        val rs = st.executeQuery(sql)
        rs.next(); Right(rs.getLong(1))
      } catch {
        case e: java.sql.SQLException =>
          Left(Option(e.getMessage).getOrElse(""))
      } finally conn.close()
    }
    try {
      val wsSql = "SELECT count(*) FROM dfs.jvault.`t.parquet`"
      val viewSql = "SELECT count(*) FROM global_temp.grafts_view"
      // the granted principal reads both
      assert(runAs(TestSpark.JdbcUser, TestSpark.JdbcPassword, wsSql)
        == Right(4L))
      assert(runAs(TestSpark.JdbcUser, TestSpark.JdbcPassword, viewSql)
        == Right(1L))
      // the OTHER authenticated principal is denied both, loudly
      val w = runAs(TestSpark.JdbcUser2, TestSpark.JdbcPassword2, wsSql)
      assert(w.isLeft && w.swap.exists(_.contains("not authorized")), w)
      val v = runAs(TestSpark.JdbcUser2, TestSpark.JdbcPassword2, viewSql)
      assert(v.isLeft && v.swap.exists(_.contains("not authorized")), v)
      // unprotected queries stay open to both
      assert(runAs(TestSpark.JdbcUser2, TestSpark.JdbcPassword2,
        "SELECT 41 + 1").contains(42L))
      // sys.profiles records the JDBC principal (thrift OperationStart
      // joins to the execution through the job group; async listener)
      def userCount(u: String): Long =
        graft.sources.QueryProfiles.profiles(spark)
          .filter(org.apache.spark.sql.functions.col("user") === u).count()
      var tries = 0
      while ((userCount(TestSpark.JdbcUser) == 0 ||
              userCount(TestSpark.JdbcUser2) == 0) && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      assert(userCount(TestSpark.JdbcUser) > 0,
        "profiles must record the primary JDBC principal")
      assert(userCount(TestSpark.JdbcUser2) > 0,
        "profiles must record the second JDBC principal")
    } finally {
      graft.sources.AccessControl.clearPolicy()
      spark.catalog.dropGlobalTempView("grafts_view")
    }
  }

  test("JDBC endpoint serves gate-shaped, dfs, and sys queries with types") {
    // shared endpoint: one HiveServer2 per JVM (see TestSpark.jdbcServer)
    val server = TestSpark.jdbcServer
    locally {
      withConn(server.port) { conn =>
        // (a) a gate-shaped aggregation over a dfs path (the q1_agg plan
        // family), typed through ResultSetMetaData
        val st = conn.createStatement()
        val rs = st.executeQuery(
          s"""SELECT l_returnflag, sum(l_quantity) AS sum_qty,
             |       count(*) AS cnt
             |FROM dfs.`$SF/lineitem.parquet`
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
        val md = rs.getMetaData
        assert(md.getColumnCount == 3)
        assert(md.getColumnName(1) == "l_returnflag")
        assert(md.getColumnName(2) == "sum_qty")
        var flags = List.empty[(String, Double, Long)]
        while (rs.next())
          flags ::= ((rs.getString(1), rs.getDouble(2), rs.getLong(3)))
        rs.close()
        val expect = graft.GraftSession.table(spark, SF, "lineitem")
          .groupBy("l_returnflag")
          .agg(org.apache.spark.sql.functions.sum("l_quantity"),
            org.apache.spark.sql.functions.count("*"))
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
          .sortBy(_._1).toList
        assert(flags.reverse == expect)

        // (b) a plain dfs.`path` row scan
        val rs2 = st.executeQuery(
          s"SELECT r_regionkey, r_name FROM dfs.`$SF/region.parquet` ORDER BY r_regionkey")
        assert(rs2.next() && rs2.getLong(1) == 0L && rs2.getString(2).nonEmpty)
        rs2.close()

        // (c) the sys namespace through SQL (SysResolveRule): graft-native
        // kernels visible over JDBC with correct BOOLEAN typing
        val rs3 = st.executeQuery(
          "SELECT name, className, graft_native FROM sys.functions " +
            "WHERE name = 'cosine_sim'")
        assert(rs3.next())
        assert(rs3.getString(2).startsWith("graft."))
        assert(rs3.getBoolean(3))
        rs3.close()

        // sys.version / information_schema through SQL too
        val rs4 = st.executeQuery("SELECT * FROM sys.version")
        assert(rs4.next())
        rs4.close()
        val rs5 = st.executeQuery(
          "SELECT schema_name FROM information_schema.schemata")
        var schemas = Set.empty[String]
        while (rs5.next()) schemas += rs5.getString(1)
        assert(schemas.contains("default"), schemas)
        rs5.close()

        // JDBC catalog introspection (what BI tools call first)
        val dmd = conn.getMetaData
        val cats = dmd.getSchemas
        var dbs = Set.empty[String]
        while (cats.next()) dbs += cats.getString(1)
        assert(dbs.contains("default"), dbs)

        // errors surface to the client (SQLException in the clean case;
        // hive-jdbc's remote-chain reconstruction can degrade the type,
        // never the liveness), connection stays usable
        val bad = intercept[Exception] {
          st.executeQuery("SELECT definitely_not_a_column FROM sys.version")
        }
        assert(bad.getMessage != null)
        val rs6 = st.executeQuery("SELECT 1 AS one")
        assert(rs6.next() && rs6.getInt(1) == 1)
        rs6.close()

        // temporal types still serve correctly although the endpoint
        // RESTORES the session's java8API datetime conf after start
        // (startWithSparkSession flips it; leaving it flipped changes
        // Row.getTimestamp types for every other session consumer)
        val rs7 = st.executeQuery(
          "SELECT TIMESTAMP '2024-03-05 06:07:08' AS ts, DATE '2024-03-05' AS dt")
        assert(rs7.next())
        assert(rs7.getTimestamp(1).toString == "2024-03-05 06:07:08.0")
        assert(rs7.getDate(2).toString == "2024-03-05")
        rs7.close()
        assert(spark.conf.get("spark.sql.datetime.java8API.enabled",
          "false") == "false")
        st.close()
      }

      // negative bind posture: the server listens on loopback ONLY — a
      // connect to this host's non-loopback address must be refused
      val nonLoop = java.net.NetworkInterface.getNetworkInterfaces
      val addrs = scala.jdk.CollectionConverters
        .EnumerationHasAsScala(nonLoop).asScala
        .flatMap(i => scala.jdk.CollectionConverters
          .EnumerationHasAsScala(i.getInetAddresses).asScala)
        .filter(a => !a.isLoopbackAddress && a.isInstanceOf[java.net.Inet4Address])
        .toList
      addrs.headOption.foreach { a =>
        val s = new java.net.Socket()
        intercept[java.io.IOException] {
          try s.connect(
            new java.net.InetSocketAddress(a.getHostAddress, server.port), 1500)
          finally s.close()
        }
      }
    }
  }

  test("sys and information_schema namespaces resolve in plain spark.sql") {
    // the same rule serves every front door (REST, JDBC, API)
    assert(spark.sql("SELECT * FROM sys.options").count() > 10)
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM sys.functions WHERE graft_native")
      .collect()(0).getLong(0) > 10)
    val tabs = spark.sql("SELECT * FROM information_schema.`tables`")
    assert(tabs.columns.contains("table_name"))
    // unknown table under a claimed head raises Spark's own error class
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM sys.definitely_not_a_table").collect()
    }
    assert(e.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("cannot be found"))
  }

  test("Statement.cancel() kills a running JDBC query mid-flight (the " +
      "Drill client's cancel verb, thrift CancelOperation -> job-group " +
      "kill) — the submitter errors promptly, the connection survives") {
    val server = TestSpark.jdbcServer
    withConn(server.port) { conn =>
      val stmt = conn.createStatement()
      // a genuinely long distributed query: 20e9 hashed rows would run
      // tens of seconds on local[4] — a PASS proves the cancel worked
      @volatile var outcome: Either[Throwable, Long] = Left(null)
      val t0 = System.nanoTime()
      val runner = new Thread(() =>
        outcome =
          try {
            val rs = stmt.executeQuery(
              "SELECT max(xxhash64(id, 'salt')) FROM range(0, 20000000000, 1, 8)")
            rs.next(); Right(rs.getLong(1))
          } catch { case e: Throwable => Left(e) })
      runner.start()
      Thread.sleep(1500) // let it reach the executors
      stmt.cancel()
      runner.join(20000)
      val elapsedSec = (System.nanoTime() - t0) / 1e9
      assert(!runner.isAlive, "submitter still blocked after cancel")
      assert(outcome.isLeft, s"query was not cancelled: $outcome")
      assert(elapsedSec < 20, f"cancel took $elapsedSec%.1f s")
      // the CONNECTION (and the whole session) survives the cancel
      val rs2 = conn.createStatement().executeQuery("SELECT 1 + 1")
      rs2.next()
      assert(rs2.getInt(1) == 2)
    }
  }

  test("Kerberos/SASL-GSSAPI is a DOCUMENTED REFUSAL: an explicit " +
      "request refuses loudly (no KDC zero-egress — an unverified " +
      "auth path must not ship), names the shipped alternative, and " +
      "never silently downgrades; mismatched modes also refuse") {
    val e = intercept[IllegalArgumentException] {
      graft.sources.JdbcEndpoint.start(spark, auth = Some("KERBEROS"))
    }
    assert(e.getMessage.contains("KDC") &&
      e.getMessage.contains("zero-egress") &&
      e.getMessage.contains("SASL-PLAIN"), e.getMessage)
    val g = intercept[IllegalArgumentException] {
      graft.sources.JdbcEndpoint.start(spark, auth = Some("gssapi"))
    }
    assert(g.getMessage.contains("refuses"), g.getMessage)
    // an unknown mode and a mode/credentials mismatch refuse too —
    // never a silent downgrade to NONE
    intercept[IllegalArgumentException] {
      graft.sources.JdbcEndpoint.start(spark, auth = Some("LDAP"))
    }
    intercept[IllegalArgumentException] {
      graft.sources.JdbcEndpoint.start(spark, auth = Some("CUSTOM"))
    }
    intercept[IllegalArgumentException] {
      graft.sources.JdbcEndpoint.start(spark, auth = Some("NONE"),
        credentials = Map("u" -> "p"))
    }
  }

  test("the native drillbit WIRE PROTOCOL is a DOCUMENTED REFUSAL: " +
      "serve() refuses loudly, names the zero-egress interop " +
      "constraint, and points at both shipped doors") {
    val e = intercept[UnsupportedOperationException] {
      graft.sources.WireProtocol.serve()
    }
    assert(e.getMessage.contains("zero-egress") &&
      e.getMessage.contains("JdbcEndpoint") &&
      e.getMessage.contains("QueryServer") &&
      e.getMessage.contains("31010"), e.getMessage)
  }
}
