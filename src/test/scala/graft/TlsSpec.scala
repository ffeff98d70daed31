package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Federation, QueryServer, TlsSupport}

/** Transport security on the REST front door + federation client —
  * r14 verdict item #1. Every client here runs REAL certificate +
  * HOSTNAME verification against the generated self-signed cert's
  * SubjectAlternativeName; there are no trust-all or verify-nothing
  * shortcuts anywhere in this suite. */
class TlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshStores(dnsNames: Seq[String] = Seq("localhost"),
                          ipAddrs: Seq[String] = Seq("127.0.0.1"))
      : (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tls")
    val ks = s"$dir/server.p12"; val ts = s"$dir/trust.p12"
    TlsSupport.generateKeyStore(ks, ts, "graft-tls-pw",
      dnsNames = dnsNames, ipAddrs = ipAddrs)
    (ks, ts, "graft-tls-pw")
  }

  private def httpsPost(url: String, body: String, trustStore: String,
                        pw: String, auth: Option[(String, String)] = None)
      : (Int, String) = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[javax.net.ssl.HttpsURLConnection]
    // custom TRUST anchor only; hostname verification stays the default
    conn.setSSLSocketFactory(
      TlsSupport.clientContext(trustStore, pw).getSocketFactory)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    auth.foreach { case (u, p) =>
      conn.setRequestProperty("Authorization", "Basic " +
        java.util.Base64.getEncoder.encodeToString(
          s"$u:$p".getBytes("UTF-8")))
    }
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val s = new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, s)
  }

  test("REST door over TLS: hostname-verified HTTPS queries work, " +
      "plaintext HTTP is refused, the default CA store rejects the " +
      "self-signed cert, and a wrong-host cert fails verification") {
    val (ks, ts, pw) = freshStores()
    val server = QueryServer.start(spark, tls = Some((ks, pw)))
    try {
      // both SAN forms verify: IP 127.0.0.1 and DNS localhost
      val (c1, b1) = httpsPost(s"https://127.0.0.1:${server.port}/query",
        """{"query": "SELECT 41 + 1 AS answer"}""", ts, pw)
      assert(c1 == 200 && b1.contains("\"answer\":42"))
      val (c2, _) = httpsPost(s"https://localhost:${server.port}/query",
        """{"query": "SELECT 1 AS one"}""", ts, pw)
      assert(c2 == 200)
      // PLAINTEXT refused: an http client on the TLS port dies in the
      // handshake — there is no cleartext fallback listener
      intercept[java.io.IOException] {
        val conn = java.net.URI.create(
          s"http://127.0.0.1:${server.port}/query").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(5000); conn.setReadTimeout(5000)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setDoOutput(true)
        conn.getOutputStream.write(
          """{"query": "SELECT 1 AS one"}""".getBytes("UTF-8"))
        conn.getResponseCode
      }
      // a client WITHOUT the truststore (default CAs) must refuse the
      // self-signed cert — the trust boundary is real
      intercept[javax.net.ssl.SSLHandshakeException] {
        val conn = java.net.URI.create(
          s"https://127.0.0.1:${server.port}/query").toURL
          .openConnection().asInstanceOf[javax.net.ssl.HttpsURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.getOutputStream.write("{}".getBytes("UTF-8"))
        conn.getResponseCode
      }
    } finally server.stop()
    // HOSTNAME verification is live: a cert whose SAN names some other
    // host fails against 127.0.0.1 even with the right trust anchor
    val dir2 = java.nio.file.Files.createTempDirectory("graft_tls_bad")
    val ks2 = s"$dir2/server.p12"; val ts2 = s"$dir2/trust.p12"
    TlsSupport.generateKeyStore(ks2, ts2, "pw2",
      dnsNames = Seq("db.internal.example"), ipAddrs = Seq())
    val server2 = QueryServer.start(spark, tls = Some((ks2, "pw2")))
    try {
      val e = intercept[java.io.IOException] {
        httpsPost(s"https://127.0.0.1:${server2.port}/query",
          """{"query": "SELECT 1 AS one"}""", ts2, "pw2")
      }
      assert(e.isInstanceOf[javax.net.ssl.SSLHandshakeException] ||
        e.isInstanceOf[javax.net.ssl.SSLPeerUnverifiedException],
        s"expected a hostname-verification failure, got $e")
    } finally server2.stop()
  }

  test("basic-auth credentials demonstrably ride the ENCRYPTED channel: " +
      "a wire tap between client and TLS server sees the TLS record " +
      "layer but never the Authorization header or its base64") {
    val (ks, ts, pw) = freshStores()
    val server = QueryServer.start(spark, tls = Some((ks, pw)),
      credentials = Map("alice" -> "s3cret-pw"))
    // a recording RELAY (the wire tap): client -> relay -> TLS server;
    // every byte in both directions lands in `captured`
    val captured = new java.io.ByteArrayOutputStream()
    val relay = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val relayThreads = new AtomicInteger(0)
    val acceptor = new Thread(() =>
      try {
        while (true) {
          val cli = relay.accept()
          val srv = new java.net.Socket("127.0.0.1", server.port)
          def pump(in: java.io.InputStream, out: java.io.OutputStream): Unit = {
            relayThreads.incrementAndGet()
            val t = new Thread(() => try {
              val buf = new Array[Byte](8192)
              var n = in.read(buf)
              while (n >= 0) {
                captured.synchronized(captured.write(buf, 0, n))
                out.write(buf, 0, n); out.flush()
                n = in.read(buf)
              }
            } catch { case _: java.io.IOException => () }
            finally { try cli.close() catch { case _: Exception => () }
                      try srv.close() catch { case _: Exception => () } })
            t.setDaemon(true); t.start()
          }
          pump(cli.getInputStream, srv.getOutputStream)
          pump(srv.getInputStream, cli.getOutputStream)
        }
      } catch { case _: java.io.IOException => () })
    acceptor.setDaemon(true)
    acceptor.start()
    try {
      val (code, body) = httpsPost(
        s"https://127.0.0.1:${relay.getLocalPort}/query",
        """{"query": "SELECT 7 AS seven"}""", ts, pw,
        auth = Some(("alice", "s3cret-pw")))
      assert(code == 200 && body.contains("\"seven\":7"),
        s"authenticated query through the tap failed: $code $body")
      val bytes = captured.synchronized(captured.toByteArray)
      assert(bytes.length > 500, "tap captured nothing")
      // the tap saw a TLS handshake (record type 22 = handshake, 0x16
      // 0x03 major version)...
      assert(bytes(0) == 0x16.toByte && bytes(1) == 0x03.toByte,
        "first captured bytes are not a TLS handshake record")
      val hay = new String(bytes, "ISO-8859-1")
      // ...and NEVER the credentials: not the header name, not the
      // base64 of user:password, not the password itself
      val b64 = java.util.Base64.getEncoder.encodeToString(
        "alice:s3cret-pw".getBytes("UTF-8"))
      assert(!hay.contains("Authorization"), "header name on the wire")
      assert(!hay.contains(b64), "base64 credentials on the wire")
      assert(!hay.contains("s3cret-pw"), "password on the wire")
      assert(!hay.contains("SELECT 7"), "query text on the wire")
    } finally { relay.close(); server.stop() }
  }

  test("federation over TLS: graftPeer queries an https peer through " +
      "the truststore with credentials, refuses cleartext credentials " +
      "to non-loopback, and fails the handshake without the anchor") {
    import spark.implicits._
    Seq((1, "tls"), (2, "peer")).toDF("id", "tag")
      .createOrReplaceTempView("tls_fed_t")
    val (ks, ts, pw) = freshStores()
    val server = QueryServer.start(spark, tls = Some((ks, pw)),
      credentials = Map("fed" -> "fed-pw"))
    try {
      val df = Federation.graftPeer(spark,
        s"https://127.0.0.1:${server.port}",
        "SELECT id, tag FROM tls_fed_t ORDER BY id",
        credentials = Some(("fed", "fed-pw")),
        trustStore = Some((ts, pw)))
      assert(df.count() == 2 &&
        df.where("id = 2").select("tag").collect()(0).getString(0) == "peer")
      // no truststore -> the default CAs refuse the self-signed peer
      intercept[javax.net.ssl.SSLHandshakeException] {
        Federation.graftPeer(spark, s"https://127.0.0.1:${server.port}",
          "SELECT 1 AS one", credentials = Some(("fed", "fed-pw")))
      }
      // cleartext credential refusal (non-loopback http)
      val e = intercept[IllegalArgumentException] {
        Federation.graftPeer(spark, "http://10.1.2.3:8047",
          "SELECT 1 AS one", credentials = Some(("fed", "fed-pw")))
      }
      assert(e.getMessage.contains("CLEARTEXT"))
    } finally server.stop()
  }

  test("the FULL deployment posture composes: TLS + basic auth + " +
      "admission queue + owner-or-admin cancellation, all over the " +
      "encrypted channel") {
    spark.udf.register("graft_sleep", (ms: Int) => { Thread.sleep(ms); 1 })
    val (ks, ts, pw) = freshStores()
    val server = graft.sources.QueryServer.start(spark,
      tls = Some((ks, pw)),
      credentials = Map("alice" -> "pa", "mallory" -> "pm", "root" -> "pr"))
    graft.sources.AccessControl.grantAdmins(Set("root"))
    try {
      spark.conf.set("graft.queue.enable", "true")
      spark.conf.set("graft.queue.small", "1")
      spark.conf.set("graft.queue.timeout_ms", "300")
      def req(method: String, path: String, body: Option[String],
              user: String, p: String): (Int, String) = {
        val conn = java.net.URI.create(
          s"https://127.0.0.1:${server.port}$path").toURL
          .openConnection().asInstanceOf[javax.net.ssl.HttpsURLConnection]
        conn.setSSLSocketFactory(
          TlsSupport.clientContext(ts, pw).getSocketFactory)
        conn.setRequestMethod(method)
        conn.setRequestProperty("Authorization", "Basic " +
          java.util.Base64.getEncoder.encodeToString(
            s"$user:$p".getBytes("UTF-8")))
        body.foreach { b =>
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setDoOutput(true)
          conn.getOutputStream.write(b.getBytes("UTF-8"))
        }
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val s = new String(is.readAllBytes(), "UTF-8")
        conn.disconnect()
        (code, s)
      }
      // alice holds the ONE small-queue slot with a slow query. ONE
      // partition deliberately: the /queries.json polls below are Spark
      // jobs themselves, and a query occupying every local core starves
      // them — the poll then races alice's own runtime (the flake this
      // test shipped with). One task = one core; ~300 s uncancelled, so
      // only the admin's cancel ends it.
      @volatile var aliceResult: (Int, String) = (0, "")
      val t = new Thread(() => aliceResult = req("POST", "/query", Some(
        """{"query": "SELECT sum(graft_sleep(100)) AS s FROM range(0, 3000, 1, 1)"}"""),
        "alice", "pa"))
      t.start()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      var id = ""
      var aliceRow = ""
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (id.isEmpty && System.nanoTime() < deadline) {
        val (c, b) = req("GET", "/queries.json", None, "root", "pr")
        if (c == 200) {
          val rows = mapper.readTree(b)
          if (rows.size() > 0 &&
              rows.get(0).get("state").asText == "RUNNING") {
            id = rows.get(0).get("query_id").asText
            aliceRow = rows.get(0).toString
          }
        }
        if (id.isEmpty) Thread.sleep(50)
      }
      assert(id.nonEmpty, "alice's query never reached RUNNING")
      val loadBefore = graft.sources.RunningQueries.queueLoad
      // the queue is FULL: mallory's query is refused as a retryable 503
      val (qc, qb) = req("POST", "/query",
        Some("""{"query": "SELECT 1 AS one"}"""), "mallory", "pm")
      assert(qc == 503 && qb.contains("queue full"),
        s"$qc $qb — alice's row: $aliceRow loadBefore=$loadBefore")
      // mallory may not cancel alice's query; the admin may
      assert(req("DELETE", s"/query/$id", None, "mallory", "pm")._1 == 403)
      assert(req("DELETE", s"/query/$id", None, "root", "pr")._1 == 200)
      t.join(15000)
      // the cancellation reaches alice either BEFORE her first chunk
      // (status 400) or MID-STREAM — then the status is already 200 and
      // the failure rides the streamed trailer (queryState FAILED +
      // errorMessage), the reference's streamed-error contract
      assert(!t.isAlive, "alice's query never ended after cancel")
      assert(aliceResult._1 == 400 ||
        (aliceResult._1 == 200 &&
          aliceResult._2.contains("\"queryState\":\"FAILED\"") &&
          aliceResult._2.toLowerCase.contains("cancel")),
        s"cancel: $aliceResult")
      // the slot freed: mallory's query now runs — over TLS, authed
      val (okC, okB) = req("POST", "/query",
        Some("""{"query": "SELECT 1 AS one"}"""), "mallory", "pm")
      assert(okC == 200 && okB.contains("\"one\":1"))
    } finally {
      Seq("graft.queue.enable", "graft.queue.small", "graft.queue.timeout_ms")
        .foreach(spark.conf.unset)
      graft.sources.AccessControl.clearPolicy()
      // belt-and-braces: if an assert fired before the cancel, do not
      // leak a 300 s query (and its gate slot) into later suites
      graft.sources.RunningQueries.running(spark)
        .select("query_id").collect().foreach(r =>
          graft.sources.RunningQueries.cancel(spark, r.getString(0),
            "posture-test teardown"))
      server.stop()
    }
  }

  test("generated certificate is structurally sound: the JDK parser " +
      "accepts it, SANs carry the requested names, validity brackets " +
      "now, and both PKCS12 and JKS stores load") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tls_cert")
    TlsSupport.generateKeyStore(s"$dir/k.jks", s"$dir/t.jks", "pw",
      cn = "unit", dnsNames = Seq("localhost", "graft.test"),
      ipAddrs = Seq("127.0.0.1"), storeType = "JKS")
    val ks = java.security.KeyStore.getInstance(
      new java.io.File(s"$dir/k.jks"), "pw".toCharArray)
    assert(ks.getType.equalsIgnoreCase("JKS"))
    val cert = ks.getCertificate("graft")
      .asInstanceOf[java.security.cert.X509Certificate]
    cert.checkValidity() // now inside [notBefore, notAfter]
    assert(cert.getSubjectX500Principal.getName.contains("CN=unit"))
    import scala.jdk.CollectionConverters._
    val sans = cert.getSubjectAlternativeNames.asScala
      .map(l => (l.get(0).asInstanceOf[Int], l.get(1).toString)).toSet
    assert(sans == Set((2, "localhost"), (2, "graft.test"),
      (7, "127.0.0.1")))
    assert(ks.getKey("graft", "pw".toCharArray) != null)
  }
}
