package graft.tools

import graft.GraftSession
import graft.sources.{JdbcEndpoint, TlsSupport}

/** End-to-end proof of TLS on the JDBC front door — run in a FRESH JVM
  * (`sbt "runMain graft.tools.TlsJdbcDemo"`) because HiveServer2 is
  * one-per-JVM and the test suite's shared server runs the NONE/plain
  * posture; this main starts the TLS posture and drives it with the
  * stock hive-jdbc client:
  *
  *  1. a TLS+CUSTOM-auth server accepts `;ssl=true;sslTrustStore=...`
  *     connections and answers queries;
  *  2. a PLAINTEXT client against the same port is refused in the
  *     transport (no cleartext fallback);
  *  3. a recording wire tap between client and server sees the TLS
  *     record layer and NEVER the SASL-PLAIN password — the credential
  *     rides the encrypted channel.
  *
  * Prints one JSON line for BASELINE.md. JKS stores: thrift's
  * TSSLTransportParameters (what hive-jdbc uses under sslTrustStore)
  * predates PKCS12-as-default. */
object TlsJdbcDemo {

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tls_jdbc")
    val ks = s"$dir/server.jks"; val ts = s"$dir/trust.jks"; val pw = "tls-demo-pw"
    TlsSupport.generateKeyStore(ks, ts, pw, storeType = "JKS")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = JdbcEndpoint.start(spark,
      credentials = Map("demo" -> "demo-secret-pw"), ssl = Some((ks, pw)))

    Class.forName("org.apache.hive.jdbc.HiveDriver")
    def connect(port: Int, ssl: Boolean): java.sql.Connection = {
      val url = s"jdbc:hive2://127.0.0.1:$port/default" +
        (if (ssl) s";ssl=true;sslTrustStore=$ts;trustStorePassword=$pw" else "")
      java.sql.DriverManager.getConnection(url, "demo", "demo-secret-pw")
    }

    // 1. TLS query round-trip
    var queryOk = false
    locally {
      val c = connect(server.port, ssl = true)
      try {
        val rs = c.createStatement().executeQuery("SELECT 40 + 2 AS answer")
        rs.next()
        queryOk = rs.getInt(1) == 42
      } finally c.close()
    }

    // 2. plaintext refusal on the TLS port
    val plaintextRefused =
      try { connect(server.port, ssl = false).close(); false }
      catch { case _: java.sql.SQLException => true }

    // 3. wire tap: TLS records visible, password bytes absent
    val captured = new java.io.ByteArrayOutputStream()
    val relay = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val acceptor = new Thread(() =>
      try while (true) {
        val cli = relay.accept()
        val srv = new java.net.Socket("127.0.0.1", server.port)
        def pump(in: java.io.InputStream, out: java.io.OutputStream): Unit = {
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
      } catch { case _: java.io.IOException => () })
    acceptor.setDaemon(true)
    acceptor.start()
    var tappedOk = false
    locally {
      val c = connect(relay.getLocalPort, ssl = true)
      try {
        val rs = c.createStatement().executeQuery("SELECT 7 AS seven")
        rs.next(); tappedOk = rs.getInt(1) == 7
      } finally c.close()
    }
    relay.close()
    val bytes = captured.synchronized(captured.toByteArray)
    val hay = new String(bytes, "ISO-8859-1")
    val tlsRecord = bytes.length > 2 && bytes(0) == 0x16.toByte &&
      bytes(1) == 0x03.toByte
    val passwordOnWire = hay.contains("demo-secret-pw")

    println(s"""{"metric":"tls_jdbc_demo","query_ok":$queryOk,""" +
      s""""plaintext_refused":$plaintextRefused,"tapped_query_ok":$tappedOk,""" +
      s""""tls_record_layer":$tlsRecord,"password_on_wire":$passwordOnWire,""" +
      s""""wire_bytes":${bytes.length}}""")
    require(queryOk && plaintextRefused && tappedOk && tlsRecord &&
      !passwordOnWire, "TLS JDBC demo FAILED — see flags above")
    spark.stop()
    sys.exit(0) // hive keeps non-daemon threads; the demo is done
  }
}
