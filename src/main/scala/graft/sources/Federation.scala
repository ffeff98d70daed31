package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-system federation — Drill's storage-plugin story (reference:
  * contrib/storage-jdbc/.../JdbcStoragePlugin.java) over Spark's built-in
  * connectors. The JDBC path is exercised in ScalaTest against embedded
  * Derby (the only database shipped in this container); predicate pushdown
  * and partitioned parallel reads come from Spark's JDBC source.
  *
  * (Kafka/Mongo/HTTP plugins have no connector jars in this zero-egress
  * container, so they are intentionally NOT wrapped here — wrapping
  * untestable code would be claim inflation.)
  */
object Federation {

  def jdbcProps(user: String = "graft", password: String = ""): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    if (password.nonEmpty) p.setProperty("password", password)
    p
  }

  /** Read a whole table over JDBC. */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned parallel JDBC read — each Spark task issues its own
    * bounded query (Drill parallelizes the same way via fragment minor
    * IDs). Required posture for any JDBC table big enough to matter. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int,
                      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Write a DataFrame out as a JDBC table (Drill CTAS into a plugin). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Properties = new Properties()): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  /** Query a PEER graft engine's REST endpoint as a table — Drill's
    * drill-on-drill storage plugin (reference: contrib/storage-drill/
    * .../plugin/DrillStoragePlugin.java), where one cluster federates
    * queries to another over its query API. The peer runs
    * [[QueryServer]]; this side POSTs `{"query": sql}` and re-reads the
    * JSON rows as a DataFrame that joins with anything local.
    * The transfer is driver-side by design: the peer's endpoint is
    * maxRows-bounded (serving surface, not bulk export — same posture as
    * the peer's own REST contract; bulk movement belongs on a shared
    * filesystem/CTAS path). Errors surface with the peer's message. */
  /** [[graftPeer]]'s twin over the peer's JDBC (thrift) endpoint — the
    * transport Drill's storage-drill plugin actually uses (its RPC
    * layer; here the peer serves [[JdbcEndpoint]]). Same driver-side,
    * maxRows-bounded serving posture as the REST transport; result
    * types come from the peer's ResultSetMetaData instead of JSON
    * re-typing, so numeric/boolean/timestamp columns arrive typed.
    * `user`/`password` authenticate against a peer running CUSTOM auth
    * ([[JdbcEndpoint.start]]); the defaults match a NONE-mode peer. */
  def graftPeerJdbc(spark: SparkSession, host: String, port: Int,
                    sql: String, maxRows: Int = 10000,
                    user: String = "anonymous",
                    password: String = ""): DataFrame = {
    import org.apache.spark.sql.types._
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:hive2://$host:$port/default", user, password)
    try {
      val st = conn.createStatement()
      st.setMaxRows(maxRows)
      val rs = st.executeQuery(sql)
      val md = rs.getMetaData
      val n = md.getColumnCount
      import java.sql.Types._
      val fields = (1 to n).map { i =>
        val dt = md.getColumnType(i) match {
          case BIGINT                       => LongType
          case INTEGER                      => IntegerType
          case SMALLINT                     => ShortType
          case TINYINT                      => ByteType
          case DOUBLE | FLOAT               => DoubleType
          case REAL                         => FloatType
          case BOOLEAN | BIT                => BooleanType
          case DECIMAL | NUMERIC =>
            // some drivers report precision 0 (computed columns) — and
            // DecimalType requires 0 <= scale <= precision, so the scale
            // clamps WITH it (precision 0 + scale 2 would throw)
            val p = math.max(1, md.getPrecision(i))
            DecimalType(p, math.min(math.max(0, md.getScale(i)), p))
          case DATE                         => DateType
          case TIMESTAMP                    => TimestampType
          case _                            => StringType
        }
        StructField(md.getColumnLabel(i), dt, nullable = true)
      }
      val schema = StructType(fields)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      while (rs.next()) {
        val vals = (1 to n).map { i =>
          val v: Any = fields(i - 1).dataType match {
            case LongType      => rs.getLong(i)
            case IntegerType   => rs.getInt(i)
            case ShortType     => rs.getShort(i)
            case ByteType      => rs.getByte(i)
            case DoubleType    => rs.getDouble(i)
            case FloatType     => rs.getFloat(i)
            case BooleanType   => rs.getBoolean(i)
            case _: DecimalType => rs.getBigDecimal(i)
            case DateType      => rs.getDate(i)
            case TimestampType => rs.getTimestamp(i)
            case _             => rs.getString(i)
          }
          if (rs.wasNull()) null else v
        }
        buf += org.apache.spark.sql.Row(vals: _*)
      }
      rs.close(); st.close()
      spark.createDataFrame(
        spark.sparkContext.parallelize(buf.toSeq, math.max(1, buf.size / 5000 + 1)),
        schema)
    } finally conn.close()
  }

  /** `trustStore` = Some((path, password)): trust exactly that PKCS12
    * truststore for an `https://` peer (the TlsSupport pair of the
    * peer's keystore) — hostname verification stays the platform
    * default, so the peer's cert SAN must really name the host. Without
    * it, https peers validate against the JVM's default CA store.
    *
    * The peer STREAMS its result (chunked transfer; QueryServer) and
    * this side parses it INCREMENTALLY off the wire — no full-response
    * String ever materializes here; the rows themselves do (the
    * federated-aggregate contract: results are driver-local), bounded
    * EXPLICITLY by `maxRows`, which rides the request so the peer stops
    * producing at the cap. A result the cap actually shortened THROWS —
    * a federated aggregate must be exact; raise `maxRows` (0 = no cap)
    * or push more of the aggregation down into `sql`. */
  def graftPeer(spark: SparkSession, baseUrl: String, sql: String,
                credentials: Option[(String, String)] = None,
                trustStore: Option[(String, String)] = None,
                maxRows: Int = 10000): DataFrame = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // credentials ride a Basic header — REFUSE to send them in clear
    // over a non-loopback http:// peer (the loopback posture is
    // documented on QueryServer; enforce it where the password leaves)
    credentials.foreach { _ =>
      val u = java.net.URI.create(baseUrl)
      val scheme = Option(u.getScheme).map(_.toLowerCase).getOrElse("")
      val host = Option(u.getHost).map(_.toLowerCase).getOrElse("")
      val loopback = host == "127.0.0.1" || host == "localhost" ||
        host == "::1" || host == "[::1]"
      require(scheme == "https" || loopback,
        s"graftPeer: refusing to send Basic credentials in CLEARTEXT to " +
          s"non-loopback '$baseUrl' — use https:// (with trustStore) " +
          "or a loopback peer")
    }
    val conn = java.net.URI.create(s"$baseUrl/query").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    (conn, trustStore) match {
      case (h: javax.net.ssl.HttpsURLConnection, Some((path, pw))) =>
        h.setSSLSocketFactory(TlsSupport.clientContext(path, pw).getSocketFactory)
      case _ => ()
    }
    conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
    // a basic-auth-enabled peer (QueryServer `credentials`) is
    // unreachable without this — the peer's ACLs then apply to the
    // FEDERATING user, exactly like any other client of that peer
    credentials.foreach { case (u, pw) =>
      conn.setRequestProperty("Authorization", "Basic " +
        java.util.Base64.getEncoder.encodeToString(
          s"$u:$pw".getBytes("UTF-8")))
    }
    conn.setDoOutput(true)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000) // a peer mid-query is slow, not dead
    val payload = mapper.createObjectNode()
    payload.put("query", sql)
    if (maxRows > 0) payload.put("maxRows", maxRows)
    conn.getOutputStream.write(mapper.writeValueAsBytes(payload))
    val code = conn.getResponseCode
    val ok = code < 400
    if (!ok) {
      // a proxy/LB error may have an EMPTY body (errorStream null) or a
      // non-JSON one (HTML error page) — surface the status + whatever
      // text exists rather than NPE/JsonProcessingException
      val body = Option(conn.getErrorStream)
        .map(s => try new String(s.readAllBytes(), "UTF-8") finally s.close())
        .getOrElse("")
      conn.disconnect()
      val msg = (try Option(mapper.readTree(body))
        .flatMap(n => Option(n.get("errorMessage")).map(_.asText))
      catch { case _: Exception => None })
        .getOrElse(if (body.isEmpty) "empty error body" else body.take(500))
      throw new IllegalArgumentException(s"graft peer error (HTTP $code): $msg")
    }
    // ---- incremental parse of the STREAMED response: rows are read one
    // at a time off the chunked wire (never a whole-body String), and
    // the trailer fields (queryState / errorMessage / truncated) arrive
    // after the rows — a mid-stream peer failure or a cap-shortened
    // result throws AFTER the wire is drained, never silently returns
    // a partial frame
    import com.fasterxml.jackson.core.JsonToken
    var schemaDdl: Option[String] = None
    var state: Option[String] = None
    var errMsg: Option[String] = None
    var truncated = false
    var sawRows = false
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val p = mapper.getFactory.createParser(conn.getInputStream)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT)
          throw new IllegalArgumentException(
            "graft peer returned 200 without a JSON object body")
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          val field = p.currentName()
          p.nextToken() // onto the value
          field match {
            case "rows" =>
              sawRows = true
              while (p.nextToken() != JsonToken.END_ARRAY)
                rows += mapper.readTree(p).toString
            case "schema"       => schemaDdl = Some(p.getText)
            case "queryState"   => state = Some(p.getText)
            case "errorMessage" => errMsg = Some(p.getText)
            case "truncated"    => truncated = p.getBooleanValue
            case _              => p.skipChildren() // columns, rowCount
          }
        }
      } finally { p.close(); conn.disconnect() }
    } catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        // a 200 that isn't the graft response shape (a proxy, a
        // non-graft service) must error readably, not NPE
        throw new IllegalArgumentException(
          s"graft peer returned 200 with unparseable body: ${e.getMessage}")
    }
    if (errMsg.isDefined || state.contains("FAILED"))
      throw new IllegalArgumentException(
        "graft peer error: " + errMsg.getOrElse("queryState FAILED"))
    if (!sawRows)
      throw new IllegalArgumentException(
        "graft peer returned 200 without a rows field")
    if (truncated)
      throw new IllegalArgumentException(
        s"graft peer result exceeded maxRows=$maxRows and was truncated " +
          s"at ${rows.size} rows — a federated result must be exact: " +
          "raise maxRows (0 = no cap) or push more aggregation into the " +
          "peer SQL")
    import spark.implicits._
    // the peer sends its result schema since round 10 — zero-row results
    // (the common case for federated filters) then keep their columns
    // and types instead of failing JSON inference; older peers without
    // the field fall back to inference
    schemaDdl match {
      case Some(ddl) =>
        spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
          .json(spark.createDataset(rows.toSeq))
      case None => spark.read.json(spark.createDataset(rows.toSeq))
    }
  }

  /** REST endpoint as a table (Drill contrib/storage-http): each URL —
    * typically one per page of a paginated API — is fetched by an
    * executor task, so pagination IS the parallelism. Responses are
    * JSON-lines; schema inference runs over the combined dataset.
    * (Exercised in ScalaTest against an in-process HTTP server — this
    * container has no egress.)
    *
    * `oauth` enables Drill's OAuth flow (reference exec/oauth/
    * PersistentTokenTable.java + server/rest/OAuthRequests.java): every
    * fetch carries `Authorization: Bearer <token>` from the persisted
    * token table ([[OAuth.currentToken]] bootstraps or refreshes as
    * needed), and a 401 MID-READ — the token expired between pages —
    * refreshes through the provider and retries that page ONCE, so a
    * long paginated read survives token expiry without re-fetching
    * completed pages. */
  def httpJsonLines(spark: SparkSession, urls: Seq[String],
                    schemaDdl: Option[String] = None,
                    oauth: Option[OAuth.Config] = None,
                    credentialSource: Option[String] = None): DataFrame = {
    import spark.implicits._
    // per-user credential translation (`credentialSource` names the
    // registered source; Drill's USER_TRANSLATION authMode, reference
    // server/rest/CredentialResources.java): the EFFECTIVE principal's
    // own credentials resolve ON THE DRIVER, inside the front door's
    // runAs scope — executors then carry the resolved per-user config
    // (own client pair, own partitioned token file, own Basic pair) in
    // the task closure. An unauthenticated caller, or a principal with
    // nothing stored, fails loudly HERE — before any fetch, never via
    // a shared-identity fallback.
    val effOauth = credentialSource match {
      case Some(src) => oauth.map(UserCredentials.resolveOAuth(spark, src, _))
      case None      => oauth
    }
    val basic = credentialSource.flatMap(
      src => UserCredentials.resolveBasic(spark, src))
    // warm the token table ONCE on the driver before any task runs: a
    // cold start otherwise bootstraps once PER TASK (a thousand
    // client_credentials grants on a wide read — providers rate-limit
    // exactly that); executors then just read the persisted token
    effOauth.foreach(OAuth.currentToken)
    val parallelism = math.max(1, math.min(math.max(urls.size, 1), 32))
    val raw = spark.createDataset(urls).repartition(parallelism)
      .mapPartitions { it =>
        def readLines(in: java.io.InputStream): Vector[String] =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            .linesIterator.filter(_.nonEmpty).toVector
          finally in.close()
        def open(u: String, token: Option[String]) = {
          // timeouts: one stalled endpoint otherwise hangs the task (and
          // the query) forever — same bounds graftPeer sets
          val conn = new java.net.URI(u).toURL.openConnection()
          conn.setConnectTimeout(10000)
          conn.setReadTimeout(120000)
          // the per-user Basic pair; a Bearer token (set after) wins
          // when the source speaks both
          basic.foreach { case (bu, bp) =>
            conn.setRequestProperty("Authorization", "Basic " +
              java.util.Base64.getEncoder.encodeToString(
                s"$bu:$bp".getBytes("UTF-8")))
          }
          token.foreach(t =>
            conn.setRequestProperty("Authorization", s"Bearer $t"))
          conn
        }
        it.flatMap { u =>
          open(u, effOauth.map(OAuth.currentToken)) match {
            case h: java.net.HttpURLConnection =>
              val code = h.getResponseCode
              if (code == 401 && effOauth.isDefined) {
                // expired/revoked mid-pagination: refresh-and-persist,
                // retry THIS page once (executor-side, no driver trip)
                Option(h.getErrorStream).foreach(_.close())
                h.disconnect()
                val retry = open(u, Some(OAuth.refreshAfter401(effOauth.get)))
                  .asInstanceOf[java.net.HttpURLConnection]
                val rc = retry.getResponseCode
                if (rc >= 400) throw new IllegalStateException(
                  s"HTTP $rc fetching $u after OAuth refresh")
                readLines(retry.getInputStream)
              } else if (code >= 400)
                throw new IllegalStateException(s"HTTP $code fetching $u")
              else readLines(h.getInputStream)
            case other => readLines(other.getInputStream) // file: etc.
          }
        }
      }
    schemaDdl match {
      case Some(ddl) =>
        spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
          .json(raw)
      case None =>
        // zero total lines (empty urls, all-empty pages — a normal
        // paginated last-page shape) cannot infer a schema; surface a
        // CLEAR error pointing at the schema parameter instead of
        // Spark's unable-to-infer failure
        val df = spark.read.json(raw)
        if (df.schema.isEmpty)
          throw new IllegalArgumentException(
            "httpJsonLines: no JSON rows to infer a schema from (empty " +
              "responses?) — pass schemaDdl for a typed empty result")
        df
    }
  }
}
