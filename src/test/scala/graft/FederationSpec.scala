package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Federation

/** JDBC federation against embedded Derby (the only RDBMS in the
  * container) — Drill contrib/storage-jdbc behavior: write, read back,
  * and a partitioned parallel read. */
class FederationSpec extends AnyFunSuite {
  import TestSpark._

  // NOTE: never set derby.system.home here — with it set, Derby 10.16
  // mis-parses the `jdbc:derby:memory:;databaseName=...` URL the thrift
  // server's execution-hive uses (the "memory:" subprotocol becomes a
  // literal directory name and every JDBC session open fails XBM0J).
  // derby.log redirection lives in TestSpark instead.
  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JDBC write + read back round-trips") {
    import spark.implicits._
    val df = Seq((1L, 10.5), (2L, 20.25), (3L, 30.0)).toDF("ID", "V")
    Federation.writeJdbc(df, url, "T_ROUNDTRIP")
    val back = Federation.jdbc(spark, url, "T_ROUNDTRIP")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(back == Set((1L, 10.5), (2L, 20.25), (3L, 30.0)))
  }

  test("partitioned JDBC read splits the scan into parallel bounded queries") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("ID", "V")
    Federation.writeJdbc(df, url, "T_PART")
    val part = Federation.jdbcPartitioned(spark, url, "T_PART",
      partitionColumn = "ID", lowerBound = 1, upperBound = 101, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    assert(part.agg(org.apache.spark.sql.functions.sum("V")).collect()(0)
      .getDouble(0) == (1 to 100).map(_ * 2.0).sum)
  }

  test("graft-to-graft federation: query a peer engine's REST endpoint " +
      "and join the result locally (storage-drill role)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the "peer": this session serving its own QueryServer — protocol-wise
    // identical to a remote engine, transport is real HTTP either way
    Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      .toDF("k", "peer_name").createOrReplaceTempView("peer_table")
    val server = graft.sources.QueryServer.start(spark)
    try {
      val remote = Federation.graftPeer(spark,
        s"http://127.0.0.1:${server.port}",
        "SELECT k, peer_name FROM peer_table WHERE k < 2")
      assert(remote.count() === 2)
      val local = Seq((0L, 10.0), (1L, 20.0), (2L, 30.0)).toDF("k", "v")
      val joined = remote.join(local, "k")
      assert(joined.agg(sum("v")).collect()(0).getDouble(0) === 30.0)
      // peer errors carry the peer's message
      val e = intercept[IllegalArgumentException](
        Federation.graftPeer(spark,
          s"http://127.0.0.1:${server.port}", "SELECT * FROM no_such_table"))
      assert(e.getMessage.contains("graft peer error"))
      // zero-row result keeps columns AND types via the shipped schema —
      // the common federated-filter case must still join
      val empty = Federation.graftPeer(spark,
        s"http://127.0.0.1:${server.port}",
        "SELECT k, peer_name FROM peer_table WHERE k > 100")
      assert(empty.count() === 0)
      assert(empty.columns.toSeq == Seq("k", "peer_name"))
      assert(empty.schema("k").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(empty.join(local, "k").count() === 0) // type-compatible join
    } finally server.stop()
    // an AUTH-ENABLED peer: credentials reach it, wrong/absent ones
    // surface the peer's 401 readably, and the peer's ACLs bind to the
    // federating user
    val authed = graft.sources.QueryServer.start(spark,
      credentials = Map("fed" -> "fed-pw"))
    try {
      val ok = Federation.graftPeer(spark,
        s"http://127.0.0.1:${authed.port}",
        "SELECT k FROM peer_table WHERE k = 1",
        credentials = Some(("fed", "fed-pw")))
      assert(ok.count() === 1)
      val denied = intercept[IllegalArgumentException](
        Federation.graftPeer(spark, s"http://127.0.0.1:${authed.port}",
          "SELECT 1 AS one"))
      assert(denied.getMessage.contains("401"), denied.getMessage)
    } finally authed.stop()
  }

  test("graftPeer inherits the streaming bound: a 120k-row federated " +
      "result arrives complete and row-exact off the peer's chunked " +
      "wire, and a cap-shortened result THROWS instead of silently " +
      "returning a partial frame") {
    import org.apache.spark.sql.functions._
    val server = graft.sources.QueryServer.start(spark)
    try {
      val url = s"http://127.0.0.1:${server.port}"
      val big = Federation.graftPeer(spark, url,
        "SELECT id FROM range(120000)", maxRows = 0)
      assert(big.count() === 120000L)
      assert(big.agg(sum("id")).collect()(0).getLong(0) ===
        119999L * 120000L / 2)
      // the explicit cap rides the request; overflowing it is an ERROR
      // (a federated aggregate must be exact), with guidance in the text
      val e = intercept[IllegalArgumentException](
        Federation.graftPeer(spark, url,
          "SELECT id FROM range(120000)", maxRows = 1000))
      assert(e.getMessage.contains("truncated") &&
        e.getMessage.contains("maxRows"), e.getMessage)
    } finally server.stop()
  }

  test("graft-to-graft federation over JDBC: the thrift transport twin") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // GLOBAL temp view: JDBC connections are newSession() clones, so a
    // plain temp view (session-scoped by definition) is invisible there
    Seq((0L, "alpha", 1.5), (1L, "beta", 2.5), (2L, "gamma", 3.5))
      .toDF("k", "peer_name", "w")
      .createOrReplaceGlobalTempView("peer_jdbc_table")
    // shared endpoint: one HiveServer2 per JVM (see TestSpark.jdbcServer)
    val server = TestSpark.jdbcServer
    locally {
      val remote = Federation.graftPeerJdbc(spark, "127.0.0.1", server.port,
        "SELECT k, peer_name, w FROM global_temp.peer_jdbc_table WHERE k < 2",
        user = TestSpark.JdbcUser, password = TestSpark.JdbcPassword)
      // types arrive from ResultSetMetaData, not string re-inference
      assert(remote.schema("k").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(remote.schema("w").dataType ==
        org.apache.spark.sql.types.DoubleType)
      assert(remote.count() === 2)
      val local = Seq((0L, 10.0), (1L, 20.0), (2L, 30.0)).toDF("k", "v")
      assert(remote.join(local, "k").agg(sum("v")).collect()(0)
        .getDouble(0) === 30.0)
      // peer errors surface as SQLException with the peer's message
      intercept[java.sql.SQLException](
        Federation.graftPeerJdbc(spark, "127.0.0.1", server.port,
          "SELECT * FROM no_such_table",
          user = TestSpark.JdbcUser, password = TestSpark.JdbcPassword))
      // zero-row results keep typed columns
      val empty = Federation.graftPeerJdbc(spark, "127.0.0.1", server.port,
        "SELECT k, peer_name FROM global_temp.peer_jdbc_table WHERE k > 100",
        user = TestSpark.JdbcUser, password = TestSpark.JdbcPassword)
      assert(empty.columns.toSeq == Seq("k", "peer_name"))
      assert(empty.join(local, "k").count() === 0)
    }
  }
}
