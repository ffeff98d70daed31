package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RunningQueries

/** Query CANCELLATION and ADMISSION CONTROL — the operator surfaces the
  * r14 verdict ranked #2/#3: a runaway query can be killed through the
  * REST door while the session survives, and the configured queues bound
  * concurrent execution with Drill's queue-then-timeout semantics. */
class RunningQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withQueueConf(kv: (String, String)*)(body: => Unit): Unit = {
    try {
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally
      (kv.map(_._1) :+ "graft.queue.enable").distinct
        .foreach(spark.conf.unset)
  }

  test("cancel end-to-end through the REST door: a long query dies " +
      "mid-run, the submitter sees the cancellation, the session " +
      "survives, sys.profiles records the failure") {
    // pin capacity 50: the profile ring is JVM-wide first-caller-wins
    // and CatalogSpec pins 50 (suite-order independence)
    graft.sources.QueryProfiles.enable(spark, capacity = 50)
    // a genuinely slow distributed query: 2 tasks x 1500 sequential
    // 100 ms sleeps — ~150 s uncancelled, far past this test's budget,
    // so a PASSING test proves the cancel actually killed it. TWO
    // partitions, not four: the /queries.json polls below are Spark
    // jobs themselves and a query occupying every local core starves
    // them into racing the query's runtime
    spark.udf.register("graft_sleep", (ms: Int) => { Thread.sleep(ms); 1 })
    val server = graft.sources.QueryServer.start(spark)
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def http(method: String, path: String, body: Option[String])
          : (Int, String) = {
        val conn = java.net.URI.create(
          s"http://127.0.0.1:${server.port}$path").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod(method)
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
      @volatile var result: (Int, String) = (0, "")
      val t = new Thread(() => result = http("POST", "/query", Some(
        """{"query": "SELECT sum(graft_sleep(100)) AS s FROM range(0, 3000, 1, 2)"}""")))
      t.start()
      // the query must surface in the live registry (GET /queries.json)
      var id = ""
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (id.isEmpty && System.nanoTime() < deadline) {
        val (c, b) = http("GET", "/queries.json", None)
        if (c == 200) {
          val rows = mapper.readTree(b)
          // keep polling until OUR query shows RUNNING (a poll can
          // catch the sub-ms QUEUED->RUNNING transition)
          if (rows.size() > 0 &&
              rows.get(0).get("state").asText == "RUNNING") {
            assert(rows.get(0).get("door").asText == "rest")
            id = rows.get(0).get("query_id").asText
          }
        }
        if (id.isEmpty) Thread.sleep(50)
      }
      assert(id.nonEmpty, "query never appeared in /queries.json")
      // DELETE /query/<id> — the Drill cancel verb
      val (cc, cb) = http("DELETE", s"/query/$id", None)
      assert(cc == 200 && cb.contains(id))
      // the submitter sees a failure PROMPTLY (interrupt-on-cancel —
      // nowhere near the ~10 s the query would run)
      t.join(15000)
      assert(!t.isAlive, "cancelled query's submitter still blocked")
      assert(result._1 == 400, s"expected failed POST, got $result")
      assert(result._2.toLowerCase.contains("cancel"),
        s"error should name the cancellation: ${result._2}")
      // idempotent-ish: cancelling a finished id is a 404, not an error
      assert(http("DELETE", s"/query/$id", None)._1 == 404)
      // the registry is empty again and the SESSION SURVIVES
      assert(mapper.readTree(http("GET", "/queries.json", None)._2).size() == 0)
      val (okCode, okBody) = http("POST", "/query",
        Some("""{"query": "SELECT 1 AS one"}"""))
      assert(okCode == 200 && okBody.contains("\"one\":1"))
      // sys.profiles recorded the cancelled execution as failed — the
      // SQLExecutionEnd event rides the ASYNC listener bus, so poll
      // briefly instead of racing it (the full-suite flake)
      def failedCount() = graft.sources.QueryProfiles.profiles(spark)
        .where("status = 'failed' AND error LIKE '%cancel%'").count()
      val profDeadline = System.nanoTime() + 10L * 1000000000L
      while (failedCount() < 1 && System.nanoTime() < profDeadline)
        Thread.sleep(100)
      assert(failedCount() >= 1, "no failed+cancelled profile row")
      // sys.running_queries resolves as a SQL namespace too
      assert(spark.sql("SELECT * FROM sys.running_queries").columns
        .contains("query_id"))
    } finally server.stop()
  }

  test("authenticated cancellation is OWNER-OR-ADMIN scoped (Drill's " +
      "QueryResources rule): a third user's DELETE is 403, the admin's " +
      "succeeds") {
    spark.udf.register("graft_sleep", (ms: Int) => { Thread.sleep(ms); 1 })
    val server = graft.sources.QueryServer.start(spark,
      credentials = Map("alice" -> "pa", "mallory" -> "pm", "root" -> "pr"))
    graft.sources.AccessControl.grantAdmins(Set("root"))
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def http(method: String, path: String, body: Option[String],
               user: String, pw: String): (Int, String) = {
        val conn = java.net.URI.create(
          s"http://127.0.0.1:${server.port}$path").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod(method)
        conn.setRequestProperty("Authorization", "Basic " +
          java.util.Base64.getEncoder.encodeToString(
            s"$user:$pw".getBytes("UTF-8")))
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
      @volatile var result: (Int, String) = (0, "")
      val t = new Thread(() => result = http("POST", "/query", Some(
        """{"query": "SELECT sum(graft_sleep(100)) AS s FROM range(0, 3000, 1, 2)"}"""),
        "alice", "pa"))
      t.start()
      var id = ""
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (id.isEmpty && System.nanoTime() < deadline) {
        val (c, b) = http("GET", "/queries.json", None, "root", "pr")
        if (c == 200) {
          val rows = mapper.readTree(b)
          if (rows.size() > 0 &&
              rows.get(0).get("state").asText == "RUNNING") {
            assert(rows.get(0).get("user").asText == "alice")
            id = rows.get(0).get("query_id").asText
          }
        }
        if (id.isEmpty) Thread.sleep(50)
      }
      assert(id.nonEmpty, "alice's query never appeared")
      // a NON-owner non-admin may not cancel
      val (mc, mb) = http("DELETE", s"/query/$id", None, "mallory", "pm")
      assert(mc == 403 && mb.contains("may not cancel"), s"$mc $mb")
      // the ADMIN may
      assert(http("DELETE", s"/query/$id", None, "root", "pr")._1 == 200)
      t.join(15000)
      assert(!t.isAlive && result._1 == 400, s"cancel outcome: $result")
    } finally {
      graft.sources.AccessControl.clearPolicy()
      server.stop()
    }
  }

  test("admission queue: with small=1 the second query WAITS for the " +
      "slot and runs after release; cancel wakes a queued query") {
    withQueueConf("graft.queue.enable" -> "true",
      "graft.queue.small" -> "1",
      "graft.queue.timeout_ms" -> "20000") {
      val aIn = new CountDownLatch(1)
      val aRelease = new CountDownLatch(1)
      @volatile var bRan = false
      val a = new Thread(() => RunningQueries.track(spark, "SELECT 1",
        "ua", "test") { aIn.countDown(); aRelease.await() })
      a.start()
      assert(aIn.await(5, TimeUnit.SECONDS))
      val b = new Thread(() => RunningQueries.track(spark, "SELECT 2",
        "ub", "test") { bRan = true })
      b.start()
      // B is queued behind A, not running
      Thread.sleep(400)
      assert(!bRan && RunningQueries.queueLoad._1 == 1)
      val queued = RunningQueries.running(spark)
        .where("state = 'QUEUED'").collect()
      assert(queued.length == 1 &&
        queued(0).getAs[String]("queue_tier") == "small")
      aRelease.countDown()
      b.join(10000)
      assert(bRan, "queued query never ran after the slot freed")
      a.join(5000)
      assert(RunningQueries.queueLoad == ((0, 0)))
    }
  }

  test("a QUEUED query sees a RAISED limit live: setting " +
      "graft.queue.small mid-wait admits it WITHOUT the held slot " +
      "freeing (the limit is re-read every wait quantum, not captured " +
      "at acquire time)") {
    withQueueConf("graft.queue.enable" -> "true",
      "graft.queue.small" -> "1",
      "graft.queue.timeout_ms" -> "20000") {
      val aIn = new CountDownLatch(1)
      val aRelease = new CountDownLatch(1)
      val bIn = new CountDownLatch(1)
      val bRelease = new CountDownLatch(1)
      val a = new Thread(() => RunningQueries.track(spark, "SELECT 1",
        "ua", "test") { aIn.countDown(); aRelease.await() })
      a.start()
      assert(aIn.await(5, TimeUnit.SECONDS))
      val b = new Thread(() => RunningQueries.track(spark, "SELECT 2",
        "ub", "test") { bIn.countDown(); bRelease.await() })
      b.start()
      Thread.sleep(400)
      assert(bIn.getCount == 1 && RunningQueries.queueLoad._1 == 1,
        "B must be queued behind A at limit 1")
      // raise the limit while B is ALREADY waiting — B must start
      // running while A still holds its original slot
      spark.conf.set("graft.queue.small", "2")
      assert(bIn.await(5, TimeUnit.SECONDS),
        "queued query never saw the raised limit")
      assert(RunningQueries.queueLoad._1 == 2)
      bRelease.countDown(); aRelease.countDown()
      a.join(5000); b.join(5000)
      assert(RunningQueries.queueLoad == ((0, 0)))
    }
  }

  test("admission timeout: the N+1th query fails LOUDLY past " +
      "graft.queue.timeout_ms, and timeout 0 rejects immediately") {
    withQueueConf("graft.queue.enable" -> "true",
      "graft.queue.small" -> "1",
      "graft.queue.timeout_ms" -> "300") {
      val aIn = new CountDownLatch(1)
      val aRelease = new CountDownLatch(1)
      val a = new Thread(() => RunningQueries.track(spark, "SELECT 1",
        "ua", "test") { aIn.countDown(); aRelease.await() })
      a.start()
      assert(aIn.await(5, TimeUnit.SECONDS))
      val e = intercept[RunningQueries.AdmissionException] {
        RunningQueries.track(spark, "SELECT 2", "ub", "test")(fail("ran"))
      }
      assert(e.getMessage.contains("queue full") &&
        e.getMessage.contains("graft.queue"))
      spark.conf.set("graft.queue.timeout_ms", "0")
      intercept[RunningQueries.AdmissionException] {
        RunningQueries.track(spark, "SELECT 2", "ub", "test")(fail("ran"))
      }
      aRelease.countDown(); a.join(5000)
    }
  }

  test("queue tiers split by PLAN-estimated input size (Spark stats as " +
      "Drill's planner cost), and ALTER SYSTEM SET round-trips the " +
      "options") {
    // threshold 1 byte: everything is LARGE; the large queue (1 slot)
    // fills while the small queue stays open
    spark.sql("ALTER SYSTEM SET `graft.queue.enable` = true")
    spark.sql("ALTER SYSTEM SET `graft.queue.threshold` = 1")
    spark.sql("ALTER SYSTEM SET `graft.queue.large` = 1")
    spark.sql("ALTER SYSTEM SET `graft.queue.timeout_ms` = 300")
    try {
      assert(spark.conf.get("graft.queue.enable") == "true")
      val aIn = new CountDownLatch(1)
      val aRelease = new CountDownLatch(1)
      val a = new Thread(() => RunningQueries.track(spark,
        "SELECT * FROM range(1000000)", "ua", "test") {
          aIn.countDown(); aRelease.await() })
      a.start()
      assert(aIn.await(5, TimeUnit.SECONDS))
      assert(RunningQueries.queueLoad == ((0, 1)))
      val e = intercept[RunningQueries.AdmissionException] {
        RunningQueries.track(spark, "SELECT 1", "ub", "test")(fail("ran"))
      }
      assert(e.getMessage.contains("large"))
      aRelease.countDown(); a.join(5000)
      // RESET restores the default (queue off) — the option round-trip
      spark.sql("ALTER SYSTEM RESET `graft.queue.enable`")
      assert(spark.conf.getOption("graft.queue.enable").forall(_ != "true"))
      // with the queue off, track() applies no gate at all
      RunningQueries.track(spark, "SELECT 1", "u", "test")(())
    } finally Seq("graft.queue.enable", "graft.queue.threshold",
      "graft.queue.large", "graft.queue.timeout_ms")
      .foreach(spark.conf.unset)
  }
}
