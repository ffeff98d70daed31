package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AccessControl

/** Policy-registry semantics for the front-door authorization layer —
  * the pure rules the endpoint specs exercise end-to-end. */
class AccessControlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("workspace allow-list: deny off-list principals, admit granted " +
      "ones and principal-less callers; names case-insensitive; empty " +
      "set revokes") {
    try {
      AccessControl.grantWorkspace("MiXeD", Set("bob"))
      // off-list principal denied (case-insensitive name)
      intercept[AccessControl.DeniedException] {
        AccessControl.runAs(spark, "alice")(
          AccessControl.checkWorkspace(spark, "mixed"))
      }
      // granted principal and the principal-less session owner pass
      AccessControl.runAs(spark, "bob")(
        AccessControl.checkWorkspace(spark, "MIXED"))
      AccessControl.checkWorkspace(spark, "mixed")
      // un-listed workspaces are open to any principal
      AccessControl.runAs(spark, "alice")(
        AccessControl.checkWorkspace(spark, "open_ws"))
      // empty set REVOKES the entry
      AccessControl.grantWorkspace("mixed", Set.empty)
      AccessControl.runAs(spark, "alice")(
        AccessControl.checkWorkspace(spark, "mixed"))
    } finally AccessControl.clearPolicy()
  }

  test("impersonation policy: named target, wildcard, self is a no-op, " +
      "absent policy denies, revocation") {
    try {
      AccessControl.allowImpersonation("proxy", Set("bob"))
      assert(AccessControl.effectiveUser(spark, "proxy", Some("bob")) == "bob")
      // self-impersonation needs no policy (identity)
      assert(AccessControl.effectiveUser(spark, "alice", Some("alice"))
        == "alice")
      // blank/absent target = the authenticated user
      assert(AccessControl.effectiveUser(spark, "alice", Some("  "))
        == "alice")
      assert(AccessControl.effectiveUser(spark, "alice", None) == "alice")
      // a target the policy does not name denies
      intercept[AccessControl.DeniedException] {
        AccessControl.effectiveUser(spark, "proxy", Some("carol"))
      }
      // no policy at all denies
      intercept[AccessControl.DeniedException] {
        AccessControl.effectiveUser(spark, "alice", Some("bob"))
      }
      // wildcard admits anyone
      AccessControl.allowImpersonation("root", Set("*"))
      assert(AccessControl.effectiveUser(spark, "root", Some("anyone"))
        == "anyone")
      // revocation
      AccessControl.allowImpersonation("proxy", Set.empty)
      intercept[AccessControl.DeniedException] {
        AccessControl.effectiveUser(spark, "proxy", Some("bob"))
      }
    } finally AccessControl.clearPolicy()
  }

  test("runAs: restores the previous principal on exit (nesting and " +
      "exception paths) and stamps/removes the profile job tag") {
    val sc = spark.sparkContext
    val before = sc.getJobTags()
    AccessControl.runAs(spark, "outer") {
      assert(AccessControl.currentUser(spark).contains("outer"))
      assert(sc.getJobTags().contains(AccessControl.UserTag + "outer"))
      AccessControl.runAs(spark, "inner") {
        assert(AccessControl.currentUser(spark).contains("inner"))
      }
      // inner scope restored the outer principal
      assert(AccessControl.currentUser(spark).contains("outer"))
    }
    assert(AccessControl.currentUser(spark).isEmpty)
    assert(sc.getJobTags() == before)
    // the principal and tag restore even when the body throws
    intercept[RuntimeException] {
      AccessControl.runAs(spark, "thrower") { throw new RuntimeException("x") }
    }
    assert(AccessControl.currentUser(spark).isEmpty)
    assert(sc.getJobTags() == before)
    // a comma in the username cannot corrupt the tag list
    AccessControl.runAs(spark, "a,b") {
      assert(sc.getJobTags().contains(AccessControl.UserTag + "a_b"))
      assert(AccessControl.currentUser(spark).contains("a,b"))
    }
  }

  test("JDBC principal resolution failure FAILS CLOSED: a live server " +
      "whose registry walk throws denies ACL-protected resources " +
      "instead of waving them through, and leaves un-ACL'd ones open") {
    // a planted "server" with no getServices method — the reflective
    // walk throws NoSuchMethodException, the post-upgrade breakage shape
    val broken = new Object()
    graft.sources.JdbcEndpoint.withLiveServer(broken) {
      assert(graft.sources.JdbcEndpoint.sessionUser(spark)
        .contains(graft.sources.JdbcEndpoint.UnresolvedPrincipal))
      try {
        AccessControl.grantWorkspace("secure", Set("bob"))
        val e = intercept[AccessControl.DeniedException] {
          AccessControl.checkWorkspace(spark, "secure")
        }
        assert(e.getMessage.contains("failing closed"))
        // resources WITHOUT an allow-list stay open — fail-closed
        // applies to protected names only, not the whole catalog
        AccessControl.checkWorkspace(spark, "open_ws")
        // an explicit runAs principal (REST path) still wins over the
        // broken JDBC channel — the ThreadLocal is checked first
        AccessControl.runAs(spark, "bob")(
          AccessControl.checkWorkspace(spark, "secure"))
      } finally AccessControl.clearPolicy()
    }
    // seam restored: no live server, no principal
    assert(graft.sources.JdbcEndpoint.sessionUser(spark).isEmpty)
  }
}
