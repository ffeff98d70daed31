package graft

import org.scalatest.funsuite.AnyFunSuite

/** Probabilistic sketch structures (Drill ships HLL + t-digest, gated in
  * q_approx_distinct / q_approx_percentile; bloom + count-min round out
  * the family via Spark's built-in sketches). */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("bloom filter: no false negatives, bounded false positives") {
    val orders = GraftSession.table(spark, SF, "orders")
    val keys = orders.select("o_orderkey").limit(500).collect().map(_.getLong(0))
    val bf = orders.stat.bloomFilter("o_orderkey", 6000, 0.03)
    assert(keys.forall(bf.mightContain), "bloom filters never have false negatives")
    val absent = (1000000L to 1001000L)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp < 0.10, s"false positive rate $fp out of bounds")
  }

  test("count-min sketch: heavy-hitter estimate within epsilon") {
    val li = GraftSession.table(spark, SF, "lineitem")
    val total = li.count()
    val actual = li.filter(li("l_returnflag") === "N").count()
    val cms = li.stat.countMinSketch("l_returnflag", eps = 0.01,
      confidence = 0.95, seed = 42)
    val est = cms.estimateCount("N")
    assert(est >= actual, "count-min never underestimates")
    assert(est <= actual + (0.01 * total).toLong + 1,
      s"estimate $est too far from $actual")
  }
}
