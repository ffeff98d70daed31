package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanShim

/** Round-16 probe: isolate the dupComponents pointer-doubling join and
  * A/B the physical join strategy (SMJ vs shuffled-hash hint) on a
  * synthetic node table of the bench's sf1 shape (1.5M nodes, 100-long
  * chains). Throwaway measurement harness, not an API.
  */
object CcJoinProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1500000L
    val spark = graft.GraftSession.getOrCreate()
    spark.conf.set("spark.sql.shuffle.partitions", "24")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // node i points 1 back within its 100-chain (the sf1 path shape)
    val m0 = spark.range(n).select(col("id"),
      when(pmod(col("id"), lit(100)) === 0, col("id"))
        .otherwise(col("id") - 1).as("label"))
      .localCheckpoint()
    def doubleOnce(m: org.apache.spark.sql.DataFrame, hint: String) = {
      val y0 = m.select(col("id").as("lid"), col("label").as("llabel"))
      val y = if (hint.isEmpty) y0 else y0.hint(hint)
      PlanShim.freshStats(m.as("x")
        .join(y.as("y"), col("x.label") === col("y.lid"), "left")
        .select(col("x.id").as("id"), col("x.label").as("old"),
          coalesce(col("y.llabel"), col("x.label")).as("label"))
        .localCheckpoint())
    }
    for ((hint, aqe) <- Seq(("shuffle_hash", "true"), ("shuffle_hash", "false"),
        ("shuffle_hash", "true"), ("shuffle_hash", "false"),
        ("shuffle_hash", "true"), ("shuffle_hash", "false"),
        ("shuffle_hash", "true"), ("shuffle_hash", "false"))) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      var m = PlanShim.freshStats(m0.select("id", "label").localCheckpoint())
      val t0 = System.nanoTime()
      var i = 0
      var changed = 1L
      while (changed > 0 && i < 12) {
        val j = doubleOnce(m, hint)
        changed = j.filter(col("label") =!= col("old")).count()
        if (i == 0 && hint.nonEmpty)
          System.err.println(j.queryExecution.executedPlan.toString.take(600))
        PlanShim.unpersistCheckpoint(m)
        m = j.select("id", "label")
        i += 1
      }
      println(f"HINT='$hint' aqe=$aqe doublings=$i wall=${(System.nanoTime() - t0) / 1e9}%.3fs")
      PlanShim.unpersistCheckpoint(m)
    }
    spark.stop()
  }
}
