package graft.tools

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanShim
import org.apache.spark.storage.StorageLevel

/** Round-17 probe: A/B the dupComponents pointer-doubling LOOP LEVEL —
  * the current per-doubling DataFrame join (shuffle_hash hint +
  * lazy localCheckpoint + count, re-planned by Catalyst every round)
  * against an RDD loop with a PINNED HashPartitioner, where the lookup
  * side of every doubling join is already partitioned by the join key
  * (zero shuffle on that side), nothing is re-planned, and the
  * convergence count rides a LongAccumulator inside the one
  * materializing job. Synthetic sf1 shape (1.5M nodes, 100-chains),
  * alternating reps in one JVM. Throwaway measurement harness.
  */
object CcRddProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1500000L
    val spark = graft.GraftSession.getOrCreate()
    spark.conf.set("spark.sql.shuffle.partitions", "24")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val sc = spark.sparkContext
    val m0 = spark.range(n).select(col("id"),
      when(pmod(col("id"), lit(100)) === 0, col("id"))
        .otherwise(col("id") - 1).as("label"))
      .localCheckpoint()

    // the current production shape: DF join per doubling
    def dfLoop(): (Int, Double) = {
      var m = PlanShim.freshStats(m0.select("id", "label").localCheckpoint())
      val t0 = System.nanoTime()
      var i = 0; var changed = 1L
      while (changed > 0 && i < 16) {
        val j = PlanShim.freshStats(m.as("x")
          .join(m.select(col("id").as("lid"), col("label").as("llabel"))
            .hint("shuffle_hash").as("y"),
            col("x.label") === col("y.lid"), "left")
          .select(col("x.id").as("id"), col("x.label").as("old"),
            coalesce(col("y.llabel"), col("x.label")).as("label"))
          .localCheckpoint(eager = false))
        changed = j.filter(col("label") =!= col("old")).count()
        PlanShim.unpersistCheckpoint(m)
        m = j.select("id", "label")
        i += 1
      }
      PlanShim.unpersistCheckpoint(m)
      (i, (System.nanoTime() - t0) / 1e9)
    }

    // candidate: RDD loop, pinned partitioner, accumulator convergence
    def rddLoop(parts: Int): (Int, Double) = {
      val part = new HashPartitioner(parts)
      val t0 = System.nanoTime()
      var m = m0.select("id", "label").rdd
        .map(r => (r.getLong(0), r.getLong(1)))
        .partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      m.count()
      var i = 0; var changed = 1L
      while (changed > 0 && i < 16) {
        val acc = sc.longAccumulator
        val nm = m.map { case (id, l) => (l, id) }
          .partitionBy(part)
          .join(m) // m side co-partitioned: no shuffle
          .map { case (l, (id, ll)) =>
            if (ll != l) acc.add(1); (id, ll) }
          .partitionBy(part)
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        nm.count()
        changed = acc.value
        m.unpersist(false)
        m = nm
        i += 1
      }
      // sanity: component label must be the chain head everywhere
      val bad = m.filter { case (id, l) => l != id - (id % 100) }.count()
      m.unpersist(false)
      if (bad != 0) System.err.println(s"RDD LOOP WRONG: $bad bad labels")
      (i, (System.nanoTime() - t0) / 1e9)
    }

    def withConf(parts: Int, aqe: Boolean)(f: => (Int, Double)): (Int, Double) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      try f finally {
        spark.conf.set("spark.sql.shuffle.partitions", "24")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    for (rep <- 1 to 4) {
      val (_, a) = withConf(24, aqe = true)(dfLoop())
      val (_, b) = withConf(24, aqe = false)(dfLoop())
      val (_, c) = withConf(8, aqe = false)(dfLoop())
      val (_, d) = withConf(4, aqe = false)(dfLoop())
      val (_, e) = withConf(32, aqe = false)(dfLoop())
      val (_, r) = withConf(8, aqe = false)(rddLoop(8))
      println(f"rep=$rep DF/aqe24=$a%.3f DF/24=$b%.3f DF/8=$c%.3f " +
        f"DF/4=$d%.3f DF/32=$e%.3f RDD/8=$r%.3f")
    }
    spark.stop()
  }
}
