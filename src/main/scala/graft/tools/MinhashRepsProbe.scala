package graft.tools

/** Round-17 probe: A/B/C the minhashNearDups collapse-path reps
  * aggregation (r16 verdict item 1) in ONE JVM, alternating variants so
  * host-contention bursts hit all arms equally:
  *   widekey — groupBy(setkey, th).agg(min(id))   (r16 code: array key)
  *   join    — groupBy(setkey).agg(min(id)) + re-attach th on setkey
  *   first   — groupBy(setkey).agg(min(id), first(th))  (pre-r16: SortAgg)
  * Usage: runMain graft.tools.MinhashRepsProbe <sfDir> <reps>
  */
object MinhashRepsProbe {
  private object CpuListener
      extends org.apache.spark.scheduler.SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.getOrCreate()
    spark.sparkContext.addSparkListener(CpuListener)
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val q = graft.SparkEntry.queries("q_dedup_minhash")
    val arms = sys.env.get("GRAFT_PROBE_LENFILTER") match {
      case Some(_) => Seq("join|off", "join|on")   // lenfilter A/B
      case None    => Seq("widekey|on", "join|on", "first|on")
    }
    for (rep <- 1 to reps; arm <- arms) {
      val Array(mode, lf) = arm.split("\\|")
      sys.props("graft.minhash.reps") = mode
      sys.props("graft.minhash.lenfilter") = lf
      val cpu0 = CpuListener.cpuNs.get
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(80)
      val cpuS = (CpuListener.cpuNs.get - cpu0) / 1e9
      println(f"REPS rep=$rep mode=$mode%-7s lenfilter=$lf%-3s wall=$wall%.3f cpu=$cpuS%.1f")
    }
    spark.stop()
  }
}
