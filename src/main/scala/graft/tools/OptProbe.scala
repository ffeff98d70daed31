package graft.tools

/** Round-16 optimization probe: time a named subset of SparkEntry.queries
  * in isolation (noop sink, N reps, per-rep wall + executor-CPU) and dump
  * `.explain("formatted")` for each to plans/r16/. The measurement side
  * of the optimization loop — Bench.scala stays the driver contract; this
  * exists so a single query can be iterated on without paying the full
  * 26-query bench wall every cycle.
  *
  * Usage: runMain graft.tools.OptProbe <sfDir> <reps> <outDir> q1 q2 ...
  */
object OptProbe {
  private object CpuListener
      extends org.apache.spark.scheduler.SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      tasks.incrementAndGet()
    }
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageSubmitted(
        s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
      stages.incrementAndGet()
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      sys.props("graft.cc.debug") = "1"
    val sfDir = args(0)
    val reps = args(1).toInt
    val outDir = args(2)
    val names = args.drop(3).toSeq
    new java.io.File(outDir).mkdirs()
    val spark = graft.GraftSession.getOrCreate()
    // ad-hoc session-conf overrides for A/B runs: GRAFT_CONF="k=v;k=v"
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.sparkContext.addSparkListener(CpuListener)
    // warm footers + JIT like Bench does
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      // plan dump (pre-execution AQE plan)
      val plan = q(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        plan.getBytes("UTF-8"))
      val walls = (1 to reps).map { _ =>
        val cpu0 = CpuListener.cpuNs.get
        val j0 = CpuListener.jobs.get; val s0 = CpuListener.stages.get
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(80)
        val cpuS = (CpuListener.cpuNs.get - cpu0) / 1e9
        (wall, cpuS, CpuListener.jobs.get - j0, CpuListener.stages.get - s0)
      }
      val ws = walls.map(w => f"${w._1}%.3f").mkString(",")
      val cs = walls.map(w => f"${w._2}%.1f").mkString(",")
      val js = walls.map(_._3).mkString(",")
      val ss = walls.map(_._4).mkString(",")
      println(s"PROBE $name walls=[$ws] cpu=[$cs] jobs=[$js] stages=[$ss]")
      // post-execution plan: AQE's runtime rewrites (SMJ->SHJ
      // conversion, coalesced reads) only exist in the FINAL adaptive
      // plan, so dump the executed plan of one more run too
      val dfx = q(spark, sfDir)
      dfx.write.format("noop").mode("overwrite").save()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_executed.txt"),
        dfx.queryExecution.executedPlan.toString.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
