package graft.tools

/** Round-17 scratch probe: list every job a single query submits, with
  * the submitting stack's graft frames — attributes fixed job overhead
  * to call sites. Throwaway. */
object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.GraftSession.getOrCreate()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val det = j.stageInfos.headOption.map(_.details.linesIterator
          .filter(l => l.contains("graft.") || l.contains("Iceberg") ||
            l.contains("DataFrameReader") || l.contains("Dataset"))
          .take(3).mkString(" <- ")).getOrElse("?")
        println(s"JOB ${j.jobId} stages=${j.stageIds.size} $det")
      }
    }
    // one warm run first (mirrors the bench's min-of-reps)
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.addSparkListener(listener)
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(300)
    spark.stop()
  }
}
