package graft.tools

/** Round-17 micro-probe: what does one `spark.read.parquet(path)` cost
  * at DataFrame-construction time (driver footer read for schema
  * inference) versus a schema-supplied read, and what does the first
  * action's job overhead look like? Decides whether a session-level
  * schema memo is worth anything for the sub-0.3s bench tail.
  */
object ReadOverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.getOrCreate()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm JVM
    val tables = Seq("lineitem", "orders", "customer", "documents", "events")
    for (rep <- 1 to 3) {
      for (t <- tables) {
        val p = s"$sfDir/$t.parquet"
        val t0 = System.nanoTime()
        val df = spark.read.parquet(p)
        val t1 = System.nanoTime()
        val sch = df.schema
        val df2 = spark.read.schema(sch).parquet(p)
        val t2 = System.nanoTime()
        df2.queryExecution.analyzed // force analysis
        println(f"READ rep=$rep $t%-10s infer=${(t1 - t0) / 1e3}%.0fus " +
          f"withSchema=${(t2 - t1) / 1e3}%.0fus")
      }
    }
    spark.stop()
  }
}
