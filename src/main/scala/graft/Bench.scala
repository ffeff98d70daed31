package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line
  * to stdout. Queries chosen to exercise the load-bearing plan shapes:
  * scan+agg, broadcast join, multi-join, window, dedup family, ANN.
  *
  * Each query runs REPS times and reports the min — round 3's driver
  * artifact showed ±20-90% run-to-run jitter on sub-second queries,
  * drowning the real round-over-round signal; min-of-3 (all runs also
  * emitted under "runs") keeps the artifact decision-grade.
  */
object Bench {
  /** The 11 original headline queries (round-over-round comparable back
    * to round 1) + round-5 additions at the END, so per-query deltas and
    * prefix totals stay comparable across rounds; BASELINE.md tracks the
    * split. */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_multi_join", "q_broadcast_join", "q_window_running",
    "q_topn", "q_dedup_minhash", "q_dedup_simhash", "q_ann_bruteforce",
    "q_embed_neardup", "q_token_count", "q_sessionize",
    // round 5: exact n-gram decontamination, BM25 scoring, dfs-path SQL
    "q_ngram_decontam", "q_bm25", "q_dfs_sql",
    // round 6: Iceberg v2 merge-on-read, connected-components dedup,
    // as-of join (zero-join window spelling), binned range join
    "q_iceberg_v2", "q_dup_components", "q_asof_join", "q_range_join",
    // round 7: equality-delete merge-on-read, Paimon PK LSM merge,
    // Delta deletion vectors, DSIR gram-model weighting, iceberg CDC
    // changelog (pruned snapshot diffs)
    "q_iceberg_eq_delete", "q_paimon_pk", "q_delta_dv", "q_dsir",
    "q_iceberg_changelog")

  val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // warm the JVM + parquet footers once (not timed per query)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // A failed query must be LOUD: record ok=false and exit non-zero, so a
    // broken headline query can never masquerade as a slow one.
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, runs.map(_._1).min, runs.map(_._1), runs.forall(_._2))
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val allRuns = results.map { case (k, _, rs, _) =>
      "\"" + k + "\":" + rs.map(r => f"$r%.3f").mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, _, ok) => "\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val allOk = results.forall(_._4)
    val line =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"runs":$allRuns,"ok":$oks,"sf":"${
        sfDir.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
    println(line)
    // The stdout line gets buried in sbt [info] noise (rounds 3 and 5 had
    // "parsed": null in the driver artifact) — also persist the metrics to
    // files so grading has a structured copy regardless of log framing.
    val outs = Seq(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"),
      "/tmp/bench.json")
    outs.foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}") }
    }
    spark.stop()
    println(line) // repeat as the true last stdout line, after Spark teardown
    if (!allOk) sys.exit(1)
  }
}
