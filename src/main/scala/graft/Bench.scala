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

  /** The sf1 HEAVYWEIGHT tier: the five queries whose wall at sf0.1 is
    * real work rather than fixed job overhead — measured once (not
    * min-of-3) on a 10x-scaled corpus so round-over-round deltas carry
    * signal the noise-bound sf0.1 numbers no longer do. */
  val heavyweight: Seq[String] = Seq("q_dedup_minhash", "q_dedup_simhash",
    "q_dup_components", "q_multi_join", "q_dsir")

  /** (steal jiffies, total jiffies) from /proc/stat — host steal%
    * across the bench window makes degraded-host rounds machine-
    * detectable instead of narrative-adjudicated. */
  private def cpuStat(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      val f = try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
              finally src.close()
      (f.lift(7).getOrElse(0L), f.sum)
    } catch { case _: Exception => (0L, 0L) }

  /** Deterministic 10x-scaled corpus derived from sfDir (cached across
    * runs): documents get copy 0 verbatim + 9 copies with ~60% of
    * tokens perturbed per (token, doc) hash — the MinhashScaleDemo
    * recipe, one dense shard + nine sparse shards, the web-corpus
    * operating mix; orders/lineitem replicate with orderkey offsets
    * (join keys stay consistent); dimension-ish tables copy verbatim. */
  private def ensureSf1(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val marker = java.nio.file.Paths.get(dir, "_built_from.txt")
    // cache key includes source (mtime, size): the round driver can
    // regenerate the testdata between runs — a stale 10x corpus would
    // silently bench old data
    val stamp = sfDir + ":" + Seq("documents", "lineitem", "orders").map { t =>
      val f = new java.io.File(s"$sfDir/$t.parquet")
      s"${f.lastModified}/${f.length}"
    }.mkString(",")
    if (java.nio.file.Files.exists(marker) &&
        java.nio.file.Files.readString(marker).trim == stamp) return dir
    new java.io.File(dir).mkdirs()
    val copies = 10
    val docs0 = GraftSession.table(spark, sfDir, "documents")
    val rest = docs0.columns.filterNot(c => c == "doc_id" || c == "text")
    (0 until copies).map { k =>
      val perturbRate = if (k == 0) lit(0) else lit(60)
      docs0.select(Seq((col("doc_id") + k * 10000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => when(pmod(xxhash64(t, col("doc_id")), lit(100)) < perturbRate,
            concat(t, lit("_"), pmod(col("doc_id"), lit(997)).cast("string")))
            .otherwise(t))).as("text")) ++ rest.map(col): _*)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("orders" -> "o_orderkey", "lineitem" -> "l_orderkey").foreach {
      case (t, key) =>
        val base = GraftSession.table(spark, sfDir, t)
        (0 until copies).map { k =>
          base.withColumn(key, col(key) + k * 1000000000L)
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      GraftSession.table(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    java.nio.file.Files.writeString(marker, stamp)
    dir
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val (steal0, jiff0) = cpuStat()
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
    // sf1 heavyweight tier (opt out with SPARK_GRAFT_SF1=0): one rep per
    // query on the 10x corpus. Failures here are LOUD in the artifact
    // (ok:false) but don't fail the bench rc — the tier is auxiliary
    // signal on top of the primary gate-scale numbers.
    val sf1Json =
      if (sys.env.getOrElse("SPARK_GRAFT_SF1", "1") == "0") "null"
      else try {
        val sf1Dir = ensureSf1(spark, sfDir)
        val rs = heavyweight.map { name =>
          val t0 = System.nanoTime()
          val ok =
            try { SparkEntry.queries(name)(spark, sf1Dir)
              .write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] sf1 $name FAILED: ${e.getMessage}"); false }
          (name, (System.nanoTime() - t0) / 1e9, ok)
        }
        val q1 = rs.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
          .mkString("{", ",", "}")
        val ok1 = rs.map { case (k, _, ok) => "\"" + k + "\":" + ok }
          .mkString("{", ",", "}")
        s"""{"total":${f"${rs.map(_._2).sum}%.3f"},"queries":$q1,"ok":$ok1,"copies":10}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sf1 tier failed: ${e.getMessage}")
        "null"
      }
    val (steal1, jiff1) = cpuStat()
    val stealPct =
      if (jiff1 > jiff0) 100.0 * (steal1 - steal0) / (jiff1 - jiff0) else 0.0
    val line =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"runs":$allRuns,"ok":$oks,"steal_pct":${f"$stealPct%.2f"},"sf1":$sf1Json,"sf":"${
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
