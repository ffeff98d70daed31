package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Dedup

/** Scale demo for the MinHash dedup family (SURVEY §4 / round-3 item 9):
  * runs the cap-engaged banding path on a synthesized sf1-scale corpus
  * (10x the sf0.1 documents) and reports wall clock, bucket-cap audit,
  * and stage-skew evidence (no single-task stage may dominate the run).
  *
  * The synthesis keeps copy 0 as the original (template-dense) corpus
  * and perturbs ~60% of each doc's tokens in copies 1..k-1 with a
  * doc-derived suffix, which drops Jaccard far below the 0.8 threshold
  * for almost all pairs involving a perturbed doc. The result is a mixed
  * corpus — one dense shard + nine sparse shards — so the run exercises
  * BOTH regimes at once: the inherent dense-verify cost stays bounded to
  * the dense shard, while the sparse 90% of the corpus must flow through
  * banding with near-zero candidate survival (the real web-corpus
  * operating point for 100 TB).
  */
object MinhashScaleDemo {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-skew audit: collect (numTasks, wallMs) per completed stage
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val wall = (for {s <- info.submissionTime; c <- info.completionTime}
          yield c - s).getOrElse(0L)
        stages.add((info.numTasks, wall, info.name.takeWhile(_ != '\n')))
      }
    })

    val docs0 = GraftSession.table(spark, src, "documents").select("doc_id", "text")
    // copy k: ids shifted k*1_000_000; tokens perturbed per (token, doc
    // cluster) — deterministic, no rand()
    val scaled = (0 until copies).map { k =>
      val perturbRate = if (k == 0) lit(0) else lit(60) // copy 0 = originals
      docs0.select(
        (col("doc_id") + k * 1000000L).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "),
            t => when(pmod(xxhash64(t, col("doc_id")), lit(100)) < perturbRate,
              concat(t, lit("_"), pmod(col("doc_id"), lit(997)).cast("string")))
              .otherwise(t))).as("text"))
    }.reduce(_ unionAll _)

    val nDocs = scaled.count()
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashNearDups(scaled, "doc_id", "text",
      numHashes = 128, bands = 32, threshold = 0.8, maxBucket = 4096)
    val nPairs = pairs.count()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val capDrops = Dedup.minhashBucketStats(scaled, "doc_id", "text",
      numHashes = 128, bands = 32, maxBucket = 4096).count()

    val totalStageMs = stages.toArray(Array.empty[(Int, Long, String)])
    val singleTaskDominant = totalStageMs
      .filter { case (n, w, _) => n <= 1 && w > wallSec * 1000 * 0.5 }
    val maxStage = totalStageMs.sortBy(-_._2).take(3)
      .map { case (n, w, nm) => s"""{"tasks":$n,"ms":$w,"name":"$nm"}""" }
      .mkString("[", ",", "]")

    println(s"""{"metric":"minhash_sf1_demo","docs":$nDocs,"pairs":$nPairs,""" +
      s""""wall_sec":${f"$wallSec%.1f"},"cap_dropped_buckets":$capDrops,""" +
      s""""single_task_dominant_stages":${singleTaskDominant.length},""" +
      s""""slowest_stages":$maxStage}""")
    spark.stop()
  }
}
