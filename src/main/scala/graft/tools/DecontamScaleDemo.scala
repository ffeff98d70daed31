package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Dedup

/** Scale demo for EXACT n-gram decontamination (round 5): runs
  * ngramDecontaminate on the same synthesized 10x corpus as the other
  * demos (one template-dense shard + nine perturbed sparse shards)
  * against a fixed-size reference set, and reports wall clock, gram
  * volumes on each side, hit counts, and stage-skew evidence.
  *
  * The claim under test: work scales with CORPUS GRAM COUNT (one
  * map-side-distinct explode + one hash join against the deduplicated
  * reference gram set) — the reference side is constant-size, nothing
  * quadratic appears, and no stage degenerates to a single task. That
  * is the shape that lets the op ride a 100 TB corpus: grams out of the
  * scan as 60-bit longs, join keyed on those longs, reference grams
  * deduplicated once.
  */
object DecontamScaleDemo {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    val scaled = (0 until copies).map { k =>
      val perturbRate = if (k == 0) lit(0) else lit(60)
      docs0.select(
        (col("doc_id") + k * 1000000L).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "),
            t => when(pmod(xxhash64(t, col("doc_id")), lit(100)) < perturbRate,
              concat(t, lit("_"), pmod(col("doc_id"), lit(997)).cast("string")))
              .otherwise(t))).as("text"))
    }.reduce(_ unionAll _)

    // the "benchmark/eval set": the same fixed slice regardless of corpus
    // scale — reference size must NOT grow with the corpus for the claim
    val reference = docs0.filter(col("doc_id") < 50)
    val corpus = scaled.filter(col("doc_id") % 1000000L >= 50)

    val nDocs = corpus.count()
    val t0 = System.nanoTime()
    val hits = Dedup.ngramDecontaminate(corpus, reference, "doc_id", "text", n = 5)
    val (nFlagged, nShared) = {
      val r = hits.agg(count(lit(1)), sum("n_shared")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val wallSec = (System.nanoTime() - t0) / 1e9

    val all = stages.toArray(Array.empty[(Int, Long, String)])
    val singleTaskDominant = all.filter { case (n, w, _) =>
      n <= 1 && w > wallSec * 1000 * 0.5 }
    val maxStage = all.sortBy(-_._2).take(3)
      .map { case (n, w, nm) => s"""{"tasks":$n,"ms":$w,"name":"$nm"}""" }
      .mkString("[", ",", "]")

    println(s"""{"metric":"ngram_decontam_sf1_demo","corpus_docs":$nDocs,""" +
      s""""flagged_docs":$nFlagged,"shared_grams":$nShared,""" +
      s""""wall_sec":${f"$wallSec%.1f"},""" +
      s""""single_task_dominant_stages":${singleTaskDominant.length},""" +
      s""""slowest_stages":$maxStage}""")
    spark.stop()
  }
}
