package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Dedup

/** Scale demo for the PERSISTENT INCREMENTAL dedup indexes
  * (minhashIndexAppend / simhashIndexAppend) — the daily-crawl shape:
  * an sf1-scale corpus (10x the sf0.1 documents, the MinhashScaleDemo
  * synthesis: one dense shard + nine ~60%-perturbed sparse shards)
  * arrives as N successive APPENDS against an on-disk index, and the
  * demo reports per-append wall, pair yield, and stage-skew evidence.
  *
  * What "scales" means here, measured: per-batch work is (new x total)
  * BAND density — never |total|^2, never a re-tokenize of indexed text
  * — so per-append wall must stay near-FLAT as the index grows (the
  * accumulated band table grows linearly but is integer-thin next to
  * the new batch's tokenize cost), and no single-task stage may
  * dominate any append. Batch ids increase with batch number, the
  * capped-equivalence contract of the minhash index.
  *
  * Output: one JSON line per index family with per-append walls +
  * audits, for BASELINE.md.
  */
object IndexAppendScaleDemo {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    // clamp: more batches than copies would produce EMPTY later batches
    // (per caps at 1, range [b*per, min(copies, ...)) empties, and an
    // empty Seq.reduce throws)
    val nBatches = math.min(args.lift(2).map(_.toInt).getOrElse(5),
      math.max(1, copies))
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val wall = (for {s <- info.submissionTime; c <- info.completionTime}
          yield c - s).getOrElse(0L)
        stages.add((info.numTasks, wall))
      }
    })

    val docs0 = GraftSession.table(spark, src, "documents")
      .select("doc_id", "text")
    def copyK(k: Int) = {
      val perturbRate = if (k == 0) lit(0) else lit(60)
      docs0.select(
        (col("doc_id") + k * 1000000L).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "),
            t => when(pmod(xxhash64(t, col("doc_id")), lit(100)) < perturbRate,
              concat(t, lit("_"), pmod(col("doc_id"), lit(997)).cast("string")))
              .otherwise(t))).as("text"))
    }
    // batch b = the copies with k % nBatches == b… NO: ids must
    // INCREASE with batch order (the capped-equivalence contract), so
    // batch b takes the contiguous copy range [b*per, (b+1)*per)
    val per = math.max(1, copies / nBatches)
    // the LAST batch absorbs the remainder so every copy is processed
    // (copies % nBatches != 0 used to drop the tail copies entirely)
    def batchRange(b: Int): Range =
      b * per until (if (b == nBatches - 1) copies
                     else math.min(copies, (b + 1) * per))
    def batch(b: Int) = {
      val r = batchRange(b)
      require(r.nonEmpty, s"empty batch $b (copies=$copies nBatches=$nBatches)")
      r.map(copyK).reduce(_ unionAll _)
    }

    def runFamily(name: String,
                  append: (org.apache.spark.sql.DataFrame, String) => org.apache.spark.sql.DataFrame)
        : String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_${name}_idx")
        .toString
      val walls = Array.newBuilder[Double]
      val pairs = Array.newBuilder[Long]
      val singleTaskDominant = Array.newBuilder[Int]
      (0 until nBatches).foreach { b =>
        stages.clear()
        val t0 = System.nanoTime()
        val p = append(batch(b), dir).count()
        val w = (System.nanoTime() - t0) / 1e9
        walls += w
        pairs += p
        singleTaskDominant += stages.toArray(Array.empty[(Int, Long)])
          .count { case (n, ms) => n <= 1 && ms > w * 1000 * 0.5 }
      }
      val ws = walls.result()
      val nDocs = docs0.count()
      s"""{"metric":"${name}_index_append_demo","batches":$nBatches,""" +
        s""""docs_per_batch":${(0 until nBatches)
          .map(b => batchRange(b).size * nDocs).mkString("[", ",", "]")},""" +
        s""""append_wall_sec":${ws.map(w => f"$w%.1f").mkString("[", ",", "]")},""" +
        s""""pairs":${pairs.result().mkString("[", ",", "]")},""" +
        s""""last_over_first_wall":${f"${ws.last / ws.head}%.2f"},""" +
        s""""single_task_dominant_stages":${
          singleTaskDominant.result().mkString("[", ",", "]")}}"""
    }

    val mh = runFamily("minhash", (df, dir) =>
      Dedup.minhashIndexAppend(df, "doc_id", "text", dir,
        numHashes = 128, bands = 32, threshold = 0.8, maxBucket = 4096))
    println(mh)
    val sh = runFamily("simhash", (df, dir) =>
      Dedup.simhashIndexAppend(df, "doc_id", "text", dir, maxHamming = 3))
    println(sh)
    spark.stop()
  }
}
