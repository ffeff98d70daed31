package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Dedup

/** Scale demo for the 64-bit simhash near-dup path (round-4 scale fix):
  * runs simhashNearDups64 with the per-bucket cap ENGAGED on the same
  * synthesized sf1-scale corpus as MinhashScaleDemo (one template-dense
  * shard + nine perturbed sparse shards) and reports wall clock, the
  * bucket-occupancy distribution of the 4 x 16-bit blocking keyspace,
  * the cap audit, and stage-skew evidence.
  *
  * The claim under test: blocking keyspace grows with signature entropy
  * (262,144 possible buckets), so bucket population — and with it the
  * block self-join's candidate count — stays flat as the corpus grows,
  * where the old 4 x 8-bit scheme (1,024 buckets max) forced ~N²/256
  * comparisons. The report includes max/p99 bucket sizes to make the
  * occupancy shape visible, not just the wall clock.
  */
object SimhashScaleDemo {

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

    val nDocs = scaled.count()
    val cap = 4096
    val t0 = System.nanoTime()
    val pairs = Dedup.simhashNearDups64(scaled, "doc_id", "text",
      maxHamming = 3, maxBucket = cap)
    val nPairs = pairs.count()
    val wallSec = (System.nanoTime() - t0) / 1e9

    // occupancy of the blocking keyspace (capless view) + cap audit
    val occ = Dedup.simhashPortable64(scaled, "doc_id", "text")
      .select(explode(array((0 until 4).map { i =>
        val half = if (i < 2) col("sig_lo") else col("sig_hi")
        shiftright(half, (i % 2) * 16).bitwiseAND(lit(0xFFFFL)) + lit(i.toLong << 16)
      }: _*)).as("blk"))
      .groupBy("blk").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("used_buckets"), max("n").as("max_bucket"),
        expr("percentile_approx(n, 0.99)").as("p99_bucket"))
      .collect()(0)
    val capDrops = Dedup.simhashBucketStats(scaled, "doc_id", "text",
      maxBucket = cap).count()

    val all = stages.toArray(Array.empty[(Int, Long, String)])
    val singleTaskDominant = all.filter { case (n, w, _) =>
      n <= 1 && w > wallSec * 1000 * 0.5 }
    val maxStage = all.sortBy(-_._2).take(3)
      .map { case (n, w, nm) => s"""{"tasks":$n,"ms":$w,"name":"$nm"}""" }
      .mkString("[", ",", "]")

    println(s"""{"metric":"simhash64_sf1_demo","docs":$nDocs,"pairs":$nPairs,""" +
      s""""wall_sec":${f"$wallSec%.1f"},"used_buckets":${occ.getLong(0)},""" +
      s""""max_bucket":${occ.getLong(1)},"p99_bucket":${occ.getLong(2)},""" +
      s""""cap_dropped_buckets":$capDrops,""" +
      s""""single_task_dominant_stages":${singleTaskDominant.length},""" +
      s""""slowest_stages":$maxStage}""")
    spark.stop()
  }
}
