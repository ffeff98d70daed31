package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Similarity

/** Scale demo for SemDedup-style semantic dedup (the one dedup-family
  * operator without 10× evidence until now): synthesizes a 10× corpus
  * from the embeddings table (copy 0 exact, the rest with deterministic
  * per-element jitter so each copy lands NEAR its original without
  * being identical), runs [[Similarity.semanticDups]], and reports the
  * quantity the recipe's scalability rests on — Σ|cell|² versus N² —
  * plus the cell-occupancy shape (max/p99) and stage-skew evidence.
  *
  * The claim under test: k-means cells bound the candidate pair count
  * to Σ|cell|², so doubling the corpus at fixed cell granularity grows
  * comparisons ~linearly in Σ|cell|², not quadratically in N; and no
  * stage degenerates to a single task (the blocked join shuffles on
  * (cluster, id), never a constant).
  */
object SemdedupScaleDemo {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val k = args.lift(2).map(_.toInt).getOrElse(128)
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

    val emb0 = GraftSession.table(spark, src, "embeddings")
      .select("vec_id", "embedding")
    val scaled = (0 until copies).map { c =>
      val jitter = if (c == 0) lit(0.0) else lit(0.02)
      emb0.select(
        (col("vec_id") + c * 10000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") + jitter *
            ((pmod(xxhash64(col("vec_id"), i, lit(c)), lit(1000)) - 500)
              / lit(500.0))).cast("float")).as("embedding"))
    }.reduce(_ unionAll _)

    val nVecs = scaled.count()
    val t0 = System.nanoTime()
    val pairs = Similarity.semanticDups(scaled, threshold = 0.97, k = k,
      iters = 3)
    val nPairs = pairs.count()
    val wallSec = (System.nanoTime() - t0) / 1e9

    // cell-occupancy shape: the Σ|cell|² bound versus all-pairs N²
    // (same deterministic trainer semanticDups ran, so same cells)
    val (assigned, _) = Similarity.kmeans(scaled, k, iters = 3)
    val occ = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("used_cells"), max("n").as("max_cell"),
        expr("percentile_approx(n, 0.99)").as("p99_cell"),
        sum(col("n") * col("n")).as("sum_sq"))
      .collect()(0)
    val sumSq = occ.getLong(3)
    val reduction = (nVecs.toDouble * nVecs) / sumSq

    val all = stages.toArray(Array.empty[(Int, Long, String)])
    val singleTaskDominant = all.filter { case (n, w, _) =>
      n <= 1 && w > wallSec * 1000 * 0.5 }
    val maxStage = all.sortBy(-_._2).take(3)
      .map { case (n, w, nm) => s"""{"tasks":$n,"ms":$w,"name":"$nm"}""" }
      .mkString("[", ",", "]")

    println(s"""{"metric":"semdedup_10x_demo","vectors":$nVecs,"cells":$k,""" +
      s""""pairs":$nPairs,"wall_sec":${f"$wallSec%.1f"},""" +
      s""""sum_cell_sq":$sumSq,"nsq_over_sum_sq":${f"$reduction%.1f"},""" +
      s""""used_cells":${occ.getLong(0)},"max_cell":${occ.getLong(1)},""" +
      s""""p99_cell":${occ.getLong(2)},""" +
      s""""single_task_dominant_stages":${singleTaskDominant.length},""" +
      s""""slowest_stages":$maxStage}""")
    spark.stop()
  }
}
