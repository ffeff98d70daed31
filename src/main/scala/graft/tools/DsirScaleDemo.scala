package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Search

/** Scale demo for DSIR importance weighting: synthesizes a 1× and a
  * 10× raw corpus from the documents table (copies with shuffled doc
  * ids; the target slice stays FIXED — the real operating shape, where
  * the target is a small curated set and raw is the web-scale side)
  * and measures wall clock, plus the two properties the plan's
  * scalability rests on:
  *
  *  - work grows with the raw GRAM STREAM (linear in corpus size), not
  *    with any quadratic structure: wall(10×) / wall(1×) should track
  *    ~10× minus fixed job overhead;
  *  - no stage degenerates to a single task (the gram explode
  *    balances; the vocab and weight joins shuffle on `gram`).
  */
object DsirScaleDemo {

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

    val docs0 = GraftSession.table(spark, src, "documents")
      .select("doc_id", "text", "source")
    val target = docs0.filter(col("source") === "src0")
      .select("doc_id", "text")

    def rawAt(n: Int) = (0 until n).map { c =>
      docs0.select((col("doc_id") + c * 10000000L).as("doc_id"), col("text"))
    }.reduce(_ unionAll _)

    def run(n: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val cnt = Search.dsirWeights(rawAt(n), target, "doc_id", "text")
        .filter(col("weight") > 0).count()
      (cnt, (System.nanoTime() - t0) / 1e9)
    }

    run(1) // warm: JIT + parquet footers, not reported
    val (pos1, wall1) = run(1)
    stages.clear()
    val (posN, wallN) = run(copies)

    // broadcast-build stages run as one task by NATURE (they collect the
    // build side); AQE only picks broadcast while the vocab model fits
    // the threshold — past it the join shuffles — so they are
    // size-adaptive, not a scale defect. Flag everything else.
    val suspects = stages.asScala().filter { case (tasks, wall, name) =>
      tasks == 1 && wall > 0.2 * wallN * 1000 &&
        !name.contains("withThreadLocalCaptured") }
    suspects.foreach { case (_, w, n) =>
      println(f"  single-task stage: ${w / 1000.0}%.1f s  $n") }
    val singleTask = suspects.size
    println(f"dsir_1x:  positive_weight_docs=$pos1%d  wall=$wall1%.1f s")
    println(f"dsir_${copies}x: positive_weight_docs=$posN%d  wall=$wallN%.1f s" +
      f"  ratio=${wallN / wall1}%.1f (corpus ${copies}x)")
    println(s"single_task_dominant_stages = $singleTask")
  }

  private implicit class QueueOps[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala(): Seq[A] = {
      val b = scala.collection.mutable.ArrayBuffer[A]()
      q.forEach(a => b += a)
      b.toSeq
    }
  }
}
