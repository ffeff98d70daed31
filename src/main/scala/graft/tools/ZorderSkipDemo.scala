package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.ZOrder

/** Data-skipping demo for Z-order clustering (SURVEY row 69af12):
  * lay the same two-uniform-column table out three ways — unsorted,
  * single-column range-sorted, z-ordered — into the same file count,
  * then measure what fraction of files a mid-range 5%-wide predicate
  * on EACH column could skip from footer min/max alone (the pruning
  * parquet row-group stats + Delta/Iceberg file stats actually do).
  */
object ZorderSkipDemo {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(500000)
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val df = spark.range(rows.toLong).select(
      (pmod(xxhash64(col("id"), lit(1)), lit(1000000)) / 1000.0).as("x"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000000)) / 1000.0).as("y"),
      col("id"))
    val base = s"/tmp/graft_demo/zskip_${System.currentTimeMillis()}"

    df.repartition(files).write.parquet(s"$base/unsorted")
    df.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/xsort")
    ZOrder.layout(df, Seq("x", "y"), files).write.parquet(s"$base/zorder")

    def overlap(path: String): (Int, Int, Int) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
      val (lo, hi) = (500.0, 550.0)
      val hitX = r.count(f => f.getDouble(2) >= lo && f.getDouble(1) <= hi)
      val hitY = r.count(f => f.getDouble(4) >= lo && f.getDouble(3) <= hi)
      (r.length, hitX, hitY)
    }
    val (nu, ux, uy) = overlap(s"$base/unsorted")
    val (ns, sx, sy) = overlap(s"$base/xsort")
    val (nz, zx, zy) = overlap(s"$base/zorder")
    println(s"""{"metric":"zorder_skip_demo","rows":$rows,""" +
      s""""layouts":{"unsorted":{"files":$nu,"x_hit":$ux,"y_hit":$uy},""" +
      s""""xsort":{"files":$ns,"x_hit":$sx,"y_hit":$sy},""" +
      s""""zorder":{"files":$nz,"x_hit":$zx,"y_hit":$zy}}}""")
    spark.stop()
  }
}
