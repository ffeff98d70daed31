package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.{DeltaDml, DeltaLogReader, DeltaLogWriter, IcebergTable}

/** Scale demo for DELETION-VECTOR DML (SURVEY rows 69p3 + 69f9): on the
  * same 64-file range layout as [[DmlScaleDemo]], a DV DELETE must
  * write ZERO data files — its cost is the matched positions' bitmap
  * bytes, not the affected file bytes — while the COW DELETE of the
  * same shape rewrites the covering files. The demo runs, on Delta:
  *
  *  1. a ~1.5%-of-keyspace DV DELETE (narrow; 2 of 64 files affected),
  *  2. a FULL-RANGE DV DELETE (every file affected — COW's worst case
  *     rewrites 64/64; DVs still write only bitmaps),
  *  3. the COW contrast of shape 1 on a fresh copy,
  *
  * then the same narrow DELETE on an Iceberg v3 table (Puffin DVs).
  * Reported per op: rows deleted, data files written, DV/bin bytes
  * written, wall seconds. Pass/fail: DV ops must write 0 data files
  * and fewer bytes than ONE source file. */
object DvScaleDemo {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

    def fresh(name: String): String = {
      val base = s"/tmp/graft_demo/dv_scale/$name"
      fs.delete(new Path(base), true)
      base
    }
    val li = GraftSession.table(spark, src, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    def lay(base: String): Unit =
      DeltaLogWriter.write(
        li.repartitionByRange(64, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"), base)
    val (lo, hi) = {
      val r = li.agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val span = hi - lo
    val nLo = lo + span / 3
    val nHi = nLo + span / 64 // ~1.5% of the keyspace
    val narrow = col("l_orderkey") >= nLo && col("l_orderkey") < nHi

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def bytesUnder(base: String, pred: String => Boolean): Long = {
      val p = new Path(base)
      fs.listStatus(p).filter(s => !s.isDirectory && pred(s.getPath.getName))
        .map(_.getLen).sum
    }
    def report(op: String, rows: Long, dataFiles: Long, auxBytes: Long,
               sec: Double, pass: Boolean): Unit =
      println(f"$op%-28s rows=$rows%7d  data-files-written=$dataFiles%2d  " +
        f"aux-bytes=$auxBytes%9d  wall=$sec%6.2f s  ${if (pass) "PASS" else "FAIL"}")

    // ---- Delta: narrow DV delete — zero data files, tiny bitmap
    val dvBase = fresh("delta_dv"); lay(dvBase)
    val parquetBefore = bytesUnder(dvBase, _.endsWith(".parquet"))
    val oneFileBytes = parquetBefore / 64
    val ((_, n1), t1) = timed(DeltaDml.deleteDv(spark, dvBase, narrow))
    val pqAfter1 = bytesUnder(dvBase, _.endsWith(".parquet"))
    val dvBytes1 = bytesUnder(dvBase, _.endsWith(".bin"))
    report("delta DV delete (narrow)", n1, 0, dvBytes1, t1,
      pqAfter1 == parquetBefore && dvBytes1 < oneFileBytes && n1 > 0)

    // ---- Delta: FULL-RANGE DV delete — COW's 64/64 worst case stays
    // bitmap-sized under DVs (deletes every 97th row so every file hits)
    val ((_, n2), t2) = timed(DeltaDml.deleteDv(spark, dvBase,
      col("l_orderkey") % 97 === 0))
    val pqAfter2 = bytesUnder(dvBase, _.endsWith(".parquet"))
    val dvBytes2 = bytesUnder(dvBase, _.endsWith(".bin")) - dvBytes1
    report("delta DV delete (full-range)", n2, 0, dvBytes2, t2,
      pqAfter2 == parquetBefore && dvBytes2 < oneFileBytes && n2 > 0)

    // ---- Delta: the COW contrast of the narrow shape
    val cowBase = fresh("delta_cow"); lay(cowBase)
    val beforeCow = DeltaLogReader.activeState(spark, cowBase)._3.map(_._1).toSet
    val ((_, n3), t3) = timed(DeltaDml.delete(spark, cowBase, narrow))
    val afterCow = DeltaLogReader.activeState(spark, cowBase)._3.map(_._1).toSet
    val rewritten = (afterCow -- beforeCow).size
    report("delta COW delete (narrow)", n3, rewritten,
      bytesUnder(cowBase, n => n.endsWith(".parquet") && !beforeCow(n)), t3,
      rewritten <= 4 && n3 == n1)

    // ---- Iceberg v3: the same narrow delete as Puffin DVs
    val iceBase = fresh("iceberg_v3")
    IcebergTable.write(
      li.repartitionByRange(64, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"), iceBase)
    val dataDir = s"$iceBase/data"
    val icePqBefore = bytesUnder(dataDir, _.endsWith(".parquet"))
    val (_, t4) = timed(IcebergTable.deleteFromDv(spark, iceBase, narrow))
    val icePqAfter = bytesUnder(dataDir, _.endsWith(".parquet"))
    val puffinBytes = bytesUnder(dataDir, _.endsWith(".puffin"))
    val rows4 = li.filter(narrow).count()
    report("iceberg v3 DV delete (narrow)", rows4, 0, puffinBytes, t4,
      icePqAfter == icePqBefore && puffinBytes < oneFileBytes)

    println(f"layout: 64 range files, ${parquetBefore / (1 << 20)}%d MiB parquet; " +
      f"one-file budget = ${oneFileBytes}%d bytes")
  }
}
