package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.{DeltaDml, DeltaLogReader, DeltaLogWriter}

/** Scale demo for the copy-on-write DML pruning contract (SURVEY
  * §2.3 row 69af4): on a range-laid-out Delta table, a DELETE or MERGE
  * whose predicate/source touches a narrow key range must rewrite ONLY
  * the files covering that range — the write cost of DML at 100 TB is
  * proportional to the affected files, not the table. The demo builds
  * lineitem (sf0.1, ~600k rows) as 64 range-partitioned files, runs
  *
  *  1. DELETE of a ~1.5%-of-keyspace range,
  *  2. MERGE upserting a source confined to the same range,
  *  3. the SAME DELETE shape against a FULL-RANGE predicate (the
  *     worst case) for contrast,
  *
  * and reports files-rewritten vs files-total plus wall clock for
  * each. Pass/fail is printed: the narrow ops must rewrite <= 4 of 64.
  */
object DmlScaleDemo {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/tmp/graft_demo/dml_scale"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    val li = GraftSession.table(spark, src, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    // range layout: each of the 64 files covers a contiguous key slice
    DeltaLogWriter.write(
      li.repartitionByRange(64, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"), base)
    val total = DeltaLogReader.activeState(spark, base)._3.size
    val (lo, hi) = {
      val r = li.agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val span = hi - lo
    val nLo = lo + span / 3
    val nHi = nLo + span / 64  // ~1.5% of the keyspace

    def filesOf(version: Long): Long =
      DeltaLogReader.read(spark, base, Some(version)).inputFiles.length.toLong

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // 1. narrow DELETE
    val before1 = DeltaLogReader.activeState(spark, base)._3.map(_._1).toSet
    val ((v1, nDel), tDel) = timed(DeltaDml.delete(spark, base,
      col("l_orderkey") >= nLo && col("l_orderkey") < nHi))
    val after1 = DeltaLogReader.activeState(spark, base)._3.map(_._1).toSet
    val rewritten1 = (before1 -- after1).size
    println(f"narrow DELETE: $nDel%d rows, $rewritten1%d of $total%d files " +
      f"rewritten, ${tDel}%.2f s")

    // 2. narrow MERGE upsert (matched update + insert), over a range
    // DISJOINT from the deleted one so the matched path exercises
    val (mLo, mHi) = (lo + 2 * span / 3, lo + 2 * span / 3 + span / 64)
    // the synthetic lineitem repeats (l_orderkey, l_linenumber), so
    // dedup the SOURCE side — many target rows hitting one source row
    // is fine; the reverse is the ambiguity the check refuses
    val srcDf = li.filter(col("l_orderkey") >= mLo && col("l_orderkey") < mHi)
      .select(col("l_orderkey").as("mk"), col("l_linenumber").as("mn"),
        (col("l_quantity") * 2).as("mq"))
      .dropDuplicates("mk", "mn")
    val before2 = after1
    val (st, tMrg) = timed(DeltaDml.merge(spark, base, srcDf,
      "t.l_orderkey = s.mk AND t.l_linenumber = s.mn",
      matchedUpdate = Some(Map("l_quantity" -> "s.mq")),
      notMatchedInsert = Some(Map(
        "l_orderkey" -> "s.mk", "l_linenumber" -> "s.mn",
        "l_quantity" -> "s.mq", "l_extendedprice" -> "0"))))
    val after2 = DeltaLogReader.activeState(spark, base)._3.map(_._1).toSet
    val rewritten2 = (before2 -- after2).size
    println(f"narrow MERGE: ${st.updated}%d updated ${st.inserted}%d " +
      f"inserted, $rewritten2%d files rewritten, ${tMrg}%.2f s")

    // 3. full-range DELETE for contrast (every file holds a match)
    val before3 = after2
    val ((_, nAll), tAll) = timed(DeltaDml.delete(spark, base,
      col("l_quantity") > lit(0) && col("l_orderkey") % 97 === 0))
    val after3 = DeltaLogReader.activeState(spark, base)._3.map(_._1).toSet
    val rewritten3 = (before3 -- after3).size
    println(f"full-range DELETE: $nAll%d rows, $rewritten3%d files " +
      f"rewritten, ${tAll}%.2f s")

    val ok = rewritten1 <= 4 && rewritten2 <= 4 && rewritten3 > total / 2
    println(s"""{"demo":"dml_scale","files_total":$total,""" +
      s""""narrow_delete_files":$rewritten1,"narrow_merge_files":$rewritten2,""" +
      s""""full_delete_files":$rewritten3,"pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
