package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Dedup

/** Scale demo for the persistent incremental MinHash index (SURVEY row
  * 81p): append B equal-size batches and show per-batch wall stays in
  * the new-batch regime — driven by (new x indexed) BAND density, never
  * a rescan or re-tokenize of the accumulated corpus.
  *
  * Batch synthesis (deterministic, no rand()): ids shift per batch; a
  * 2% planted subset (pmod(doc_id, 50) == 0) keeps the ORIGINAL text in
  * every batch, so each append must find cross-batch dups against every
  * earlier batch (the planted cluster's per-batch pair count grows
  * linearly — true duplicates, reported not hidden). The other 98%
  * perturb ~60% of tokens with a batch-specific suffix, collapsing
  * their Jaccard far below threshold — the sparse web-corpus operating
  * point where banding must discard nearly everything cheaply.
  */
object IncrementalIndexDemo {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/tmp/graft_demo/mh_index_${System.currentTimeMillis()}"

    val docs0 = GraftSession.table(spark, src, "documents")
      .select("doc_id", "text")
    val results = (0 until batches).map { k =>
      val planted = pmod(col("doc_id"), lit(50)) === 0
      val batch = docs0.select(
        (col("doc_id") + k * 1000000L).as("doc_id"),
        when(planted, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), " "),
            t => when(pmod(xxhash64(t, col("doc_id"), lit(k)), lit(100)) < 60,
              concat(t, lit(s"_b$k"), pmod(col("doc_id"), lit(997)).cast("string")))
              .otherwise(t)))).as("text"))
      val n = batch.count()
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashIndexAppend(batch, "doc_id", "text", dir,
        numHashes = 128, bands = 32, threshold = 0.8, maxBucket = 4096)
      val nPairs = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val crossPairs = pairs
        .filter(col("id_a") < k * 1000000L || col("id_b") < k * 1000000L)
        .count()
      (k, n, nPairs, crossPairs, wall)
    }
    val indexBands = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/bands").count()
    val indexSigs = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/sigs").count()
    val perBatch = results.map { case (k, n, p, c, w) =>
      s"""{"batch":$k,"docs":$n,"pairs":$p,"cross_batch_pairs":$c,""" +
        s""""wall_sec":${f"$w%.2f"}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"incremental_index_demo","batches":$batches,""" +
      s""""index_band_rows":$indexBands,"index_sig_rows":$indexSigs,""" +
      s""""per_batch":$perBatch}""")
    spark.stop()
  }
}
