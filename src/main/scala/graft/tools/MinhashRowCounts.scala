package graft.tools

import org.apache.spark.sql.functions._

/** Round-17 ledger probe: row counts of the minhash candidate-join
  * stages at a given SF (VERDICT r16 item 2's "candidate-join stage
  * input/output row counts"). Recomputes the collapse path's stages
  * with the public Dedup helpers (same hashes, same banding).
  * Throwaway measurement harness, not an API. */
object MinhashRowCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.getOrCreate()
    import graft.pipeline.{Dedup, TextAnalysis}
    val docs = graft.GraftSession.table(spark, sfDir, "documents")
    val toks = graft.GraftSession.balanced(
        docs.select(col("doc_id").as("id"), col("text")))
      .select(col("id"), array_sort(Dedup.tokenHashes(
        filter(array_distinct(split(TextAnalysis.normalize(col("text")), " ")),
          t => length(t) > 0))).as("th"))
      .filter(size(col("th")) > 0)
    val keyed = toks.withColumn("setkey", xxhash64(col("th")))
    val repIds = keyed.groupBy("setkey").agg(min("id").as("mid"))
    val reps = keyed.join(repIds, "setkey").filter(col("id") === col("mid"))
      .select("setkey", "id", "th")
    val banded = reps
      .withColumn("sig", Dedup.minhashSignatureFromHashes(col("th"), 128))
      .select(col("id"), explode(Dedup.lshBandKeys(col("sig"), 32, 4)).as("band"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
    val joinOut = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id")).count()
    val candN = cand.count()
    println(s"ROWS docs=${docs.count()} tokSets=${keyed.count()} " +
      s"reps=${reps.count()} bandRows=${banded.count()} " +
      s"joinOut=$joinOut distinctPairs=$candN " +
      s"dupFactor=${joinOut.toDouble / math.max(candN, 1)}")
    spark.stop()
  }
}
