package graft.tools

import org.apache.spark.sql.functions._

/** Round-17 probe: band-bucket size distribution (where do the 54M
  * candidate-join rows come from). Throwaway. */
object MinhashBucketDist {
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
    val sizes = banded.groupBy("band").agg(count(lit(1)).as("n"))
    sizes.orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"BUCKET ${r.getLong(0)} n=${r.getLong(1)}"))
    val s = sizes.agg(sum(col("n") * (col("n") - 1) / 2).as("pairs"),
      count(lit(1)).as("buckets"), max("n").as("maxn")).collect()(0)
    println(s"TOTAL pairSlots=${s.get(0)} buckets=${s.get(1)} max=${s.get(2)}")
    // doc length distribution
    val lens = toks.select(size(col("th")).as("len"))
    lens.select(
      sum(when(col("len") < 5, 1).otherwise(0)).as("l0_4"),
      sum(when(col("len") >= 5 && col("len") < 20, 1).otherwise(0)).as("l5_19"),
      sum(when(col("len") >= 20 && col("len") < 100, 1).otherwise(0)).as("l20_99"),
      sum(when(col("len") >= 100, 1).otherwise(0)).as("l100p"),
      min("len"), max("len")).collect()
      .foreach(r => println(s"LEN $r"))
    // length-ratio prefilter selectivity (jaccard >= 0.8 requires
    // min(len)/max(len) >= 0.8 — an EXACT bound on token-set jaccard)
    val bandedL = reps
      .withColumn("sig", Dedup.minhashSignatureFromHashes(col("th"), 128))
      .select(col("id"), size(col("th")).as("len"),
        explode(Dedup.lshBandKeys(col("sig"), 32, 4)).as("band"))
    val filtOut = bandedL.as("a").join(bandedL.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id") &&
        least(col("a.len"), col("b.len")).cast("double") >=
          lit(0.8) * greatest(col("a.len"), col("b.len"))).count()
    val filtPairs = bandedL.as("a").join(bandedL.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id") &&
        least(col("a.len"), col("b.len")).cast("double") >=
          lit(0.8) * greatest(col("a.len"), col("b.len")))
      .groupBy(col("a.id"), col("b.id")).count().count()
    println(s"FILT joinOut=$filtOut distinctPairs=$filtPairs")
    // members of the hottest bucket: length stats
    val hot = sizes.orderBy(col("n").desc).limit(1)
      .select(col("band").as("hb"))
    banded.join(hot, col("band") === col("hb"))
      .join(reps.select(col("id"), size(col("th")).as("len")), Seq("id"))
      .select(min("len"), max("len"), avg("len"), count(lit(1))).collect()
      .foreach(r => println(s"HOTLEN $r"))
    spark.stop()
  }
}
