package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over an `array<float>` embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against a linear scan of the corpus; no shuffle of the big side, a
  * single top-k-per-query aggregation after. Scale path: random-hyperplane
  * LSH buckets so each query only scores one bucket's worth of candidates.
  */
object Similarity {

  /** Cosine similarity of two array<numeric> columns in double precision,
    * as a pure Catalyst expression tree (codegen'd; no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x))

  /** Brute-force top-k cosine neighbors for each query id.
    * `queries` is small (broadcast); `corpus` streams — the join is a
    * BroadcastNestedLoopJoin over the scan, then one shuffle for the
    * per-query top-k window. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")), col(s"c.$idCol") =!= col(s"q.$idCol"))
      .select(col(s"q.$idCol").as("query_id"), col(s"c.$idCol").as("neighbor_id"),
        round(cosine(col(s"q.$vecCol"), col(s"c.$vecCol")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane signature: `bits` sign bits packed into a long.
    * Deterministic pseudo-hyperplanes derived from xxhash64(bit, dim) —
    * reproducible across runs with no stored model. */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      // pseudo-random +-1 weights per (bit, dimension), from a hash
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (x, i) =>
          x.cast("double") *
            when(pmod(xxhash64(lit(b), i), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: candidates limited to vectors sharing the signature
    * bucket; exact cosine + top-k inside the bucket. Trades recall for a
    * candidate set ~N/2^bits per bucket — the 100 TB path. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              bits: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val sig = (df: DataFrame) =>
      df.withColumn("bucket", hyperplaneSignature(col(vecCol), dim, bits))
    val c = sig(corpus).select(col(idCol).as("cid"), col(vecCol).as("cvec"), col("bucket"))
    val q = sig(queries).select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, bucketed by LSH
    * signature (near-identical vectors share all sign bits with high
    * probability), verified exactly. */
  def embeddingNearDups(corpus: DataFrame, threshold: Double, dim: Int,
                        bits: Int = 8, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val withSig = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplaneSignature(col("v"), dim, bits))
    withSig.as("a").join(withSig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
