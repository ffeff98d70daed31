package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators designed for the 100 TB regime.
  *
  * Shape of every near-dup variant: narrow map (shingle/sketch) →
  * explode to (bucketKey, doc) → shuffle once on bucketKey →
  * within-bucket candidate pairs → exact verification on candidates.
  * Never an all-pairs cartesian; skew is bounded by a per-bucket cap.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id doc per normalized-text hash.
    * One shuffle on the 64-bit content hash (not the full text). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = xxhash64(TextAnalysis.normalize(col(textCol)))
    val w = Window.partitionBy("content_hash").orderBy(col(idCol))
    docs.withColumn("content_hash", h)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Number of duplicate docs that exact() would drop, per content hash —
    * the audit view of exact dedup. */
  def exactDupStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("content_hash", xxhash64(TextAnalysis.normalize(col(textCol))))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("keeper_id"))
      .filter(col("copies") > 1)

  /** MinHash signature as an array<bigint> column: k independent hash
    * functions simulated as (a_i * xxhash64(shingle) + b_i) mod p, min per
    * row. Pure expressions — codegen'd, no UDF. */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val p = lit(2305843009213693951L) // 2^61 - 1
    val mins = (0 until k).map { i =>
      val a = 1000003L * (i + 1) + 12345L // < 2^27: a*h32 stays < 2^60,
      val b = 998244353L * (i + 1) + 7L   // overflow-free under ANSI mode
      array_min(transform(shingles, s =>
        pmod(xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL)) * lit(a) + lit(b), p)))
    }
    array(mins: _*)
  }

  /** LSH band keys: signature split into `bands` rows of `rowsPerBand`,
    * each band hashed to one bucket key. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws("_", b.cast("string"),
        xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))
          .cast("string")))

  /** MinHash+LSH candidate pairs (idA < idB), verified with EXACT word-set
    * Jaccard, filtered at `threshold`. Scale path: shuffle on band keys
    * only; bucket size capped to bound worst-case pair fan-out. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8,
                      maxBucket: Int = 64): DataFrame = {
    val rowsPerBand = numHashes / bands
    val base = docs.select(
      col(idCol).as("id"),
      array_distinct(split(TextAnalysis.normalize(col(textCol)), " ")).as("toks"))
    val withSig = base.withColumn("sig", minhashSignature(col("toks"), numHashes))
      .withColumn("band", explode(lshBandKeys(col("sig"), bands, rowsPerBand)))
    val bucketW = Window.partitionBy("band").orderBy("id")
    val bucketed = withSig
      .withColumn("bn", row_number().over(bucketW))
      .filter(col("bn") <= maxBucket) // skew guard
      .select("band", "id", "toks")
    val pairs = bucketed.as("a").join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.toks").as("toks_a"), col("b.toks").as("toks_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(pairs, threshold)
  }

  /** Exact Jaccard over the token sets of candidate pairs. */
  private def verifyJaccard(pairs: DataFrame, threshold: Double): DataFrame = {
    val inter = size(array_intersect(col("toks_a"), col("toks_b"))).cast("double")
    val uni = size(array_union(col("toks_a"), col("toks_b"))).cast("double")
    pairs.withColumn("jaccard", round(inter / uni, 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over word tokens: sign-sum of per-token hash bits.
    * Expressed with bit arithmetic over an exploded token relation —
    * one shuffle on doc id, map-side combinable. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = toks.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
    }
    agg.select(col("id"), sig.as("simhash"))
  }

  /** Engine-portable 32-bit token hash: the low 8 hex chars of md5,
    * parsed positionally — chosen because any SQL oracle (DuckDB,
    * Trino, ...) can reproduce it exactly, unlike xxhash64. */
  def md5Hash32(tok: Column): Column = {
    val hex = md5(tok)
    (1 to 8).map { i =>
      (locate_hex(substring(hex, i, 1)) * lit(1L << ((8 - i) * 4)))
    }.reduce(_ + _)
  }
  private def locate_hex(c: Column): Column =
    (locate_in(c, "0123456789abcdef") - 1).cast("long")
  private def locate_in(sub: Column, s: String): Column =
    org.apache.spark.sql.functions.call_function("position", sub, lit(s))

  /** 32-bit portable SimHash (md5-derived token hash). Same plan shape as
    * [[simhash]]: explode tokens x bits, sign-sum, pack. */
  def simhashPortable32(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("tok"))
      .withColumn("h", md5Hash32(col("tok")))
    val bitCols = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = toks.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 32).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
    }
    agg.select(col("id"), sig.as("sig"))
  }

  /** Near-dup pairs on the portable 32-bit simhash, blocked on 4 x 8-bit
    * sub-keys (pigeonhole: hamming<=3 pairs share >=1 intact block),
    * verified with the true hamming distance. */
  def simhashPortableNearDups(docs: DataFrame, idCol: String, textCol: String,
                              maxHamming: Int = 3): DataFrame = {
    val sigs = simhashPortable32(docs, idCol, textCol)
    val blocks = sigs.withColumn("blk", explode(array(
      (0 until 4).map(i => concat_ws("_", lit(i),
        shiftright(col("sig"), i * 8).bitwiseAND(0xFFL))): _*)))
    val pairs = blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sh_a"), col("b.sig").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs.withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** SimHash near-dup pairs: block on the 4 x 16-bit sub-keys (a pair
    * within hamming distance <=3 shares at least one sub-key), then verify
    * true hamming distance <= maxHamming. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(docs, idCol, textCol)
    val blocks = sigs.withColumn("blk", explode(array(
      (0 until 4).map(i => concat_ws("_", lit(i),
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL))): _*)))
    val pairs = blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs.withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram (word) Jaccard for all pairs sharing >=1 shingle, via an
    * inverted-index join — the scalable form of "all-pairs similarity":
    * |A∩B| from a groupBy on (pair), |A|,|B| joined in, never a cartesian. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 1, threshold: Double = 0.5): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.wordNgrams(col(textCol), n)).as("g"))
    val sizes = toks.select(col("id"), size(col("g")).as("sz"))
    val inv = toks.select(col("id"), explode(col("g")).as("g"))
    val inter = inv.as("a").join(inv.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sa.sz") + col("sb.sz") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
