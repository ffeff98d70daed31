package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data assembly operators: deterministic dataset splits and
  * token-budget sequence packing — the last mile between a cleaned corpus
  * and a training run. Everything is hash-deterministic (re-runs and
  * engines agree) and shard-parallel (no global ordering).
  */
object Training {

  /** Deterministic train/val/test assignment from a content hash —
    * stable across runs, engines, and row order, unlike rand()-based
    * splits. Uses the md5-derived 32-bit hash (portable to any SQL
    * engine) rather than xxhash64. */
  def hashSplit(docs: DataFrame, idCol: String, textCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    // the hash is SALTED per operator role: hashSplit / mixturePct /
    // temperatureMix once shared the identical unsalted expression, so
    // composing them correlated pathologically (a 50% mixturePct pass
    // left documents whose buckets here were ALL < 50 — val and test
    // came back empty)
    docs.select(col(idCol), col(textCol))
      .withColumn("bucket", splitBucket(col(textCol)))
      .withColumn("split", splitLabel(col("bucket"), trainPct, valPct))
      .select(col(idCol), col("bucket"), col("split"))
  }

  /** The [[hashSplit]] bucket / label EXPRESSIONS, exposed so composers
    * (Curate) can annotate rows in place — recomputing the split via a
    * self-join re-plans the whole upstream lineage twice and pays a
    * join shuffle for a pure function of the text column. */
  def splitBucket(textCol: Column): Column =
    // coalesce: a NULL text gave a null bucket, and both when() arms of
    // splitLabel fell through — every null-text doc landed in 'test'.
    // Hashing '' instead groups null-text docs with empty-text docs
    // (one deterministic split), the consistent degenerate-doc behavior.
    pmod(Dedup.md5Hash32(concat(lit("split:"), coalesce(textCol, lit("")))),
      lit(100))

  def splitLabel(bucket: Column, trainPct: Int = 80, valPct: Int = 10): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")

  /** Stream-chop sequence packing: assign documents to fixed
    * token-budget bins (training sequences), shard-parallel. Each shard
    * (hash of id) concatenates its documents in deterministic id order
    * into one token stream chopped at budget boundaries; a doc belongs
    * to the chunk where it STARTS, so a straddling doc's bin can exceed
    * the budget by the straddle amount — the concat-and-chunk
    * dataloader recipe (GPT-style pretraining packs across document
    * boundaries; a loader that must not straddle re-splits the tail).
    * One window per shard — no global sort, so the plan scales linearly
    * with shard count. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    tokenBudget: Int, shards: Int = 8): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    require(shards > 0, s"shards must be positive, got $shards")
    // coalesce: tokenCountWs(NULL) is NULL, so a null-text doc's bin
    // computed NULL and it vanished from every dataloader bin — the
    // same silent-vanish failure the null-id coalesce below fixes
    val toks = coalesce(TextAnalysis.tokenCountWs(col(textCol)), lit(0))
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // numeric ids shard by modulo (engine-portable, oracle-mirrorable);
    // string/other ids hash first — pmod on a raw string throws under
    // ANSI mode (or null-collapses every row into ONE shard, the exact
    // single-partition bottleneck the shard design avoids)
    val shardCol = docs.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        // coalesce: pmod(null) is null — null-id rows formed a
        // shard=null partition no dataloader iterating 0..shards-1 ever
        // reads (silently vanished docs); the string branch already
        // routes nulls to a real shard (xxhash64(null) = seed constant)
        coalesce(pmod(col(idCol), lit(shards)), lit(0))
      case _ => pmod(abs(xxhash64(col(idCol))), lit(shards))
    }
    docs.select(col(idCol), col(textCol))
      .withColumn("shard", shardCol.cast("long"))
      .withColumn("n_tokens", toks)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / tokenBudget).cast("long"))
      .select(col(idCol), col("shard"), col("n_tokens"), col("bin"))
  }

  /** Per-bin packing summary (what the data loader reads): docs per
    * sequence and the fill level against the budget. */
  def packingStats(packed: DataFrame): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))

  /** Weighted deterministic corpus mixture: keep a hash-chosen `pct`% of
    * each source (the training-mixture sampling primitive; stable across
    * runs, no rand()). */
  def mixturePct(docs: DataFrame, idCol: String, textCol: String,
                 pct: Int): DataFrame =
    // salt: see hashSplit — each sampling operator draws independently.
    // coalesce: concat(salt, NULL) is NULL and the pmod predicate NULL,
    // silently dropping null-text docs even at pct=100 (splitBucket
    // documents the null-as-"" convention)
    docs.filter(pmod(Dedup.md5Hash32(
      concat(lit("mix:"), coalesce(col(textCol), lit("")))), lit(100)) < pct)

  /** Temperature-based mixture sampling — the multilingual/multi-source
    * rebalancing recipe (sampling weight ∝ size^alpha; alpha=1 keeps
    * natural proportions, alpha→0 flattens toward uniform): each source
    * gets keep-rate `min(1, w_s·T/n_s)` where `w_s = n_s^α / Σ n^α` and
    * `T = targetFrac·N`, quantized to basis points; membership is then
    * the same portable md5 filter as [[mixturePct]] — deterministic
    * across runs, row orders, and engines. Source statistics are one
    * tiny aggregate (|sources| rows) broadcast back onto the corpus;
    * docs never shuffle. */
  def temperatureMix(docs: DataFrame, idCol: String, textCol: String,
                     sourceCol: String, alpha: Double = 0.5,
                     targetFrac: Double = 0.4): DataFrame = {
    val sizes = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
    val totals = sizes.agg(sum("n_s").as("n_total"),
      sum(pow(col("n_s").cast("double"), alpha)).as("sum_pow"))
    val rates = sizes.crossJoin(broadcast(totals))
      .select(col(sourceCol),
        least(lit(10000L), floor(
          pow(col("n_s").cast("double"), alpha) / col("sum_pow")
            * (lit(targetFrac) * col("n_total")) * lit(10000.0)
            / col("n_s"))).cast("long").as("rate_bp"))
    // null-safe join: a NULL source is a real group (sizes counts it) —
    // an equi-join silently dropped those docs from the mixture
    docs.join(broadcast(rates.withColumnRenamed(sourceCol, "__src")),
        col(sourceCol) <=> col("__src"))
      .filter(pmod(Dedup.md5Hash32(
        concat(lit("tmix:"), coalesce(col(textCol), lit("")))),
        lit(10000)) < col("rate_bp")) // salt + null-as-"": see mixturePct
      .select(col(idCol), col(sourceCol), col("rate_bp"))
  }

  /** Deterministic stratified sample: exactly `k` documents per stratum
    * (language, source, topic bucket …), chosen by md5 rank — a
    * quota-balanced corpus draw that is reproducible across runs, row
    * orders, and engines (rand()-based samplers are none of those).
    * One window per stratum, partitioned by the stratum key: the plan is
    * a single hash shuffle on the stratum column and scales with corpus
    * size, not stratum count. Ties (identical text) break on id. */
  def stratifiedSample(docs: DataFrame, idCol: String, textCol: String,
                       strataCol: String, k: Int): DataFrame = {
    // null-as-"": md5(NULL) is NULL and sorts FIRST ascending, so
    // null-text docs deterministically filled the quota before any real
    // document in their stratum
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(coalesce(col(textCol), lit(""))), col(idCol))
    docs.select(col(idCol), col(strataCol), col(textCol))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col(strataCol), col("rk").cast("long").as("rk"))
  }

  /** Deterministic corpus shuffle: a reproducible global permutation
    * from the portable 32-bit md5 hash of (seed, id) — the order a
    * training dataloader reads, stable across runs, engines, and input
    * row order (rand() is none of those; a new seed is a new epoch
    * order). The hash is uniform BY CONSTRUCTION, so the two-phase
    * numbering's range buckets balance regardless of corpus skew — no
    * single-partition window (the globalRowNumber scale path). */
  def deterministicShuffle(docs: DataFrame, idCol: String, seed: String,
                           buckets: Int = 64): DataFrame = {
    val key = Dedup.md5Hash32(
      concat_ws(" ", lit(seed), col(idCol).cast("string")))
    graft.operators.ComplexOps.globalRowNumber(
      docs.withColumn("shuffle_key", key), buckets, col("shuffle_key"),
      descending = false, "shuffle_rank", col(idCol))
  }

  /** Epoch-aware upsampling: replicate each doc `ceil(epochs)`-bounded
    * times per its source's epoch factor (the multi-epoch data recipe —
    * high-quality sources repeat, e.g. 3.0 epochs = 3 copies, 2.5 =
    * 2 copies + a deterministic half keep the md5 filter admits).
    * `epochsBySource`: source value → epochs (missing sources default
    * 1.0). Adds `copy` (0-based) so downstream shuffles spread copies;
    * rates quantize to basis points like [[temperatureMix]]. */
  def upsampleEpochs(docs: DataFrame, idCol: String, sourceCol: String,
                     epochsBySource: Map[String, Double]): DataFrame = {
    val eps = typedLit(epochsBySource.map { case (k, v) =>
      k -> math.round(v * 10000).toInt }) // basis points, engine-portable
    val bp = coalesce(eps(col(sourceCol)), lit(10000))
    val full = (bp / 10000).cast("int")
    val fracBp = (bp % 10000).cast("int")
    // one extra copy per doc iff md5 bucket < fractional basis points
    val admitExtra = pmod(Dedup.md5Hash32(
      concat_ws(" ", col(idCol).cast("string"), col(sourceCol))),
      lit(10000)) < fracBp
    val copies = (full + when(admitExtra, 1).otherwise(0)).as("n_copies")
    docs.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** Token-balanced shard assignment — the dataloader-facing writer
    * layout: `shards` output shards of ~equal TOKEN mass (doc-count
    * balance starves readers when lengths are skewed), contiguous in
    * `idCol` order so a shard is a deterministic, resumable slice of
    * the corpus. shard = floor(tokensBefore / ceil(total/shards)),
    * clamped to shards-1.
    *
    * Scale shape: the running token sum is TWO-PHASE (the same recipe
    * as ComplexOps.globalRowNumber) — deterministic id-range buckets,
    * per-bucket window cumsum, per-bucket token offsets via one
    * #buckets-row single-partition window. The corpus shuffles once on
    * bucket; no whole-table Window.orderBy. */
  def tokenBalancedShards(docs: DataFrame, idCol: String, textCol: String,
                          shards: Int, buckets: Int = 64): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val toks = docs.select(col(idCol),
      // null text counts 0 tokens (see packSequences)
      coalesce(TextAnalysis.tokenCountWs(col(textCol)), lit(0))
        .cast("long").as("n_tokens"))
    // numeric ids bucket on their value; string/other ids bucket on a
    // hash (cast("double") on a string nulls EVERY row and least()
    // skips nulls, collapsing the whole corpus into the last bucket —
    // the single-partition bottleneck the two-phase design avoids).
    // Hash-bucketed ids stay a deterministic, resumable total order
    // ((bucket, id)); numeric ids keep pure id order.
    // NaN routes like NULL (bucket 0): one NaN id otherwise poisons
    // max(k) to NaN, the bucket formula goes NaN for EVERY row, and
    // least(NaN, buckets-1) = buckets-1 collapses the whole corpus into
    // one bucket — the single-partition bottleneck this two-phase
    // design exists to avoid (ComplexOps.globalRowNumber routes NaN the
    // same way).
    val kRaw = docs.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => col(idCol).cast("double")
      case _ => abs(xxhash64(col(idCol))).cast("double")
    }
    val k = when(isnan(kRaw), lit(null)).otherwise(kRaw)
    val bounds = toks.agg(min(k).as("_lo"), max(k).as("_hi"),
      sum("n_tokens").as("_total"))
    val withB = toks.crossJoin(broadcast(bounds))
      .withColumn("_bkt", when(k.isNull, 0).otherwise(least(
        floor((k - col("_lo")) / (col("_hi") - col("_lo") + lit(1e-9)) * buckets),
        lit(buckets - 1))).cast("int")) // null ids -> bucket 0 (asc nulls-first)
      .drop("_lo", "_hi")
    val offsets = withB.groupBy("_bkt").agg(sum("n_tokens").as("_bsum"))
      .withColumn("_boff",
        coalesce(sum("_bsum").over(Window.orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_bkt", "_boff")
    val w = Window.partitionBy("_bkt").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest(1): an all-empty corpus has _total = 0, width 0, and the
    // null division fell through least() to pile every row into the
    // LAST shard (or threw under ANSI)
    val width = greatest(
      floor((col("_total") + lit(shards - 1)) / lit(shards)), lit(1L))
      .cast("long")
    withB.join(broadcast(offsets), "_bkt")
      .withColumn("_before",
        coalesce(sum("n_tokens").over(w), lit(0L)) + col("_boff"))
      .withColumn("shard", least(floor(col("_before") / width), lit(shards - 1))
        .cast("long"))
      .select(col(idCol), col("n_tokens"), col("shard"))
  }
}
