package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed curation pipeline — every stage is an operator this
  * library gates individually; this is the end-to-end shape a training
  * run actually executes, wired so the stages share scans and stay
  * shuffle-minimal:
  *
  *   redact PII → quality floor → language filter → exact dedup →
  *   near-dup collapse (MinHash, keep lowest id) → deterministic split
  *
  * Plan notes for 100 TB: stages 1-3 are narrow (no shuffle — they fuse
  * into the scan under whole-stage codegen); exact dedup shuffles once on
  * the content hash; the near-dup drop reuses the banded MinHash shape
  * (bucket-bounded, cap-guarded); the split is a narrow hash. Total: two
  * required shuffles plus MinHash's internal exchanges, independent of
  * corpus width.
  */
object Curate {

  /** Returns the curated corpus: one row per SURVIVING doc with its
    * quality score, language, and train/val/test assignment. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQualityBp: Long = 3000, keepLang: String = "en",
             nearDupThreshold: Double = 0.8,
             trainPct: Int = 80, valPct: Int = 10,
             maxBucket: Int = 4096): DataFrame = {
    // narrow stages: redact + score + classify fuse into one projection
    // (two stacked selects collapse under CSE). Scoring runs on the
    // REDACTED text — the documented pipeline order: the shipped
    // quality_bp must describe the shipped text column, and a doc whose
    // content is mostly PII placeholders must face the quality floor AS
    // ITS OUTPUT FORM, not as its raw form
    val scored = docs.select(
        col(idCol).as("doc_id"),
        Scrub.redactPii(col(textCol)).as("text"))
      .select(col("doc_id"), col("text"),
        TextAnalysis.qualityScoreBp(col("text")).as("quality_bp"),
        TextAnalysis.languageId(col("text")).as("lang"))
      .filter(col("quality_bp") >= minQualityBp && col("lang") === keepLang)

    // exact dedup: one shuffle on the 64-bit content hash
    // Dedup.exact keeps the input schema — no internal columns to drop
    val exact = Dedup.exact(scored, "doc_id", "text")

    // near-dup collapse: every id_b in a qualifying pair folds into its
    // lower-id canonical; anti-join drops the non-canonicals
    // collapseExactDups = false: exact() above already removed every
    // identical-normalized-text doc, so identical token SETS are down to
    // rare word-order permutations — the collapse machinery's 4 extra
    // exchanges + 2 expansion joins would buy nothing here (Dedup's own
    // docs prescribe the lean path for post-exact-dedup corpora)
    val dupIds = Dedup.minhashNearDups(exact, "doc_id", "text",
        threshold = nearDupThreshold, maxBucket = maxBucket,
        collapseExactDups = false)
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = exact.join(dupIds, Seq("doc_id"), "left_anti")

    // deterministic split on the (redacted) content hash — annotated in
    // place: the split is a pure function of the text column, and the
    // former hashSplit self-join re-planned the whole scored+dedup
    // lineage a second time plus a join shuffle of both sides
    deduped.withColumn("split",
      Training.splitLabel(Training.splitBucket(col("text")), trainPct, valPct))
  }

  /** Stage-by-stage survivor counts — the audit a data engineer reads
    * before shipping a corpus. The three filter-stage counts come from
    * ONE conditional aggregation over one scan; only the final count pays
    * for the dedup pipeline (its shuffles are inherent to the answer). */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             minQualityBp: Long = 3000, keepLang: String = "en",
             nearDupThreshold: Double = 0.8,
             maxBucket: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the SAME text form curate() scores (post-redaction) and the SAME
    // cap — an audit computed under different parameters than the
    // shipped corpus reports counts for a corpus nobody produced
    val red = Scrub.redactPii(col(textCol))
    val q = TextAnalysis.qualityScoreBp(red)
    val lang = TextAnalysis.languageId(red)
    val row = docs.agg(
      count(lit(1)).as("input"),
      count(when(q >= minQualityBp, 1)).as("quality_floor"),
      count(when(q >= minQualityBp && lang === keepLang, 1)).as("language"))
      .collect()(0)
    val kept = curate(docs, idCol, textCol, minQualityBp, keepLang,
      nearDupThreshold, maxBucket = maxBucket).count()
    Seq(
      ("input", row.getLong(0)),
      ("quality_floor", row.getLong(1)),
      ("language", row.getLong(2)),
      ("after_dedup", kept)).toDF("stage", "surviving_docs")
  }
}
