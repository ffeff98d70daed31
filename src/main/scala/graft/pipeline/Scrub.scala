package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for a training-data pipeline: PII redaction,
  * intra-document repetition scoring (a Gopher-style quality signal), and
  * cross-corpus chunk-level dedup. All pure Column expressions / one-
  * shuffle aggregations — every rule is a regex or integer computation a
  * SQL oracle reproduces exactly.
  */
object Scrub {

  /** PII patterns, ordered: email before phone (an email's digits must
    * not half-match the phone rule), IP last (safe either way). The
    * character classes are deliberately RE2-compatible so any engine can
    * run the same rules. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Replace emails, phone numbers, and IPv4 literals with typed
    * placeholder tags — the redaction pass that runs before a corpus
    * leaves the trust boundary. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Fraction of duplicated word n-grams within the document, in basis
    * points (integer — engine-portable): 0 means all n-grams distinct,
    * 10000 means one n-gram repeated throughout. The canonical
    * boilerplate/repetition quality signal. */
  def repetitionBp(text: Column, n: Int = 3): Column = {
    val grams = TextAnalysis.wordNgrams(text, n)
    val total = size(grams)
    val dups = total - size(array_distinct(grams))
    when(total > 0, floor(dups * lit(10000L) / total)).otherwise(0L).cast("long")
  }

  /** Explode a document into fixed-size token chunks (the unit most
    * training pipelines dedup at below whole-document level): chunk index
    * + its text. Tail tokens short of a full chunk are dropped, so chunk
    * content is position-stable across documents. */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkTokens: Int): DataFrame = {
    val words = split(TextAnalysis.normalize(col(textCol)), " ")
    val nChunks = floor(size(words) / chunkTokens).cast("int")
    docs.select(col(idCol).as("doc_id"),
        posexplode(
          when(nChunks > 0, transform(sequence(lit(0), nChunks - 1),
            i => array_join(slice(words, i * chunkTokens + 1, lit(chunkTokens)), " ")))
            .otherwise(array()))
          .as(Seq("chunk_idx", "chunk")))
  }

  /** Cross-corpus chunk dedup audit: chunks appearing in more than one
    * place, keyed by an engine-portable md5 fingerprint — one shuffle on
    * the hash, never on chunk text. */
  def chunkDupStats(docs: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int = 20): DataFrame =
    tokenChunks(docs, idCol, textCol, chunkTokens)
      .select(col("doc_id"), md5(col("chunk")).as("chunk_hash"))
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc"))
      .filter(col("n_copies") > 1)
}
