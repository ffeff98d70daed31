package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge induction — tokenizer training as a corpus
  * job (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units", arXiv:1508.07909; the same merge loop
  * GPT-2's tokenizer and SentencePiece's BPE mode run).
  *
  * Scale shape: the corpus collapses to the DISTINCT-WORD frequency
  * table first (the standard trick — pair statistics only depend on
  * word shapes × counts, so a 100 TB corpus becomes a vocabulary-sized
  * working set that still distributes). Each merge round is then ONE
  * pair-count aggregation (adjacent symbol pairs explode from array
  * columns — narrow — and shuffle only as (pair, count)) plus a narrow
  * `aggregate` HOF pass that greedily rewrites each word's symbol
  * array left-to-right. Only the single winning pair crosses the
  * driver per round (an argmax, like the k-means/IVF trainers). The
  * evolving word table localCheckpoints each round — the
  * dupComponents lesson: iterative lineage must be cut, or the plan
  * quadruples per round.
  *
  * Determinism: ties on pair frequency break lexicographically, so the
  * learned merge list is a pure function of the corpus.
  */
object Bpe {

  /** One learned merge rule: `left + right -> left||right`, with the
    * pair's frequency at the round it won. */
  case class Merge(left: String, right: String, freq: Long)

  /** Character-split + '</w>' end-of-word marker — the ONE symbol
    * construction training and the HOF replay share (tokenizeFast
    * mirrors it in JVM code; drift here breaks the equivalence spec,
    * so it lives in exactly one place). */
  private val SymsExpr =
    """transform(split(word, ''),
         (c, i) -> case when i = size(split(word, '')) - 1
                   then concat(c, '</w>') else c end)"""

  /** Word frequency table → symbol arrays: each word starts as its
    * character sequence with the end-of-word marker appended to the
    * last character (the Sennrich formulation — merges never cross a
    * word boundary). */
  private def initialWords(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(TextAnalysis.normalize(col(textCol)), " "))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr(SymsExpr))

  /** Adjacent symbol pairs of each word, weighted by word frequency:
    * (left, right, freq) rows. */
  private def pairStream(words: DataFrame): DataFrame = words
    .withColumn("pair", explode(expr(
      """filter(
           zip_with(syms, slice(syms, 2, size(syms)),
             (x, y) -> case when y is null then null
                       else struct(x as l, y as r) end),
           p -> p is not null)""")))
    .select(col("pair.l").as("left"), col("pair.r").as("right"), col("freq"))

  /** Corpus-wide adjacent-pair frequencies (the statistic each BPE
    * round maximizes) — exposed for the gate, where ONE round is
    * SQL-expressible even though the loop is not. */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    pairStream(initialWords(docs, textCol))
      .groupBy("left", "right").agg(sum("freq").as("pair_freq"))

  /** Learn up to `numMerges` merge rules; stops early when the best
    * remaining pair falls below `minFreq`. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minFreq: Long = 2L): Seq[Merge] = {
    var words = initialWords(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var round = 0
    while (round < numMerges) {
      val top = pairStream(words)
        .groupBy("left", "right").agg(sum("freq").as("pair_freq"))
        .orderBy(col("pair_freq").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) return merges.toSeq
      val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      if (f < minFreq) return merges.toSeq
      merges += Merge(l, r, f)
      // greedy left-to-right rewrite: fold each word's symbols, merging
      // every non-overlapping (l, r) adjacency into one symbol
      words = words.withColumn("syms", applyMergeExpr("syms", l, r))
        .localCheckpoint()
      round += 1
    }
    merges.toSeq
  }

  /** `aggregate` HOF that merges adjacent (l, r) into l||r, greedy
    * left-to-right (so "aaa" under merge (a,a) becomes ["aa","a"],
    * exactly like reference BPE). */
  private def applyMergeExpr(symsCol: String, l: String,
                             r: String): org.apache.spark.sql.Column = {
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    expr(
      s"""aggregate($symsCol, cast(array() as array<string>),
            (acc, x) -> case
              when size(acc) > 0 and element_at(acc, -1) = '${q(l)}'
                   and x = '${q(r)}'
              then concat(slice(acc, 1, size(acc) - 1),
                          array('${q(l)}${q(r)}'))
              else concat(acc, array(x)) end)""")
  }

  /** Tokenize `docs` with a learned merge list: per-word symbol arrays
    * replayed through every merge in ORDER (BPE application is the
    * training fold minus the statistics), then exploded back to
    * (doc id, token). Narrow end-to-end — one merge is one array
    * rewrite, nothing shuffles but the final explode's consumer. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val start = docs.select(col(idCol).as("doc_id"),
        explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("syms", expr(SymsExpr))
    val merged = merges.foldLeft(start) { (df, m) =>
      df.withColumn("syms", applyMergeExpr("syms", m.left, m.right))
    }
    merged.select(col("doc_id"), explode(col("syms")).as("token"))
  }

  /** [[tokenize]]'s scale path: the HOF replay nests one `aggregate`
    * expression per merge, which is exact and oracle-friendly but grows
    * the expression tree linearly in |merges| — fine for tens of rules,
    * wrong for a 32k-rule tokenizer. This variant broadcasts the merge
    * RANK table and applies the standard rank-based greedy loop per
    * word (repeatedly merge the lowest-rank adjacent pair, all
    * non-overlapping occurrences left-to-right — the GPT-2 apply
    * algorithm, sequentially equivalent to replaying merges in learned
    * order) inside one narrow mapPartitions pass. The rare justified
    * mapPartitions: a per-row, data-dependent loop over thousands of
    * rules has no codegen-friendly expression form. Output rows match
    * [[tokenize]] exactly (spec-asserted). */
  def tokenizeFast(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergeArr = merges.toArray
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => ((m.left, m.right), i) }.toMap
    val ranksB = spark.sparkContext.broadcast((mergeArr, ranks))
    // normalization MUST mirror tokenize's SQL exactly: Spark's lower()
    // (locale-independent, not String.toLowerCase under a Turkish JVM
    // locale) and a CODE-POINT symbol split (a per-Java-char split would
    // break astral characters into surrogate halves and learned merges
    // would never apply). The id column keeps its ORIGINAL type — the
    // slow path never casts it.
    val out = docs.select(
      lower(col(textCol).cast("string")).as("__norm"), col(idCol).as("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      org.apache.spark.sql.types.StructType(Seq(
        out.schema("doc_id"),
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType))))
    out
      .mapPartitions { it =>
        val (ms, rk) = ranksB.value
        val wordCache = scala.collection.mutable.HashMap[String, Array[String]]()
        it.flatMap { row =>
          val id = row.get(1)
          val text = Option(row.getString(0)).getOrElse("")
          // no String.trim here: it strips ALL chars <= U+0020 (control
          // bytes included) while the slow path's SQL normalize only
          // collapses regex \s — trim would silently drop control-char
          // tokens and break the spec-asserted tokenize equivalence;
          // split + nonEmpty already handles leading whitespace
          val words = text.split("\\s+").filter(_.nonEmpty)
          words.iterator.flatMap { w =>
            // per-partition memo on the DISTINCT word (the standard
            // GPT-2 apply optimization): natural-language corpora are
            // Zipfian, so a few thousand word shapes cover most tokens —
            // without it the full rank loop re-ran per OCCURRENCE.
            // Bounded (size cap) so an adversarial all-unique corpus
            // can't grow the map without limit.
            val tokens = wordCache.get(w) match {
              case Some(t) => t
              case None =>
                var syms = w.codePoints().toArray
                  .map(cp => new String(Character.toChars(cp)))
                syms(syms.length - 1) = syms(syms.length - 1) + "</w>"
                var done = false
                while (!done && syms.length > 1) {
                  var best = Int.MaxValue
                  var i = 0
                  while (i < syms.length - 1) {
                    val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
                    if (r < best) best = r
                    i += 1
                  }
                  if (best == Int.MaxValue) done = true
                  else {
                    val m = ms(best)
                    val buf = scala.collection.mutable.ArrayBuffer[String]()
                    var j = 0
                    while (j < syms.length) {
                      if (j < syms.length - 1 && syms(j) == m.left &&
                          syms(j + 1) == m.right) {
                        buf += m.left + m.right; j += 2
                      } else { buf += syms(j); j += 1 }
                    }
                    syms = buf.toArray
                  }
                }
                if (wordCache.size < 100000) wordCache(w) = syms
                syms
            }
            tokens.iterator.map(t => org.apache.spark.sql.Row(id, t))
          }
        }
      }(enc).toDF("doc_id", "token")
  }

  /** Vocabulary a merge list induces over the corpus: distinct final
    * symbols with corpus frequencies (what you'd hand a trainer as the
    * token inventory). Goes through [[tokenizeFast]] — the inventory is
    * exactly the call you make with the FULL learned merge list, where
    * the nested-HOF replay's expression tree (one aggregate() per merge)
    * stalls planning; the two paths are spec-asserted row-identical. */
  def vocabulary(docs: DataFrame, textCol: String,
                 merges: Seq[Merge]): DataFrame =
    tokenizeFast(docs.withColumn("__id", monotonically_increasing_id()),
        "__id", textCol, merges)
      .groupBy("token").agg(count(lit(1)).as("freq"))
}
