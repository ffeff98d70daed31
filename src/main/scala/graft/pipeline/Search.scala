package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical relevance scoring over a document corpus: TF-IDF and BM25 —
  * the retrieval half of a training-data pipeline (mining domain
  * documents by keyword, weighting corpus mixtures by topical relevance,
  * building weak labels for quality classifiers).
  *
  * Scale shape: query terms are filtered out of the token stream BEFORE
  * anything shuffles (a handful of terms survive per document, not the
  * document), document lengths are a narrow codegen map, and the corpus
  * statistics (N, avgdl, per-term df) are metadata-scale aggregates that
  * broadcast. Nothing here is quadratic and nothing shuffles text other
  * than the matched terms themselves (bounded by |query| distinct
  * values). Formulas are pure double arithmetic with a fixed evaluation
  * order, so a SQL oracle reproduces them bit-for-bit.
  */
object Search {

  /** Largest `dim` for which the classifiers inline their weight
    * vectors as literal arrays (one plan node, no join); above it each
    * iteration's dot products take the general broadcast-weight-table
    * join instead — a 10^5-literal expression tree per class is plan
    * bloat and a codegen blowup (r16 verdict #3). Overridable only for
    * the equivalence spec (same results either side of the gate). */
  private[pipeline] def literalDimMax: Int =
    sys.props.getOrElse("graft.clf.literalDimMax", "4096").toInt

  /** normalize → whitespace split with the empty-string phantom dropped:
    * split("") yields [""], and a blank document must contribute ZERO
    * tokens (TextAnalysis.tokenCountWs documents the same invariant) —
    * without this, "" ranks as a real vocabulary term with freq =
    * #blank-docs, and blank docs get finite LM scores instead of none. */
  private def toksOf(c: Column): Column =
    filter(split(TextAnalysis.normalize(c), " "), t => length(t) > 0)

  /** Per-document BM25 score against a bag of query terms.
    * Okapi BM25: sum over matched terms of
    * `idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))` with
    * `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`.
    * Returns (id, score) for documents matching at least one term.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = toksOf(col(textCol))
    // tokens are normalize()-lowercased — query terms must be too, or an
    // uppercase term silently matches nothing
    val qTerms = terms.map(_.toLowerCase(java.util.Locale.ROOT).trim)
      .filter(_.nonEmpty)

    // narrow map: per-doc length + per-term tf for query terms only.
    // The term filter runs INSIDE the token array (array-level filter
    // before the explode), so the generate emits only query-term hits —
    // a handful of rows per matching doc — instead of fanning every
    // document out token-wise and filtering the exploded stream
    val withLen = docs.select(col(idCol).as("doc_id"),
      size(toks).as("dl"), toks.as("toks"))
    val tf = withLen
      .select(col("doc_id"), col("dl"),
        explode(filter(col("toks"), t => t.isin(qTerms: _*))).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

    // corpus statistics: one aggregate each, broadcast back
    val stats = withLen.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val df_ = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val tfNorm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))

    tf.join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * tfNorm).as("term_score"))
      .groupBy("doc_id").agg(sum("term_score").as("score"))
  }

  /** Top-k vocabulary induction: the seed step of tokenizer training
    * (word-level counts feeding BPE/unigram trainers) and the basis of
    * frequency-based filters. One map-side-combinable count aggregation
    * over the corpus, a distributed top-k (TakeOrderedAndProject — no
    * global sort of the vocabulary), then ranks assigned over just the
    * k survivors (the only single-partition step touches k rows, not
    * the corpus). Ties break lexicographically. */
  def topVocab(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(toksOf(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term")).limit(k)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("term")))
        .cast("long"))
  }

  /** Unigram-LM negative-log-likelihood scoring — the perplexity-proxy
    * quality signal (the CCNet/CC-filtering recipe scores documents by a
    * language model's perplexity; the unigram model is its shuffle-only
    * degenerate case and the same plan shape a KenLM scorer plugs into):
    * `p(t) = count(t)/total` over the corpus itself, per-doc score
    * `mean(-ln p(t))`. Low = stereotypical corpus text, high = unusual.
    * Two aggregations (term counts, per-doc means) + one hash join on
    * the vocabulary — no broadcast of anything corpus-sized; the token
    * stream shuffles once, exactly like vocabulary induction. */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // terms travel as 64-bit xxhash keys: no term string leaves this
    // operator (the output is (doc_id, nll)), so the vocabulary shuffle
    // and the model join move 8-byte longs — counts and scores are
    // identical to the string-keyed form short of a 2^64-keyspace
    // collision (the dsirWeights posture; the 6dp gate would catch one)
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(transform(toksOf(col(textCol)), t => xxhash64(t))).as("th"))
    val counts = toks.groupBy("th").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val probs = counts.crossJoin(broadcast(total))
      .select(col("th"), (col("cnt").cast("double") / col("total")).as("p"))
    // raw double out — rounding is a GATE convention (SURVEY §5), not an
    // operator one; a consumer thresholding on nll gets full precision.
    toks.join(probs, "th")
      .groupBy("doc_id")
      .agg((sum(-log(col("p"))) / count(lit(1))).as("nll"))
  }

  /** Bigram-LM negative-log-likelihood scoring — one model order up from
    * [[unigramNll]], the closer perplexity proxy to CCNet's KenLM filter
    * (CCNet, Wenzek et al. 2020, arXiv:1911.00359 §4.3 scores with a
    * 5-gram LM; the plan shape here is the general n-gram one). Jelinek-
    * Mercer interpolation keeps every probability positive when scoring
    * the training corpus itself:
    * `P(w2|w1) = λ·c(w1 w2)/c(w1 ·) + (1-λ)·c(w2)/total`,
    * per-doc score `mean(-ln P)` over its bigrams; docs with fewer than
    * two tokens carry no bigram evidence and are omitted.
    *
    * Distribution: bigrams build with array HOFs on the token array
    * (narrow, no window); model fitting is two gram aggregations (the
    * context total derives FROM the bigram table, no third corpus pass);
    * scoring is one hash join from the doc gram stream to the model.
    * Corpus totals broadcast (metadata-scale); nothing corpus-sized
    * broadcasts, the token/gram streams shuffle once each — the same
    * posture as [[dsirWeights]]. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                lambda: Double = 0.9): DataFrame = {
    // grams travel as 64-bit xxhash keys (unigramNll/dsirWeights
    // posture): the output is (doc_id, nll2) — no term string leaves
    // the operator — so the three model joins and both gram shuffles
    // carry longs; counts, probabilities and scores are identical to
    // the string-keyed form short of a 2^64-keyspace collision
    val toksArr = docs.select(col(idCol).as("doc_id"),
      transform(toksOf(col(textCol)), t => xxhash64(t)).as("toks"))
    val bigrams = toksArr
      .select(col("doc_id"), explode(expr(
        """transform(slice(toks, 1, greatest(size(toks) - 1, 0)),
          |  (t, i) -> struct(t AS w1, toks[i + 1] AS w2))""".stripMargin))
        .as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
    val ctx = c2.groupBy("w1").agg(sum("cnt2").as("ctx"))
    val uni = toksArr.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt1"))
    val total = uni.agg(sum("cnt1").as("total"))
    val model = c2.join(ctx, "w1")
      .join(uni.withColumnRenamed("term", "w2"), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"),
        (lit(lambda) * col("cnt2").cast("double") / col("ctx") +
          lit(1.0 - lambda) * col("cnt1").cast("double") / col("total"))
          .as("p"))
    // raw double out — rounding is a GATE convention (SURVEY §5)
    bigrams.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg((sum(-log(col("p"))) / count(lit(1))).as("nll2"))
  }

  /** DSIR-style importance weights (the "Data Selection for Language
    * Models via Importance Resampling" recipe, Xie et al. 2023,
    * arXiv:2302.03169): fit unigram+bigram bag-of-ngrams models over a
    * TARGET corpus (what you want more of) and the RAW corpus, then
    * weight each raw document by its log-likelihood ratio
    * `Σ_g ln(p_target(g) / p_raw(g))` over its gram occurrences, with
    * add-one smoothing on the union vocabulary. High weight = reads
    * like target; sampling raw ∝ softmax(weight) is the paper's
    * importance resampling step ([[Training.temperatureMix]] /
    * stratified sampling compose downstream).
    *
    * The paper hashes grams into a fixed SMALL bucket count (10^4-10^5)
    * so the model fits one machine, paying real collisions; distributed,
    * the gram-count table IS the model — it shuffles like any vocabulary
    * aggregate ([[topVocab]]). Grams travel as 64-bit xxhash keys rather
    * than strings (unigram = xxhash64(tok), bigram = xxhash64(tok, nxt)):
    * counts, ratios and therefore weights are identical to the
    * string-keyed form unless two realized grams collide in a 2^64
    * keyspace (~1e-8 at 10^9 distinct grams — the [[Dedup.tokenized]]
    * posture, and the 6dp gate would catch a hit), while the two
    * vocabulary shuffles and the ratio join move 8-byte longs instead of
    * gram strings and never sort. Plan: two gram aggregations + a
    * full-outer vocab join, corpus totals broadcast (metadata-scale),
    * one shuffled-hash join from the raw gram stream to the per-gram
    * ratios, one per-doc sum. Bigrams hash with array HOFs (zip_with on
    * the token array) — narrow, no window, no shuffle of anything but
    * gram keys and counts. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    // unigram + bigram HASH stream; zip_with pads with null, the case
    // guard drops the padded tail instead of emitting a corrupt gram.
    // xxhash64(x, y) (two-column form) keys bigrams without ever
    // materializing the concatenated gram string.
    def grams(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .withColumn("__toks", toksOf(col(textCol)))
      .withColumn("__grams", concat(
        expr("transform(__toks, t -> xxhash64(t))"), expr(
        """filter(
             zip_with(__toks, slice(__toks, 2, size(__toks)),
               (x, y) -> case when y is null then null
                         else xxhash64(x, y) end),
             g -> g is not null)""")))
      .select(keep :+ explode(col("__grams")).as("gram"): _*)
    // the per-doc gram stream feeds BOTH the raw model counts and the
    // final weight join — one tokenize pass over the raw corpus, not two
    val rawGrams = grams(raw, Seq(col(idCol).as("doc_id")))
    // hint gate: the vocab/ratio build sides are bounded above by the
    // gram streams, which are bounded by the input bytes — hint only
    // when the OPTIMIZER-ESTIMATED input (file-size-derived for scans)
    // spread over the session's shuffle partitions stays under ~64 MB
    // per build task (the Dedup.dupComponents hinted() posture: at
    // cluster scale the gate fails closed and the planner's spill-safe
    // sort-merge join stands)
    val hintOk = {
      val parts = raw.sparkSession.sessionState.conf.numShufflePartitions
      val est = raw.queryExecution.optimizedPlan.stats.sizeInBytes +
        target.queryExecution.optimizedPlan.stats.sizeInBytes
      est <= BigInt(parts) * (64L << 20)
    }
    val tc = grams(target, Nil).groupBy("gram").agg(count(lit(1)).as("tcnt"))
    val rc = rawGrams.groupBy("gram").agg(count(lit(1)).as("rcnt"))
    // both gram-keyed joins should execute shuffled-hash, not
    // sort-merge: neither side's order is reused downstream, so SMJ
    // would pay two corpus-vocabulary sorts of 64-bit gram keys per
    // join for nothing. The hint is now GATED on the scans' estimated
    // input bytes (r16 advisor: a ShuffledHashJoin build side cannot
    // spill, and these build sides are corpus-vocabulary-sized — the
    // previous unconditional hints could OOM a 100 TB vocabulary where
    // SMJ degrades gracefully). AQE's maxShuffledHashJoinLocalMapThreshold
    // rewrite cannot replace the hint here: these joins sit on top of
    // the count AGGREGATIONS (they reuse the gram exchange), so the
    // join's children are never bare shuffle stages with map statistics
    // — measured r17: the rewrite never fires at any threshold.
    def sh(df: DataFrame) = if (hintOk) df.hint("shuffle_hash") else df
    val vocab = tc.join(sh(rc), Seq("gram"), "full_outer")
      .na.fill(0L, Seq("tcnt", "rcnt"))
    val totals = vocab.agg(sum("tcnt").as("tt"), sum("rcnt").as("rt"),
      count(lit(1)).as("v"))
    val llr = vocab.crossJoin(broadcast(totals)).select(col("gram"),
      (log((col("tcnt") + 1.0) / (col("tt") + col("v"))) -
        log((col("rcnt") + 1.0) / (col("rt") + col("v")))).as("llr"))
    val weights = rawGrams
      .join(sh(llr), "gram")
      .groupBy("doc_id").agg(sum("llr").as("weight"))
    // grams-free documents weight 0 (empty ratio sum), not missing.
    // The attach join takes the same gated hint: its build side (one
    // 16-byte row per doc with grams) is bounded by the gate too, and
    // neither side's sort order is used downstream.
    raw.select(col(idCol).as("doc_id")).distinct()
      .join(sh(weights), Seq("doc_id"), "left")
      .na.fill(0.0, Seq("weight"))
  }

  /** fastText-style QUALITY CLASSIFIER scoring — the CCNet/GPT-3 recipe
    * for quality filtering: a linear classifier over hashed token
    * features, trained to separate a high-quality reference slice
    * (`isTarget`) from the rest of the crawl, then scoring every
    * document with `sigmoid(w·x)`. Training is batch logistic
    * regression with a FIXED, deterministic iteration count: each
    * iteration is ONE distributed aggregation (per-doc dot products →
    * errors → per-feature gradient), the `dim`-row weight vector
    * broadcasts back — the DSIR plan family (model is metadata-scale,
    * corpus never leaves executors, no collect beyond `dim` rows).
    *
    * Features are md5-bucketed token counts (portable hash, SURVEY §5),
    * so a SQL oracle re-derives the exact weights by unrolling the same
    * iterations; all float expressions keep one evaluation order
    * (sum first, divide after) for cross-engine reproducibility.
    *
    * Returns (doc_id, quality_score) for EVERY document; a doc with no
    * tokens scores sigmoid(0) = 0.5 (no evidence either way).
    *
    * Caching contract: the feature/label frames are persisted ONLY for
    * the training iterations and released before return. The returned
    * frame is the scored result PERSISTED and materialized while the
    * feature cache is still live, so the call costs ONE corpus pass
    * (feature build) no matter when or how often the caller evaluates
    * it — `unpersist()` the returned frame when done (the Dedup
    * contract). Persist, not localCheckpoint: checkpoint blocks are
    * unreplicated and lineage-cut, so one lost executor would make the
    * frame permanently unevaluable; a persisted frame falls back to
    * recompute. */
  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, dim: Int = 64, iters: Int = 3,
                        lr: Double = 0.5): DataFrame = {
    require(dim > 0 && iters > 0, "qualityClassifier: dim and iters must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val lab = docs.select(col(idCol).as("doc_id"),
      when(coalesce(isTarget, lit(false)), 1.0).otherwise(0.0).as("y"))
      .persist()
    // hashed-ngram features: j = md5_32("qc:" + token) mod dim, x = count
    val feats = docs
      .select(col(idCol).as("doc_id"), explode(toksOf(col(textCol))).as("tok"))
      .select(col("doc_id"),
        pmod(Dedup.md5Hash32(concat(lit("qc:"), col("tok"))),
          lit(dim.toLong)).as("j"))
      .groupBy("doc_id", "j").agg(count(lit(1)).as("x"))
      .persist()
    try {
      val n = lab.count().toDouble
      // w·x per doc as ONE groupBy(doc_id): at metadata-scale dim the
      // weight vector rides as a literal array indexed by j instead of a
      // per-iteration broadcast-table join — same products, same per-doc
      // sum, one plan node instead of a join subtree. GATED on dim
      // (r16 verdict #3): a user-supplied dim of 10^5-10^6 would make
      // the literal a 10^5-node expression tree (plan/codegen blowup),
      // so above the threshold the general broadcast-weight-table join
      // takes over — identical per-(j, doc) products and per-doc sums.
      def dots(w: Array[Double]) =
        if (dim <= Search.literalDimMax) {
          val arr = array(w.map(lit(_)): _*)
          feats.groupBy("doc_id")
            .agg(sum(element_at(arr, col("j").cast("int") + 1) * col("x"))
              .as("z"))
        } else {
          val wdf = w.toIndexedSeq.zipWithIndex
            .map { case (v, j) => (j.toLong, v) }.toDF("j", "__wv")
          feats.join(broadcast(wdf), "j")
            .groupBy("doc_id").agg(sum(col("__wv") * col("x")).as("z"))
        }
      def sig(zc: Column) =
        lit(1.0) / (lit(1.0) + exp(-coalesce(zc, lit(0.0))))
      // error-attach join strategy, scale-gated on the KNOWN label count
      // AND row width (r16 advisor: the explicit broadcast hint bypasses
      // autoBroadcastJoinThreshold, so the cap must count columns too —
      // here e is 2 narrow columns, k+1 with k=1): below the cap the
      // error frame broadcasts (feats never shuffles); above it, a
      // shuffled-hash hint keeps the join sort-free without asking the
      // driver to hold a corpus-sized frame
      def attach(e: DataFrame) =
        if (n * 2 <= 4e6) broadcast(e) else e.hint("shuffle_hash")
      var w = Array.fill(dim)(0.0)
      for (it <- 1 to iters) {
        // iteration 1 takes the closed form: w0 = 0 makes every z zero
        // and sigmoid(0) EXACTLY 0.5 on any engine, so the whole
        // dot-product pass is skipped — the languageClassifier (and the
        // unrolled SQL oracle's e1) do the same
        val err =
          if (it == 1) lab.select(col("doc_id"), (lit(0.5) - col("y")).as("e"))
          else lab.join(attach(dots(w)), Seq("doc_id"), "left")
            .select(col("doc_id"), (sig(col("z")) - col("y")).as("e"))
        val grad = feats.join(attach(err), "doc_id")
          .groupBy("j")
          .agg((sum(col("e") * col("x")) / lit(n)).as("g"))
          .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
        w = w.zipWithIndex.map { case (v, j) => v - lr * grad.getOrElse(j, 0.0) }
      }
      // score from the final weights, persisted and materialized
      // EAGERLY while feats/lab are still cached — otherwise the
      // caller's first evaluation would land after the unpersist below
      // and silently re-derive the whole feature lineage (one extra
      // corpus pass per evaluation at scale)
      val scored = lab.join(attach(dots(w)), Seq("doc_id"), "left")
        .select(col("doc_id"), sig(col("z")).as("quality_score"))
        .persist()
      scored.count()
      scored
    } finally { lab.unpersist(); feats.unpersist() }
  }

  /** Multi-class LANGUAGE classifier — the trainable upgrade of the
    * heuristic n-gram langId (fastText's langid role, softmax over
    * hashed token features): batch softmax regression with a FIXED,
    * deterministic iteration count, trained on the rows whose
    * `labelCol` is non-null and scoring EVERY document.
    *
    * [[qualityClassifier]]'s plan family generalized to K classes: each
    * iteration is one distributed pass (per-(doc,class) dot products →
    * stable softmax → per-(class,feature) gradient), only the
    * K×`dim`-row gradient crosses the driver, and the K×`dim` weight
    * table broadcasts back — the corpus never leaves executors. The
    * class list is `labelCol`'s sorted distinct values (a label
    * enumeration — metadata-scale by definition).
    *
    * Softmax is the max-subtracted stable form `exp(z-m)/Σexp(z-m)`
    * (`m` is an exact per-doc max, so cross-engine reproducibility
    * holds and a long doc's z cannot overflow `exp`). Features are
    * md5-bucketed token counts (portable hash, SURVEY §5), so a SQL
    * oracle re-derives the exact weights by unrolling the iterations —
    * the q_quality_clf posture.
    *
    * Returns (doc_id, lang, p): the FULL per-class probability row set
    * for every document — K rows per doc. Probabilities, not argmax,
    * because a discrete prediction is float-tie-unstable across engines
    * and because thresholding/abstention policies (CCNet keeps a doc
    * only above a confidence floor) are caller decisions; argmax is a
    * one-line `max_by(lang, p)` downstream. A doc with no tokens (or
    * none seen in training) scores the uniform 1/K — no evidence either
    * way. Training iterations run over the LABELED slice of the feature
    * table only (the semi-supervised case pays label-slice-sized
    * iterations, not corpus-sized — only the final scoring pass touches
    * every doc). Like [[qualityClassifier]], the result is persisted
    * and materialized while the feature cache is live: one corpus pass
    * total; `unpersist()` it when done. */
  def languageClassifier(docs: DataFrame, idCol: String, textCol: String,
                         labelCol: String, dim: Int = 64, iters: Int = 3,
                         lr: Double = 0.5): DataFrame = {
    require(dim > 0 && iters > 0,
      "languageClassifier: dim and iters must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val labels = docs.select(col(labelCol).cast("string").as("lang"))
      .na.drop().distinct().as[String].collect().sorted
    require(labels.length >= 2,
      s"languageClassifier needs >= 2 classes (got ${labels.toSeq})")
    val k = labels.length
    val lab = docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("string").as("y_lang"))
      .filter(col("y_lang").isNotNull).persist()
    // hashed-token features: j = md5_32("lc:" + token) mod dim, x = count
    val feats = docs
      .select(col(idCol).as("doc_id"), explode(toksOf(col(textCol))).as("tok"))
      .select(col("doc_id"),
        pmod(Dedup.md5Hash32(concat(lit("lc:"), col("tok"))),
          lit(dim.toLong)).as("j"))
      .groupBy("doc_id", "j").agg(count(lit(1)).as("x"))
      .persist()
    // gradients only involve LABELED docs — iterating over the full
    // feature table would pay a corpus-sized join + softmax per
    // iteration and then discard the unlabeled rows at the lab join
    // (ruinous when 1% of a crawl is labeled); the final scoring pass
    // is the one full-corpus computation
    val trainFeats = feats.join(lab.select("doc_id"), "doc_id").persist()
    try {
      val n = lab.count().toDouble
      require(n > 0, "languageClassifier: no labeled rows to train on")
      // error-attach join strategy, scale-gated on the KNOWN label count
      // AND row width (the qualityClassifier rule; r16 advisor — e is
      // k+1 columns per labeled doc, so the broadcast cap shrinks with
      // K): small label slices broadcast so the feature table never
      // shuffles; big ones take a sort-free shuffled-hash join instead
      // of asking the driver to hold them
      def attach(e: DataFrame) =
        if (n * (k + 1) <= 4e6) broadcast(e) else e.hint("shuffle_hash")
      // z_{d,l} = Σ_j w_{l,j} x_{d,j} for ALL K classes in ONE
      // groupBy(doc_id) pass: the weights are metadata-scale (K×dim
      // doubles), so each class's dot product rides a literal weight
      // ARRAY indexed by j — no K-way row fan-out through a dense
      // weight-table join, no (doc, class)-keyed exchange. The previous
      // spelling shuffled feats×K rows per iteration and then paid a
      // window (exchange + sort) for the softmax; this one shuffles the
      // feature rows once and the softmax below is row-local column
      // arithmetic over the K z columns (same max-subtracted stable
      // form, same values — only the row layout changed). GATED on dim
      // (r16 verdict #3, the qualityClassifier rule): above the
      // threshold the K literal arrays would be K 10^5-node expression
      // trees, so the dots ride ONE broadcast weight table (j, __w0..
      // __wK-1) joined on j — identical products and per-doc sums.
      def zCols(w: Map[(String, Int), Double], f: DataFrame) =
        if (dim <= Search.literalDimMax) {
          val aggs = labels.zipWithIndex.map { case (l, i) =>
            val arr = array((0 until dim).map(j =>
              lit(w.getOrElse((l, j), 0.0))): _*)
            sum(element_at(arr, col("j").cast("int") + 1) * col("x"))
              .as(s"__z$i")
          }
          f.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        } else {
          import org.apache.spark.sql.Row
          import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
          import scala.jdk.CollectionConverters._
          val schema = StructType(StructField("j", LongType) +:
            labels.indices.map(i => StructField(s"__w$i", DoubleType)))
          val rows = (0 until dim).map { j =>
            Row.fromSeq(j.toLong +: labels.map(l => w.getOrElse((l, j), 0.0)))
          }
          val wdf = spark.createDataFrame(rows.asJava, schema)
          val aggs = labels.indices.map(i =>
            sum(col(s"__w$i") * col("x")).as(s"__z$i"))
          f.join(broadcast(wdf), "j")
            .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        }
      // (doc_id, __p0..__pK-1): exp(z-m)/Σexp(z-m) over the z columns
      def probCols(zd: DataFrame) = {
        val zs = labels.indices.map(i => col(s"__z$i"))
        val m = greatest(zs: _*) // exact per-doc max; k >= 2 guaranteed
        val withEz = zd.select(col("doc_id") +:
          labels.indices.map(i => exp(zs(i) - m).as(s"__ez$i")): _*)
        val tot = labels.indices.map(i => col(s"__ez$i")).reduce(_ + _)
        withEz.select(col("doc_id") +:
          labels.indices.map(i => (col(s"__ez$i") / tot).as(s"__p$i")): _*)
      }
      var w = Map.empty[(String, Int), Double]
      for (it <- 1 to iters) {
        // e_{d,l} = p_{d,l} - 1[label_d = l] over labeled docs, carried
        // as K COLUMNS per doc; a labeled doc with zero features
        // contributes a zero gradient by definition (no x terms) — the
        // grad join below drops it. Iteration 1 takes the closed form:
        // w0 = 0 makes p EXACTLY 1/K (exp(0)/K on both engines), so the
        // whole dot-product/softmax round is skipped — the unrolled SQL
        // oracle's e1 does the same
        val e =
          if (it == 1)
            lab.select(col("doc_id") +: labels.zipWithIndex.map {
              case (l, i) => (lit(1.0 / k) -
                when(col("y_lang") === l, 1.0).otherwise(0.0)).as(s"__e$i")
            }: _*)
          else lab.join(attach(probCols(zCols(w, trainFeats))), "doc_id")
            .select(col("doc_id") +: labels.zipWithIndex.map {
              case (l, i) => (col(s"__p$i") -
                when(col("y_lang") === l, 1.0).otherwise(0.0)).as(s"__e$i")
            }: _*)
        // grad: one broadcast join (e is one row per labeled doc) + one
        // groupBy(j) whose partial aggregation reduces map-side to
        // dim rows × K sums — only K×dim doubles cross the driver
        val gAggs = labels.indices.map(i =>
          (sum(col(s"__e$i") * col("x")) / lit(n)).as(s"__g$i"))
        val gradRows = trainFeats.join(attach(e), "doc_id")
          .groupBy("j").agg(gAggs.head, gAggs.tail: _*)
          .collect()
        val grad = (for (r <- gradRows; (l, i) <- labels.zipWithIndex)
          yield (l, r.getLong(0).toInt) -> r.getDouble(1 + i)).toMap
        w = (for (l <- labels; j <- 0 until dim) yield {
          (l, j) -> (w.getOrElse((l, j), 0.0) - lr * grad.getOrElse((l, j), 0.0))
        }).toMap
      }
      // score every doc (the ONE full-corpus pass); feature-less docs
      // fill the uniform 1/K row set via the coalesce below. The K
      // probability columns unpivot to (doc_id, lang, p) rows with a
      // narrow explode — no class cross-join, no (doc, lang)-keyed
      // shuffle. Persisted and materialized while the feature cache is
      // live — caller-unpersist contract; persist, not localCheckpoint,
      // so a lost executor recomputes instead of permanently losing
      // blocks
      val pairs = array(labels.zipWithIndex.map { case (l, i) =>
        struct(lit(l).as("lang"),
          coalesce(col(s"__p$i"), lit(1.0 / k)).as("p"))
      }: _*)
      val out = docs.select(col(idCol).as("doc_id")).distinct()
        .join(probCols(zCols(w, feats)), Seq("doc_id"), "left")
        .select(col("doc_id"), explode(pairs).as("__lp"))
        .select(col("doc_id"), col("__lp.lang").as("lang"),
          col("__lp.p").as("p"))
        .persist()
      out.count()
      out
    } finally { lab.unpersist(); feats.unpersist(); trainFeats.unpersist() }
  }

  /** Classic TF-IDF weight per (doc, term) for the given terms:
    * `tf * ln(N / df)` — the simpler sibling kept for pipelines that
    * expect it (BM25 is the default). */
  def tfidf(docs: DataFrame, idCol: String, textCol: String,
            terms: Seq[String]): DataFrame = {
    val toks = toksOf(col(textCol))
    val qTerms = terms.map(_.toLowerCase(java.util.Locale.ROOT).trim)
      .filter(_.nonEmpty)
    // array-level term filter before the explode (the bm25 shape):
    // only query-term hits ever generate rows
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(filter(toks, t => t.isin(qTerms: _*))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val df_ = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    tf.join(broadcast(df_), "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("weight"))
  }
}
