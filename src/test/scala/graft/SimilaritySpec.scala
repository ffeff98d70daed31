package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Similarity

/** LSH quality gates on PLANTED clustered vectors — the regime LSH is for
  * (the driver's synthetic embeddings have no high-cosine pairs, so recall
  * there is measured against blockedAllPairs instead).
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  private val Dim = 16
  private val rnd = new scala.util.Random(7)

  /** 20 clusters x 8 noisy copies: in-cluster cosine ~0.99, cross-cluster
    * cosine of random +-1-ish vectors is far below. */
  private lazy val corpus = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 20
      base = Array.fill(Dim)(rnd.nextGaussian())
      i <- 0 until 8
    } yield {
      val noisy = base.map(v => (v + 0.05 * rnd.nextGaussian()).toFloat)
      (c * 100L + i, noisy.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("zero-norm embeddings score 0 (never rank-1); dim mismatch refuses") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f))) // all-zero padding artifact
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = graft.pipeline.Similarity.bruteForceTopK(corpus, queries, k = 2)
      .orderBy("rank").collect()
    // a raw NaN (0/0) sorted GREATEST made the zero vector the rank-1
    // neighbor of every query; it must rank beneath real neighbors
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L), top.toSeq)
    // mixed-dimension corpora refuse rather than scoring prefix cosines
    val bad = Seq((9L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      graft.pipeline.Similarity.bruteForceTopK(
        corpus.unionAll(bad), queries, k = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq
      .flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("dimension mismatch")), msgs(e))
  }

  test("lshTopK recall@5 >= 0.9 vs bruteForceTopK (SURVEY row 76)") {
    val queries = corpus.filter(col("vec_id") % 100 === 0) // one per cluster
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(corpus, queries, k = 5, dim = Dim,
        bits = 8, tables = 12)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("lshTopK candidate set actually prunes (not brute force in disguise)") {
    val queries = corpus.filter(col("vec_id") % 100 === 0)
    val nCorpus = corpus.count()
    // count scored candidates per query before top-k
    val c = GraftSession.balanced(corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec")))
      .withColumn("bucket", explode(Similarity.lshTableKeys(col("cvec"), Dim, 8, 12)))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("bucket", explode(Similarity.lshTableKeys(col("qvec"), Dim, 8, 12)))
    val candPerQuery = c.join(q, Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .select("qid", "cid").distinct()
      .groupBy("qid").count().agg(avg("count")).collect()(0).getDouble(0)
    assert(candPerQuery < nCorpus * 0.5,
      s"avg candidates $candPerQuery of $nCorpus corpus — no pruning")
  }

  test("semanticDups (SemDedup role): cluster blocking finds the planted " +
      "pairs exactly when clusters are separable") {
    val exact = Similarity.blockedAllPairs(corpus, threshold = 0.9, numBlocks = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // k coarser than the planted cluster count: cells MERGE planted
    // clusters (harmless — exact verify rejects cross-cluster pairs) but
    // rarely SPLIT one (the recall trade the recipe accepts; at k=20 a
    // split cost ~3% of pairs here, measured)
    val sem = Similarity.semanticDups(corpus, threshold = 0.9, k = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert((sem -- exact).isEmpty, "cluster blocking must never invent pairs")
    val recall = (exact & sem).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall = $recall (${(exact -- sem).size} boundary losses)")
    // and the join really is cluster-blocked: candidate pairs bounded by
    // sum of per-cluster squares, well under all-pairs
    val n = corpus.count()
    val clusterSizes = Similarity.kmeans(corpus, 10)._1
      .groupBy("cluster").count().collect().map(_.getLong(1))
    val cand = clusterSizes.map(s => s * (s - 1) / 2).sum
    assert(cand < n * (n - 1) / 2 / 2,
      s"blocking must prune: $cand candidate pairs vs all-pairs ${n * (n - 1) / 2}")
  }

  test("embeddingNearDups matches exact blockedAllPairs at threshold 0.9") {
    val exact = Similarity.blockedAllPairs(corpus, threshold = 0.9, numBlocks = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.embeddingNearDups(corpus, threshold = 0.9, dim = Dim,
        bits = 8, tables = 12)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted clusters must produce near-dup pairs")
    assert(lsh == exact, s"missing=${(exact -- lsh).size} extra=${(lsh -- exact).size}")
  }

  test("pqTopK recall@5 >= 0.9 with PQ codes + exact rerank (IVF-PQ shape)") {
    val queries = corpus.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(corpus, queries, k = 5, dim = Dim,
        m = 4, ksub = 16, nCells = 16, nProbe = 4, refine = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall")
    // every query answered with k rows
    assert(pq.groupBy(_._1).forall(_._2.size == 5))
  }

  test("kmeans recovers planted clusters (purity) and is deterministic") {
    val (assigned, cents) = Similarity.kmeans(corpus, k = 20, iters = 3)
    val rows = assigned.select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.length == 160)
    assert(cents.count() == 20)
    // purity: within each FOUND cluster, the dominant planted cluster
    // (vec_id / 100) should own nearly all members
    val purity = rows.groupBy(_._2).values.map { members =>
      val planted = members.map(_._1 / 100)
      planted.groupBy(identity).values.map(_.size).max.toDouble / planted.size
    }
    assert(purity.sum / purity.size >= 0.9,
      s"mean cluster purity ${purity.sum / purity.size}")
    // members sit close to their centroid on this data
    assert(assigned.filter(col("cos_to_centroid") < 0.8).count() == 0)
    // deterministic: same inputs, same assignment
    val again = Similarity.kmeans(corpus, k = 20, iters = 3)._1
      .select("id", "cluster").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSet == again.toSet)
  }

  test("ivfTopK recall@5 >= 0.9 with bounded probing (IVF-flat shape)") {
    val queries = corpus.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("IVF index persists: train once, reload in a FRESH session, " +
      "same recall at nProbe=1") {
    val (_, cents) = Similarity.kmeans(corpus, k = 20, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    Similarity.saveIvfIndex(cents, dir,
      Map("nCells" -> "20", "dim" -> Dim.toString, "metric" -> "cosine"))
    val fresh = spark.newSession()
    val (loaded, params) = Similarity.loadIvfIndex(fresh, dir)
    assert(params("nCells") === "20" && params("metric") === "cosine")
    assert(loaded.count() === 20)
    val queries = corpus.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5,
        nCells = params("nCells").toInt, nProbe = 1, centroids = Some(loaded))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"reloaded-index recall@5 = $recall")
  }

  test("kmeans-trained centroids make IVF cells tight: recall@5 >= 0.9 at nProbe=1") {
    val queries = corpus.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (_, cents) = Similarity.kmeans(corpus, k = 20, iters = 3)
    val trained = Similarity.ivfTopK(corpus, queries, k = 5,
        nCells = 20, nProbe = 1, centroids = Some(cents))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & trained).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"trained centroids at nProbe=1 should capture whole clusters, recall=$recall")
    // the PQ variant accepts the same trained quantizer
    val pqTrained = Similarity.pqTopK(corpus, queries, k = 5, dim = Dim,
        m = 4, ksub = 16, nCells = 20, nProbe = 2, refine = 4,
        centroids = Some(cents))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqRecall = (exact & pqTrained).size.toDouble / exact.size
    assert(pqRecall >= 0.9, s"trained PQ recall@5 = $pqRecall")
  }

  test("nearDupsAuto dispatches by regime and agrees with both branches") {
    // high threshold -> LSH branch (bucket explode in the plan)
    val hi = Similarity.nearDupsAuto(corpus, threshold = 0.9, dim = Dim,
      bits = 8, tables = 12)
    assert(hi.queryExecution.analyzed.toString.contains("bucket"))
    val hiPairs = hi.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactHi = Similarity.blockedAllPairs(corpus, 0.9, numBlocks = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hiPairs == exactHi)
    // low threshold -> exact triangle-blocked branch (block keys, no buckets)
    val lo = Similarity.nearDupsAuto(corpus, threshold = 0.3, dim = Dim,
      numBlocks = 4)
    assert(!lo.queryExecution.analyzed.toString.contains("bucket"))
    assert(lo.queryExecution.analyzed.toString.contains("bkey"))
  }

  test("native cosine_sim expression is bit-identical to the HOF formulation") {
    val pairs = corpus.as("a").crossJoin(corpus.as("b")).limit(2000)
    val diff = pairs.select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact, not approximate
      .count()
    assert(diff == 0)
  }

  test("blockedAllPairs equals naive all-pairs cosine (exactness)") {
    import spark.implicits._
    val naive = corpus.as("a").join(corpus.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cs"))
      .filter(col("cs") >= 0.9)
      .select("a.vec_id", "b.vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.blockedAllPairs(corpus, threshold = 0.9, numBlocks = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == naive)
  }

  test("pcaPowerIteration recovers a planted dominant direction: unit " +
      "component, projections match per-row centered dot products, " +
      "projection variance dominates any single raw dimension, ragged " +
      "widths refuse") {
    import spark.implicits._
    // planted: dimension-pair (3, 7) carries a strong common factor
    val r2 = new scala.util.Random(11)
    val rows = (0 until 300).map { id =>
      val t = r2.nextGaussian() * 5.0
      val v = Array.fill(Dim)(r2.nextGaussian() * 0.3)
      v(3) += t; v(7) += 0.8 * t
      (id.toLong, v.map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (comp, proj) = Similarity.pcaPowerIteration(df, iters = 5)
    assert(math.abs(comp.map(x => x * x).sum - 1.0) < 1e-12)
    // the component concentrates on the planted pair, ratio ~0.8/1
    assert(math.abs(comp(3)) > 0.7 && math.abs(comp(7)) > 0.5,
      comp.toSeq.toString)
    assert(math.abs(comp(7) / comp(3) - 0.8) < 0.05)
    // projections = centered dot component, re-derived independently
    val got = proj.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mu = Array.tabulate(Dim)(i =>
      rows.map(_._2(i).toDouble).sum / rows.length)
    for ((id, v) <- rows.take(20)) {
      val expect = v.zipWithIndex.map { case (x, i) =>
        (x.toDouble - mu(i)) * comp(i) }.sum
      assert(math.abs(got(id) - expect) < 1e-9, s"id $id")
    }
    // captured variance beats the strongest single raw dimension
    val pvar = {
      val vals = got.values.toSeq
      val m = vals.sum / vals.length
      vals.map(x => (x - m) * (x - m)).sum / vals.length
    }
    val d3var = {
      val vals = rows.map(_._2(3).toDouble)
      val m = vals.sum / vals.length
      vals.map(x => (x - m) * (x - m)).sum / vals.length
    }
    assert(pvar >= d3var, s"$pvar < $d3var")
    val ragged = (rows.take(5) :+ (99L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaPowerIteration(ragged)
    }
    assert(e.getMessage.contains("ragged"), e.getMessage)
  }

  test("kCenterGreedy: farthest-first traversal covers planted clusters " +
      "before densifying, radius2 is monotone non-increasing, selection " +
      "is deterministic, ties break to the smallest id") {
    import spark.implicits._
    // three tight clusters far apart; ids interleaved so cluster
    // membership is not id order
    val r = new scala.util.Random(7)
    val centers = Seq(Seq(0.0, 0.0, 0.0), Seq(100.0, 0.0, 0.0),
      Seq(0.0, 100.0, 100.0))
    val rows = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => (x + r.nextGaussian() * 0.1).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val sel = Similarity.kCenterGreedy(df, k = 6).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2)))
    assert(sel.length === 6)
    assert(sel.head._1 === 1 && sel.head._2 === 0L && sel.head._3 === 0.0)
    // the first THREE selections land in three DIFFERENT clusters
    val firstThreeClusters = sel.take(3).map(_._2 % 3).toSet
    assert(firstThreeClusters.size === 3, sel.toSeq.toString)
    // radius2 non-increasing from step 2 on
    val radii = sel.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a + 1e-9 },
      radii.toSeq.toString)
    // steps 2-3 cross clusters (~100^2+), steps 4-6 are intra-cluster
    assert(radii(0) > 9000 && radii(1) > 9000)
    assert(sel(3)._3 < 1.0 && sel(5)._3 < 1.0)
    // deterministic: an identical second run selects identically
    val sel2 = Similarity.kCenterGreedy(df, k = 6).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2)))
    assert(sel.toSeq === sel2.toSeq)
    // exact ties break to the smallest id: four corners of a square,
    // start at 0, the two distance-ties at step 2 resolve to id 1
    val square = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val s2 = Similarity.kCenterGreedy(square, k = 2).collect()
    assert(s2(1).getLong(1) === 3L) // farthest first: the diagonal
    val s3 = Similarity.kCenterGreedy(square, k = 3).collect()
    assert(s3(2).getLong(1) === 1L) // tie between 1 and 2 -> smaller id
  }

  test("kCenterGreedy input tolerance and refusals: int ids and " +
      "array<double> embeddings work; k beyond the distinct point " +
      "count refuses instead of silently reselecting; string ids " +
      "refuse at plan time") {
    import spark.implicits._
    // int id + double vectors (the advice repro: these used to
    // ClassCastException at driver decode)
    val dbl = Seq((1, Seq(0.0, 0.0)), (2, Seq(3.0, 4.0)),
      (3, Seq(0.0, 8.0))).toDF("vec_id", "embedding")
    val sel = Similarity.kCenterGreedy(dbl, k = 3).collect()
      .map(x => (x.getLong(1), x.getDouble(2)))
    assert(sel.map(_._1).toSeq === Seq(1L, 3L, 2L))
    assert(sel(1)._2 === 64.0 && sel(2)._2 === 25.0)
    // k exceeds distinct points: duplicate vectors leave the farthest
    // remaining distance at 0 — loud refusal, not a duplicate row
    val dup = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)),
      (3L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.kCenterGreedy(dup, k = 3).collect())
    assert(e.getMessage.contains("DISTINCT embedding points"))
    // non-integral id: refuse up front (a silent cast would null out)
    val str = Seq(("a", Seq(0f))).toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException](
      Similarity.kCenterGreedy(str, k = 1))
    assert(e2.getMessage.contains("integral"))
  }

  test("pcaTopK with deflation recovers TWO planted orthogonal " +
      "directions in order of variance; components are near-orthogonal " +
      "unit vectors and projections decorrelate") {
    import spark.implicits._
    // planted: u1 = (e1+e2)/sqrt2 with sigma 5, u2 = (e5-e6)/sqrt2 with
    // sigma 2, small isotropic noise
    val r2 = new scala.util.Random(23)
    val dim = 8
    val rows = (0 until 400).map { id =>
      val t1 = r2.nextGaussian() * 5.0
      val t2 = r2.nextGaussian() * 2.0
      val v = Array.fill(dim)(r2.nextGaussian() * 0.2)
      val s2i = 1.0 / math.sqrt(2.0)
      v(1) += t1 * s2i; v(2) += t1 * s2i
      v(5) += t2 * s2i; v(6) -= t2 * s2i
      (id.toLong, v.map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (comps, proj) = Similarity.pcaTopK(df, k = 2, iters = 8)
    assert(comps.length === 2)
    val Seq(c1, c2) = comps
    val s2i = 1.0 / math.sqrt(2.0)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map(p => p._1 * p._2).sum
    // unit norms, near-orthogonality
    assert(math.abs(dot(c1, c1) - 1.0) < 1e-12)
    assert(math.abs(dot(c2, c2) - 1.0) < 1e-12)
    assert(math.abs(dot(c1, c2)) < 0.02, dot(c1, c2).toString)
    // component 1 aligns with u1 (stronger variance), 2 with u2
    val u1 = Array.tabulate(dim)(i =>
      if (i == 1 || i == 2) s2i else 0.0)
    val u2 = Array.tabulate(dim)(i =>
      if (i == 5) s2i else if (i == 6) -s2i else 0.0)
    assert(math.abs(dot(c1, u1)) > 0.99, c1.toSeq.toString)
    assert(math.abs(dot(c2, u2)) > 0.99, c2.toSeq.toString)
    // projections: var(p1) > var(p2), corr(p1, p2) ~ 0
    val ps = proj.collect().map(r =>
      (r.getDouble(1), r.getDouble(2)))
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val v1s = ps.map(_._1).toSeq
    val v2s = ps.map(_._2).toSeq
    assert(variance(v1s) > variance(v2s))
    val m1 = v1s.sum / v1s.length; val m2 = v2s.sum / v2s.length
    val corr = ps.map { case (a, b) => (a - m1) * (b - m2) }.sum /
      (ps.length * math.sqrt(variance(v1s) * variance(v2s)))
    assert(math.abs(corr) < 0.05, corr.toString)
  }

  test("semanticDups releases the kmeans cache (no pinned corpus per call)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Similarity.semanticDups(corpus, threshold = 0.9, k = 4).count()
    // unpersisting a PROJECTION of the persisted frame was a silent
    // no-op (sameResult never matched) — every call leaked the corpus
    // cache AND the assignment cache. The one allowed residual entry is
    // the localCheckpoint holding the RESULT rows (released with the
    // returned DataFrame); before the fix this asserted 3 extra entries.
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1,
      s"semanticDups leaked cache entries: $before -> $after")
  }
}
