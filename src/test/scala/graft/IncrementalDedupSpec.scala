package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Dedup

/** Persistent incremental MinHash index (Dedup.minhashIndexAppend):
  * cross-batch dup detection without re-reading indexed text, and the
  * partition property — pairs emitted across successive appends equal
  * the full-batch minhashNearDups result over the union. */
class IncrementalDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  private val base =
    "the quick brown fox jumps over the lazy dog alpha beta gamma delta epsilon"
  private def uniq(i: Int): String =
    (0 until 14).map(j => s"tok${i}x$j").mkString(" ")

  // batch 1: (1, 2) near-dups; 3..6 mutually unrelated
  private val batch1 = Seq(
    (1L, base),
    (2L, base.replace("alpha", "zeta")),
    (3L, uniq(3)), (4L, uniq(4)), (5L, uniq(5)), (6L, uniq(6))
  ).toDF("doc_id", "text")

  // batch 2: 101 near-dups batch-1 doc 1; 102 unique; (103, 104) near-dups
  private val batch2 = Seq(
    (101L, base.replace("beta", "eta")),
    (102L, uniq(102)),
    (103L, uniq(103)),
    (104L, uniq(103).replace("tok103x0", "other"))
  ).toDF("doc_id", "text")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental appends find within-batch and cross-batch dups; union == batch result") {
    val dir = tmp("mhidx") + "/idx"
    val r1 = Dedup.minhashIndexAppend(batch1, "doc_id", "text", dir)
    assert(pairSet(r1) == Set((1L, 2L)))

    val r2 = Dedup.minhashIndexAppend(batch2, "doc_id", "text", dir)
    // cross-batch (1,101); (2,101) differ in TWO tokens (jaccard 0.733,
    // below threshold) — a candidate the verification must reject
    val got = pairSet(r2)
    assert(got.contains((1L, 101L)), s"cross-batch pair missing: $got")
    assert(got.contains((103L, 104L)), s"new-new pair missing: $got")
    assert(!got.contains((1L, 2L)), "old-old pair must not re-emit")

    // partition property: union over appends == one-shot batch run
    val full = Dedup.minhashNearDups(batch1.unionByName(batch2),
      "doc_id", "text", maxBucket = Int.MaxValue,
      collapseExactDups = false)
    assert(pairSet(r1) ++ got == pairSet(full),
      s"incremental union ${pairSet(r1) ++ got} != batch ${pairSet(full)}")
    // jaccard values match the batch kernel (both exact hashed-token)
    val incJ = (r1.unionByName(r2)).select("id_a", "id_b", "jaccard")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    full.collect().foreach { r =>
      assert(incJ((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
  }

  test("skew cap applies over the ACCUMULATED index: capped appends == capped batch") {
    // every doc IDENTICAL -> identical signatures -> every band bucket
    // holds all doc ids; with maxBucket = 3 each bucket truncates to
    // ids {1,2,3}, and a correct incremental run must truncate over
    // old ∪ new, not per batch
    def mk(ids: Seq[Long]) = {
      import spark.implicits._
      ids.map(i => (i, base)).toDF("doc_id", "text")
    }
    val dir = tmp("mhidxcap") + "/idx"
    val r1 = Dedup.minhashIndexAppend(mk(Seq(1L, 2L, 3L)), "doc_id", "text",
      dir, maxBucket = 3)
    val r2 = Dedup.minhashIndexAppend(mk(Seq(4L, 5L)), "doc_id", "text",
      dir, maxBucket = 3)
    val inc = pairSet(r1) ++ pairSet(r2)
    // batch twin: capless minhashNearDups has no per-band window twin
    // with collapseExactDups=false... use the capped banding directly:
    val batch = Dedup.minhashNearDups(mk(Seq(1L, 2L, 3L, 4L, 5L)),
      "doc_id", "text", maxBucket = 3, collapseExactDups = false)
    assert(inc == pairSet(batch),
      s"capped incremental $inc != capped batch ${pairSet(batch)}")
    // the cap actually engaged: docs 4 and 5 fall outside every band's
    // first-3-by-id bucket, so no pair may involve them
    assert(inc.forall { case (a, b) => a <= 3 && b <= 3 }, inc)
  }

  test("batch-list commits are versioned put-if-absent; legacy batches.json reads") {
    val dir = tmp("mhidxver") + "/idx"
    Dedup.minhashIndexAppend(batch1, "doc_id", "text", dir)
    Dedup.minhashIndexAppend(batch2, "doc_id", "text", dir)
    // two appends -> versions 1 and 2 on disk, nothing deleted in between
    val lists = new java.io.File(dir, "batchlists").list()
      .filterNot(_.startsWith(".")).sorted // drop hadoop .crc sidecars
    assert(lists.toSeq == Seq("0000000001.json", "0000000002.json"), lists.toSeq)
    // a put-if-absent collision at the next version forces the conflict
    // path: pre-create version 3, then append — the writer must land at 4
    // with ALL batches (winner's list + its own), not clobber
    val v3 = new java.io.File(dir, "batchlists/0000000003.json")
    val blocker = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "batchlists", "0000000002.json"))
    java.nio.file.Files.writeString(v3.toPath, blocker)
    val r3 = Dedup.minhashIndexAppend(
      Seq((201L, base.replace("gamma", "theta"))).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    assert(pairSet(r3).contains((1L, 201L)))
    val v4 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "batchlists", "0000000004.json"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(v4).get("batches").size() == 3)

    // legacy layout (single batches.json, pre-versioning) still reads
    val dir2 = tmp("mhidxleg") + "/idx"
    Dedup.minhashIndexAppend(batch1, "doc_id", "text", dir2)
    val legacy = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir2, "batchlists", "0000000001.json"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir2, "batches.json"), legacy)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir2, "batchlists"))
    val r2 = Dedup.minhashIndexAppend(batch2, "doc_id", "text", dir2)
    assert(pairSet(r2).contains((1L, 101L)), "legacy index lost cross-batch pair")
    assert(new java.io.File(dir2, "batchlists/0000000001.json").exists())
  }

  test("index stores hashes only (no text) and pins the hash family") {
    val dir = tmp("mhidx2") + "/idx"
    Dedup.minhashIndexAppend(batch1, "doc_id", "text", dir)
    val sigCols = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/sigs").schema.fieldNames.toSet
    assert(sigCols == Set("id", "th"), s"sigs must be metadata-only: $sigCols")
    val bandCols = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/bands").schema.fieldNames.toSet
    assert(bandCols == Set("band", "id"))
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashIndexAppend(batch2, "doc_id", "text", dir,
        numHashes = 64, bands = 16)
    }
    assert(e.getMessage.contains("incomparable"), e.getMessage)
  }

  // ---- simhash index twin (Dedup.simhashIndexAppend) -----------------

  test("simhash index: cross-batch detection; union of appends == one-shot") {
    val dir = tmp("shidx") + "/idx"
    val r1 = Dedup.simhashIndexAppend(batch1, "doc_id", "text", dir,
      maxBucket = Int.MaxValue)
    // batch 2 carries an EXACT copy of batch-1 doc 1 (hamming 0 — must
    // surface as a cross-batch pair) plus batch2's own docs
    val b2 = batch2.unionByName(Seq((201L, base)).toDF("doc_id", "text"))
    val r2 = Dedup.simhashIndexAppend(b2, "doc_id", "text", dir,
      maxBucket = Int.MaxValue)
    val got2 = pairSet(r2)
    assert(got2.contains((1L, 201L)), s"cross-batch exact dup missing: $got2")
    assert(!pairSet(r2).exists { case (a, b) => a <= 6 && b <= 6 },
      "old-old pair must not re-emit")
    val full = Dedup.simhashNearDups64(batch1.unionByName(b2),
      "doc_id", "text", maxHamming = 3, maxBucket = Int.MaxValue)
    assert(pairSet(r1) ++ got2 == pairSet(full),
      s"incremental union ${pairSet(r1) ++ got2} != batch ${pairSet(full)}")
    // hamming values match the batch kernel
    val incH = r1.unionByName(r2).select("id_a", "id_b", "hamming")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    full.collect().foreach { r =>
      assert(incH((r.getLong(0), r.getLong(1))) == r.getInt(2))
    }
  }

  test("simhash index: skew cap applies over the ACCUMULATED set") {
    def mk(ids: Seq[Long]) = ids.map(i => (i, base)).toDF("doc_id", "text")
    val dir = tmp("shidxcap") + "/idx"
    val r1 = Dedup.simhashIndexAppend(mk(Seq(1L, 2L, 3L)), "doc_id", "text",
      dir, maxBucket = 3)
    val r2 = Dedup.simhashIndexAppend(mk(Seq(4L, 5L)), "doc_id", "text",
      dir, maxBucket = 3)
    val inc = pairSet(r1) ++ pairSet(r2)
    val batch = Dedup.simhashNearDups64(mk(Seq(1L, 2L, 3L, 4L, 5L)),
      "doc_id", "text", maxBucket = 3)
    assert(inc == pairSet(batch),
      s"capped incremental $inc != capped batch ${pairSet(batch)}")
    assert(inc.forall { case (a, b) => a <= 3 && b <= 3 }, inc)
  }

  test("simhash index: params pin refuses a foreign index dir") {
    val dir = tmp("shidxpin") + "/idx"
    Dedup.minhashIndexAppend(batch1, "doc_id", "text", dir)
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashIndexAppend(batch2, "doc_id", "text", dir)
    }
    assert(e.getMessage.contains("incomparable"), e.getMessage)
    // index stores signatures only (blocks are recomputed per append)
    val dir2 = tmp("shidx2") + "/idx"
    Dedup.simhashIndexAppend(batch1, "doc_id", "text", dir2)
    val sigCols = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir2/sigs").schema.fieldNames.toSet
    assert(sigCols == Set("id", "sig_lo", "sig_hi"), sigCols)
  }
}
