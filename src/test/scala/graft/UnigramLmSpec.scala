package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer induction (pipeline/UnigramLm.scala — the
  * SentencePiece unigram role as exactly-verifiable hard-EM; the gate
  * q_unigram_lm replays both EM iterations in DuckDB SQL). Here: the
  * Viterbi tie-break contract, held-out segmentation, coverage
  * fallbacks, and determinism. */
class UnigramLmSpec extends AnyFunSuite {
  import TestSpark._
  import graft.pipeline.UnigramLm
  import spark.implicits._

  private val p = UnigramLm.Params()

  test("segment: fewer/longer pieces win; unsegmentable and overlong " +
      "words pass through whole (UNK role)") {
    val vocab = Map("ab" -> 10L, "a" -> 5L, "b" -> 5L, "c" -> 1L)
    val docs = Seq(
      (1L, "abab"), (2L, "aba"), (3L, "abc"), (4L, "zz"),
      (5L, "abababababababab")) // 16 chars > maxWordLen 12
      .toDF("doc_id", "text")
    val out = UnigramLm.segment(docs, "text", vocab, p)
      .select("doc_id", "pieces").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("ab", "ab"))
    assert(out(2L) == Seq("ab", "a"))
    assert(out(3L) == Seq("ab", "c"))
    assert(out(4L) == Seq("zz"))            // no coverage: whole word
    assert(out(5L) == Seq("abababababababab")) // overlong: whole word
  }

  test("non-BMP text segments by CODE POINTS (UTF-16 units would split " +
      "surrogate pairs and overflow the 4-bit backpointer)") {
    val two = "🎉🎉" // 2 party-popper code points
    val vocab = Map(two -> 10L, "🎉" -> 1L)
    val docs = Seq(
      (1L, two + two), // 4 cps = 8 UTF-16 units
      (2L, "🎉" * 13)) // 13 cps > maxWordLen 12 -> whole
      .toDF("doc_id", "text")
    val out = UnigramLm.segment(docs, "text", vocab, p)
      .select("doc_id", "pieces").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq(two, two), out(1L).toString)
    assert(out(2L) == Seq("🎉" * 13))
  }

  test("induce: concentrates mass on the reused piece, drops unused " +
      "candidates, and is deterministic") {
    val docs = (1 to 6).map(i => (i.toLong, "abab abab cdcd"))
      .toDF("doc_id", "text")
    val v1 = UnigramLm.induce(docs, "text", p).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every word segments as repeated 4-char pieces ("abab"/"cdcd" are
    // themselves candidates at maxPieceLen=4, and longest-piece wins)
    assert(v1.keySet == Set("abab", "cdcd"), v1.toString)
    assert(v1("abab") == 12L && v1("cdcd") == 6L, v1.toString)
    val v2 = UnigramLm.induce(docs, "text", p).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v1 == v2)
  }

  test("induced vocab segments a held-out corpus through the same " +
      "Viterbi (training/inference agreement)") {
    val train = (1 to 8).map(i => (i.toLong, "international nation nations"))
      .toDF("doc_id", "text")
    val vocab = UnigramLm.induce(train, "text", p.copy(vocabSize = 200))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab.nonEmpty)
    val heldOut = Seq((1L, "nation international")).toDF("doc_id", "text")
    val segs = UnigramLm.segment(heldOut, "text", vocab, p)
      .select("pieces").collect()(0).getSeq[String](0)
    // pieces re-concatenate to the input words and all come from the
    // induced vocabulary (or pass-through whole words)
    assert(segs.mkString == "nationinternational", segs.toString)
    assert(segs.forall(s =>
      vocab.contains(s) || s == "nation" || s == "international"),
      segs.toString)
  }
}
