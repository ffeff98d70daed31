package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Curate

class CurateSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = GraftSession.table(spark, SF, "documents")

  test("curate composes the gated stages end-to-end, deterministically") {
    val out = Curate.curate(docs, "doc_id", "text", minQualityBp = 1000,
      keepLang = "en", nearDupThreshold = 0.8)
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    // schema contract: id + redacted text + the curation metadata
    assert(out.columns.toSet ==
      Set("doc_id", "text", "quality_bp", "lang", "split"))
    // all survivors meet the floor and the language filter
    assert(out.filter(col("quality_bp") < 1000 || col("lang") =!= "en").count() == 0)
    // split covers every survivor with the three classes only
    val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // deterministic: a rerun is row-identical (no rand() anywhere)
    val again = Curate.curate(docs, "doc_id", "text", minQualityBp = 1000,
      keepLang = "en", nearDupThreshold = 0.8)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("funnel counts shrink monotonically through the stages") {
    val f = Curate.funnel(docs, "doc_id", "text", minQualityBp = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("input") >= f("quality_floor"))
    assert(f("quality_floor") >= f("language"))
    assert(f("language") >= f("after_dedup"))
    assert(f("after_dedup") > 0)
  }
}
