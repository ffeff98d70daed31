package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val media =
    Multimodal.syntheticMedia(GraftSession.table(spark, SF, "documents"))

  test("synthetic media table carries binary payload + typed metadata") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    val m = media.filter(col("payload").isNotNull).limit(1)
      .select("meta.width", "meta.height", "meta.duration_ms").collect()(0)
    assert(m.getInt(0) >= 64 && m.getInt(1) >= 64 && m.getLong(2) > 0)
  }

  test("decodeImageFeatures (STUB kernel) is deterministic over binary batches") {
    val feats = Multimodal.decodeImageFeatures(media.limit(50), featureDim = 8)
    val rows = feats.select("media_id", "features").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(f.length == 8)
      assert(f.forall(v => v >= 0.0)) // byte-histogram moments are non-negative
    }
    // deterministic: same input => same features
    val again = Multimodal.decodeImageFeatures(media.limit(50), featureDim = 8)
      .select("media_id", "features").collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Double](1))).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Double](1))).toMap)
  }

  test("resize rewrites metadata and bounds payload size") {
    val resized = Multimodal.resize(media.limit(20), 32, 16)
    val r = resized.select("meta.width", "meta.height").distinct().collect()
    assert(r.length == 1 && r(0).getInt(0) == 32 && r(0).getInt(1) == 16)
    val tooBig = resized.filter(octet_length(col("payload")) > 32 * 16).count()
    assert(tooBig == 0)
  }

  test("sampleFrames emits n evenly spaced frames per video row") {
    val n = 4
    val frames = Multimodal.sampleFrames(media, n)
    val perRow = frames.groupBy("media_id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(perRow == Set(n.toLong))
    val bad = frames.filter(
      col("frame_ms") < 0 || col("frame_ms") >= col("meta.duration_ms")).count()
    assert(bad == 0)
    assert(frames.select("kind").distinct().collect().map(_.getString(0)).toSet
      == Set("video"))
  }
}
