package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GisFunctions
import graft.pipeline.Training

class GisTrainingSpec extends AnyFunSuite {
  import TestSpark._

  test("haversine distance + predicates (Drill gis UDFs)") {
    import spark.implicits._
    // Paris -> London great-circle distance is ~343-344 km
    val df = Seq((2.3522, 48.8566, -0.1276, 51.5074)).toDF("alon", "alat", "blon", "blat")
    val r = df.select(
      GisFunctions.stDistanceKm(col("alon"), col("alat"), col("blon"), col("blat")).as("d"),
      GisFunctions.stDWithinKm(col("alon"), col("alat"), col("blon"), col("blat"), 400).as("near"),
      GisFunctions.stDWithinKm(col("alon"), col("alat"), col("blon"), col("blat"), 300).as("far"),
      GisFunctions.stWithinBBox(col("alon"), col("alat"), 2.0, 48.0, 3.0, 49.0).as("inparis"),
      GisFunctions.stX(GisFunctions.stPoint(col("alon"), col("alat"))).as("x")).collect()(0)
    assert(math.abs(r.getDouble(0) - 343.5) < 2.0)
    assert(r.getBoolean(1) && !r.getBoolean(2) && r.getBoolean(3))
    assert(r.getDouble(4) == 2.3522)
  }

  test("planar geometry core: WKT parse, envelope, ray-casting containment, GeoJSON") {
    import spark.implicits._
    import GisFunctions._
    // concave "arrow" polygon: contains (1,1) and (4,1); NOT (2.5, 2.5)
    // (the notch) though that point is inside the envelope
    val wkt = "POLYGON ((0 0, 5 0, 5 4, 2.5 1.5, 0 4, 0 0))"
    val df = Seq(wkt).toDF("w").select(stGeomFromText(col("w")).as("g"))
    val r = df.select(
      col("g")("gtype"), stXMin(col("g")), stXMax(col("g")),
      stYMin(col("g")), stYMax(col("g")),
      stContains(col("g"), lit(1.0), lit(1.0)),
      stContains(col("g"), lit(4.0), lit(1.0)),
      stContains(col("g"), lit(2.5), lit(2.5)), // envelope yes, polygon no
      stContains(col("g"), lit(6.0), lit(1.0)),
      stAsText(col("g"))).collect()(0)
    assert(r.getString(0) == "POLYGON")
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      == (0.0, 5.0, 0.0, 4.0))
    assert(r.getBoolean(5) && r.getBoolean(6))
    assert(!r.getBoolean(7), "concave notch must not be contained")
    assert(!r.getBoolean(8))
    assert(r.getString(9).startsWith("POLYGON ((0.0 0.0, 5.0 0.0"))

    // point + linestring + GeoJSON + planar distance
    val pts = Seq(("POINT (3 4)", "POINT (0 0)", "LINESTRING (0 0, 1 1, 2 0)"))
      .toDF("a", "b", "l")
      .select(stGeomFromText(col("a")).as("a"), stGeomFromText(col("b")).as("b"),
        stGeomFromText(col("l")).as("l"))
    val p = pts.select(stDistancePlanar(col("a"), col("b")),
      stAsGeoJSON(col("a")), stAsGeoJSON(col("l")),
      stIntersectsBBox(col("a"), col("l"))).collect()(0)
    assert(p.getDouble(0) == 5.0)
    assert(p.getString(1) == """{"type":"Point","coordinates":[3.0,4.0]}""")
    assert(p.getString(2).contains("\"LineString\"") &&
      p.getString(2).contains("[[0.0,0.0],[1.0,1.0],[2.0,0.0]]"))
    assert(!p.getBoolean(3)) // point (3,4) outside the line's bbox

    // refusal: holes and MULTI* error clearly
    val e = intercept[Exception] {
      Seq("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
        .toDF("w").select(stGeomFromText(col("w"))).collect()
    }
    assert(e.getMessage.contains("single-ring"), e.getMessage)
  }

  test("hashSplit is deterministic and respects percentages roughly") {
    val docs = GraftSession.table(spark, SF, "documents")
    val split = Training.hashSplit(docs, "doc_id", "text")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.65 && counts("train") / total < 0.95)
    // deterministic: second run identical
    val again = Training.hashSplit(docs, "doc_id", "text")
    assert(split.exceptAll(again).count() == 0 && again.exceptAll(split).count() == 0)
  }

  test("packSequences fills bins near the budget without global sort") {
    val docs = GraftSession.table(spark, SF, "documents")
    val packed = Training.packSequences(docs, "doc_id", "text",
      tokenBudget = 2048, shards = 4)
    val stats = Training.packingStats(packed)
    // every bin except possibly each shard's last stays under budget +
    // one max doc; and no bin is empty
    assert(stats.filter(col("n_docs") <= 0).count() == 0)
    val overfill = stats.filter(col("bin_tokens") > 2048 * 2).count()
    assert(overfill == 0, "bins should not wildly exceed the budget")
    // the plan must window per shard, not globally
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"))
  }
}
