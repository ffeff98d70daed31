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
