package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** Second `private[sql]` bridge: re-wrap a MATERIALIZED (checkpointed)
  * DataFrame as a fresh LogicalRDD WITHOUT the source plan's inherited
  * size statistics.
  *
  * Why this exists: `Dataset.localCheckpoint` preserves the child
  * plan's stats on the LogicalRDD it mints. For ITERATIVE DataFrame
  * algorithms that join checkpointed frames round over round, Catalyst's
  * size-only estimator multiplies child sizes at every join
  * (SizeInBytesOnlyStatsPlanVisitor.visitJoin), so the carried
  * sizeInBytes estimate grows EXPONENTIALLY in the round number —
  * after ~8 rounds the driver burns minutes in
  * BigInteger.multiplyToomCook3 just PLANNING each round (observed:
  * the contraction CC loop stuck >20 min on a plan whose data was
  * kilobytes). Dropping the inherited stats resets each round's
  * estimate to the conf default — bounded-size BigInts forever, at the
  * cost of never auto-broadcasting a checkpointed table (they were
  * never broadcastable under the inflated estimates anyway; loops that
  * want a broadcast say so with an explicit hint). */
object PlanShim {
  def freshStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
