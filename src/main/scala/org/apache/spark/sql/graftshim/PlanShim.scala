package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.QueryExecution

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
  /** Third bridge — the admission path (RunningQueries.trackSql): mint
    * the execution Dataset from the SAME QueryExecution admission
    * sizing analyzed, so the analyzer runs ONCE per admitted query —
    * `spark.sql` would re-parse and re-analyze the text a second time
    * (the r15 verdict's double-analysis note). Command plans
    * (CTAS/INSERT) still execute at Dataset construction, exactly as
    * they do inside `spark.sql` — callers construct INSIDE the
    * admission gate so DML stays behind it. */
  def datasetOf(qe: QueryExecution): DataFrame =
    new Dataset[Row](qe,
      RowEncoder.encoderFor(qe.analyzed.schema).asInstanceOf[Encoder[Row]])

  def freshStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Free the persisted blocks behind a `localCheckpoint()`ed (possibly
    * [[freshStats]]-rewrapped) DataFrame. `Dataset.unpersist` only
    * uncaches CacheManager-REGISTERED plans, and localCheckpoint's
    * persisted RDD blocks are not registered there — so on iterative
    * loops the per-round checkpoint blocks pile up until RDD garbage
    * collection. This walks the frame's LogicalRDD leaves down their
    * RDD lineage (freshStats wraps a metrics/projection-derived RDD,
    * not the persisted one itself) and unpersists the first persisted
    * RDD on each path; lineage below a local checkpoint is already
    * truncated, so the walk is shallow and never re-enters the
    * original computation. Callers must only free frames whose every
    * downstream consumer has MATERIALIZED — a local checkpoint cannot
    * recompute. */
  def unpersistCheckpoint(df: DataFrame): Unit = {
    val seen = new java.util.IdentityHashMap[
      org.apache.spark.rdd.RDD[_], java.lang.Boolean]()
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
      if (seen.put(r, java.lang.Boolean.TRUE) == null) {
        if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
          r.unpersist(blocking = false)
        else r.dependencies.foreach(d => walk(d.rdd))
      }
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(walk)
  }
}
