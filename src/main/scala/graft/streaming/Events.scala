package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user session accumulator for [[Events.sessionizeStream]]. Must be
  * top-level and public: the state encoder's generated code references it
  * by name, and a private nested case class fails Janino compilation. */
case class SessState(start: Long, last: Long, n: Long, total: Double)

/** Event-stream operators. Drill has no streaming story; this is the
  * Spark-native extension: the same tumbling/session semantics are
  * expressed once and run either as a batch DataFrame (verifiable against
  * a SQL oracle) or as a Structured Streaming query with watermarks.
  */
object Events {

  /** Epoch seconds for a `ts` column that is either a real timestamp or
    * BIGINT nanos (how ns-precision parquet surfaces in Spark via
    * spark.sql.legacy.parquet.nanosAsLong). FLOOR division — Spark's `div`
    * truncates toward zero, which disagrees with a SQL oracle's `//` for
    * pre-1970 timestamps; subtracting pmod first makes the quotient exact
    * and floor-consistent for any sign, with no double-precision detour. */
  def tsSeconds(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("(ts - pmod(ts, 1000000000L)) div 1000000000L")
      case _ => unix_timestamp(col("ts")).cast("long")
    }

  /** Engine-portable sum of a double measure: quantize each value with
    * floor(v * 2^14) (exact in binary floating point — scaling by a power
    * of two changes no mantissa bits), sum as BIGINT. Immune to summation
    * order AND to decimal-rounding half-case differences across engines. */
  def quantizedSum(c: Column): Column =
    sum(floor(c * lit(16384.0)).cast("long"))

  /** Tumbling-window aggregate, batch form. Window key = floor(epoch /
    * windowSec) as BIGINT — engine-portable (no timestamp precision
    * skew between parquet ns / Spark us). */
  def tumblingAgg(events: DataFrame, windowSec: Int): DataFrame = {
    val sec = tsSeconds(events)
    events.groupBy(
        floor(sec / windowSec).cast("long").as("window_id"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        quantizedSum(col("value")).as("sum_value_q"))
  }

  /** Gap-based sessionization, batch form: a new session starts when the
    * user is idle > gapSec; session_id = first event ts in the session.
    * One shuffle on user_id; window functions do the rest. */
  def sessionize(events: DataFrame, gapSec: Int): DataFrame = {
    // event_id tie-break: ts alone can collide within a user, and an
    // ambiguous lag() order makes the session assignment engine-dependent.
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sec = tsSeconds(events)
    val newSession = when(
      sec - lag(sec, 1).over(byUser) > gapSec || lag(sec, 1).over(byUser).isNull, 1)
      .otherwise(0)
    events
      .withColumn("sec", sec)
      .withColumn("sess_seq", sum(newSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"),
        quantizedSum(col("value")).as("sum_value_q"))
  }

  /** Streaming exact dedup at ingest: drop rows whose normalized content
    * hash already appeared within the watermark horizon. State is bounded
    * by the watermark (dropDuplicatesWithinWatermark evicts expired keys);
    * a plain dropDuplicates would grow state forever on a continuous
    * 100 TB/day feed. The batch twin is Dedup.exact — same hash, same
    * normalize — so a backfill and the live stream agree. */
  def dedupStream(docs: DataFrame, textCol: String,
                  watermarkDelay: String = "10 minutes"): DataFrame =
    docs.withColumn("content_hash",
        xxhash64(graft.pipeline.TextAnalysis.normalize(col(textCol))))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming decontamination: drop stream rows that near-duplicate a
    * STATIC reference corpus (eval/benchmark content) at ingest,
    * STATELESSLY — no watermark, no join state, so it runs at ingest rate
    * forever. A row survives iff NO reference doc shares an LSH band and
    * verifies at `threshold` (exact hashed-token Jaccard, computed only
    * on band collisions thanks to the arrays_overlap short-circuit).
    *
    * Two stateless physical shapes, chosen by reference SIZE:
    *  - at most `maxRefLiteral` docs: the banded reference embeds in the
    *    plan as a literal — zero join machinery, pure codegen filter.
    *    Plans (and their codegen + serialized form) grow with literal
    *    size, so this path is bounded, not the default for everything.
    *  - larger: the same predicate runs as a broadcast stream-static
    *    LEFT ANTI join — the reference rides the broadcast channel
    *    (GB-scale) instead of the query plan (KB-scale), still no
    *    streaming state. Per-row work is identical.
    * The batch twin for big-vs-big corpora remains Dedup.decontaminate
    * (bipartite banded join), which beats both shapes once the reference
    * itself needs to shuffle. */
  def decontaminateStream(stream: DataFrame, reference: DataFrame,
                          idCol: String, textCol: String,
                          numHashes: Int = 128, bands: Int = 32,
                          threshold: Double = 0.8,
                          maxRefLiteral: Int = 4096): DataFrame = {
    import graft.pipeline.{Dedup, TextAnalysis}
    val rowsPerBand = numHashes / bands
    def thOf(c: Column): Column =
      array_sort(Dedup.tokenHashes(split(TextAnalysis.normalize(c), " ")))
    def bandsOf(th: Column): Column =
      Dedup.lshBandKeys(Dedup.minhashSignatureFromHashes(th, numHashes),
        bands, rowsPerBand)

    val refBanded = reference
      .select(bandsOf(thOf(col(textCol))).as("ref_bands"),
        thOf(col(textCol)).as("ref_th"))
    val myTh = thOf(col(textCol))

    if (reference.count() <= maxRefLiteral) {
      val refRows: Seq[(Seq[Long], Seq[Long])] = refBanded.collect()
        .map(r => (r.getSeq[Long](0), r.getSeq[Long](1))).toSeq
      val refLit = typedlit(refRows)
      val contaminated = exists(refLit, r =>
        arrays_overlap(bandsOf(myTh), r.getField("_1")) &&
          call_function("jaccard_sim", myTh, r.getField("_2")) >= threshold)
      stream.filter(!contaminated)
    } else {
      stream.withColumn("__th", myTh).withColumn("__bands", bandsOf(col("__th")))
        .join(broadcast(refBanded),
          arrays_overlap(col("__bands"), col("ref_bands")) &&
            call_function("jaccard_sim", col("__th"), col("ref_th")) >= threshold,
          "left_anti")
        .drop("__th", "__bands")
    }
  }

  /** Streaming ingest into a Delta table: each micro-batch commits
    * atomically to the transaction log via foreachBatch +
    * DeltaLogWriter, carrying a Delta `txn` action keyed by `appId` —
    * exactly-once ACROSS RESTARTS: a replayed batch whose id is at or
    * below the last committed txn version is skipped, which is precisely
    * the Delta protocol's idempotent-writer mechanism. Readers replaying
    * the log never see a partial batch (the commit-file rename is the
    * publish point). The lakehouse half of the streaming story: dedup/
    * decontaminate at ingest, then land exactly once in a table any
    * engine can read. */
  def deltaSink(stream: DataFrame, tablePath: String, checkpoint: String,
                appId: String = "graft-stream"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val committed = graft.sources.DeltaLogWriter
          .lastTxnVersion(batch.sparkSession, tablePath, appId)
        if (!committed.exists(_ >= batchId))
          graft.sources.DeltaLogWriter.write(batch.toDF(), tablePath,
            txn = Some((appId, batchId)))
        ()
      }
      .start()

  /** Structured Streaming form of tumblingAgg: readStream on the same
    * schema -> watermark -> windowed agg. Caller supplies the streaming
    * source (e.g. a rate/file/kafka reader). */
  def tumblingAggStream(events: DataFrame, windowDur: String,
                        watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))


  /** Stream-stream interval join: attribute each click to the impression
    * it followed within `windowSec` (the canonical watermarked
    * stream-stream join). Both sides keep bounded state — rows are
    * dropped once the watermark passes their join window. Expects
    * impressions(imp_id, imp_ts, ...) and clicks(clk_id, clk_ts, ...). */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
                       windowSec: Int,
                       watermarkDelay: String = "30 seconds"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", watermarkDelay)
    val clk = clicks.withWatermark("clk_ts", watermarkDelay)
    imp.join(clk, expr(
      s"""imp_id = clk_id AND
          clk_ts >= imp_ts AND
          clk_ts <= imp_ts + interval $windowSec seconds"""))
  }

  /** flatMapGroupsWithState sessionization — custom state per user with an
    * EVENT-TIME timeout: a session closes either when the same user shows
    * up past the gap, or when the watermark passes last+gap. Event-time
    * (not processing-time) timeouts keep the query deterministic and
    * replayable, and the query goes idle when no data arrives — a
    * processing-time timeout would re-trigger empty micro-batches forever
    * (which also makes processAllAvailable() block indefinitely). */
  def sessionizeStream(spark: SparkSession, events: DataFrame, gapSec: Int,
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    // the watermarked `ts` attribute itself must flow into the grouped
    // Dataset (the analyzer checks for it); seconds derive in the lambda.
    val typed = events.withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, (Long, Long, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessState]) =>
          var out = List.empty[(Long, Long, Long, Long, Double)]
          var st = state.getOption.getOrElse(SessState(-1, -1, 0, 0.0))
          rows.toSeq.sortBy(_._2.getTime).foreach { case (_, t, v) =>
            val sec = t.getTime / 1000L
            if (st.start < 0) st = SessState(sec, sec, 1, v)
            else if (sec - st.last > gapSec) {
              out ::= (user, st.start, st.last, st.n, st.total)
              st = SessState(sec, sec, 1, v)
            } else st = st.copy(last = sec, n = st.n + 1, total = st.total + v)
          }
          if (state.hasTimedOut) {
            if (st.start >= 0) out ::= (user, st.start, st.last, st.n, st.total)
            state.remove()
          } else {
            state.update(st)
            state.setTimeoutTimestamp((st.last + gapSec) * 1000L)
          }
          out.reverseIterator
      }
      .toDF("user_id", "start_sec", "end_sec", "n_events", "sum_value")
  }
}
