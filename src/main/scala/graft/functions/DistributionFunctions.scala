package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution / histogram / time-bucket functions from Drill's UDF
  * contribs (reference contrib/udfs/.../DistributionFunctions.java,
  * TimeBucketFunctions.java, ThreatHuntingFunctions.java).
  */
object DistributionFunctions {

  /** width_bucket(v, min, max, n): 1-based equal-width histogram bucket,
    * 0 below the range, n+1 above — Spark's built-in expression (codegen),
    * same semantics as Drill's WidthBucketFunction. */
  def widthBucket(v: Column, minV: Column, maxV: Column, buckets: Column): Column =
    call_function("width_bucket", v, minV, maxV, buckets)

  /** Exact Kendall rank correlation (tau-a) per group, via the concordant/
    * discordant pair count. Drill's kendall_correlation streams a
    * sequential-pair APPROXIMATION (each row compared only to its
    * predecessor — reference DistributionFunctions.java:110); this is the
    * true statistic, O(n^2) pairs per group, distributed as one equi-join
    * on the group key. Use on bounded-size groups (the statistic itself is
    * quadratic; at 100 TB compute it over per-partition samples). */
  def kendallTau(df: DataFrame, groupCol: String, idCol: String,
                 xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(idCol).as("i"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      // null AND NaN x/y rows drop FIRST (scipy/pandas posture): either
      // used to count in the n_pairs denominator while contributing to
      // neither C nor D (every NaN comparison is false), deflating tau
      // by the bad-pair fraction. Groups left with <2 valid rows emit
      // no row (tau undefined).
      .filter(col("x").isNotNull && col("y").isNotNull &&
        !isnan(col("x")) && !isnan(col("y")))
    base.as("a").join(base.as("b"),
        col("a.g") === col("b.g") && col("a.i") < col("b.i"))
      .groupBy(col("a.g").as(groupCol))
      .agg(
        sum(when((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")) > 0, 1L)
          .otherwise(0L)).as("concordant"),
        sum(when((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")) < 0, 1L)
          .otherwise(0L)).as("discordant"),
        count(lit(1)).as("n_pairs"))
      .select(col(groupCol), col("concordant"), col("discordant"),
        round((col("concordant") - col("discordant")).cast("double") / col("n_pairs"), 6)
          .as("kendall_tau"))
  }

  /** time_bucket(epochMs, intervalMs): floor to the interval start, in ms
    * (Drill TimeBucketFunctions.java time_bucket). Integer floor-div only —
    * no double detour, portable to any engine. */
  // % (toward-zero remainder), NOT pmod: the reference computes
  // `timestamp - (timestamp % interval)` (TimeBucketFunctions.java:66,
  // Java %), so pre-1970 negative epochs bucket TOWARD ZERO — the pmod
  // floor put them one bucket lower than Drill (and than the gate's
  // DuckDB oracle, whose % has the same sign-of-dividend semantics).
  def timeBucketMs(epochMs: Column, intervalMs: Column): Column =
    (epochMs - epochMs % intervalMs)

  /** time_bucket_ns: same, nanosecond inputs (Drill time_bucket_ns). */
  def timeBucketNs(epochNs: Column, intervalNs: Column): Column =
    (epochNs - epochNs % intervalNs)

  /** punctuation_pattern(s): strip alphanumerics, map spaces to '_' — the
    * log-template shape extractor from Drill's threat-hunting pack. */
  def punctuationPattern(s: Column): Column =
    regexp_replace(regexp_replace(s, "[a-zA-Z0-9]", ""), " ", "_")

  /** entropy(s): Shannon entropy of the char distribution, bits/char
    * (native StringEntropyExpr via GraftExtensions). */
  def entropy(s: Column): Column = call_function("entropy", s)
}
