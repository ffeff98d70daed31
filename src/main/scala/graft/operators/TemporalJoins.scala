package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Time-series joins Spark has no built-in operator for: AS-OF (latest
  * right row at or before each left row's time, per key — pandas
  * merge_asof / kdb aj semantics) and point-in-interval RANGE join.
  *
  * Both are re-expressed so the physical plan is shuffle-bounded:
  *
  *  - asofJoin NEVER builds row pairs. Both sides union into one
  *    relation tagged by side, shuffle ONCE on the key, and a
  *    last(..., ignoreNulls) running window carries each right row's
  *    payload forward to the left rows that follow it in time order.
  *    Cost is one exchange + one sort — the same plan shape as a windowed
  *    aggregate, independent of match fan-out. The naive alternative
  *    (theta-join on key + time range, then argmax per left row) shuffles
  *    |L|·avg-candidates rows; this shuffles |L|+|R|.
  *
  *  - rangeJoin converts the inequality predicate into an equi-join by
  *    quantizing time into fixed-width bins: each interval replicates to
  *    the bins it covers (ceil(len/width)+1 copies, bounded), each point
  *    hashes to exactly one bin, and the bin equi-join + exact residual
  *    filter reproduces the theta-join result with NO nested-loop /
  *    cartesian plan. Pair multiplicity is preserved (a point's bin holds
  *    at most one copy of any interval, so no dedup pass is needed).
  *
  * Time columns may be TIMESTAMP (compared at exact microsecond
  * precision via unix_micros) or any integral type in the caller's own
  * units (e.g. epoch-nanos longs — the testdata's `events.ts` under
  * nanosAsLong). All comparisons are exact LONG arithmetic: double
  * epoch math is off by up to ~256 ns at 2026-era nano scales (2^60
  * doesn't fit a 53-bit mantissa), exactly the class of silent boundary
  * bug an engine must not have.
  *
  * At 100 TB both hash-partition on (key | bin) — no broadcast of a big
  * side, no single-task stage, skew bounded by bin width choice.
  */
object TemporalJoins {

  /** Key columns keep their own type (string, long, ... — anything
    * hashable): both sides must agree so the union/equi-join compares
    * apples to apples. A silent cast("long") here once nulled string
    * keys and merged every row into one partition. */
  private def requireSameKeyType(left: DataFrame, right: DataFrame,
                                 lk: String, rk: String): Unit =
    require(left.schema(lk).dataType == right.schema(rk).dataType,
      s"key columns must share a type: $lk is ${left.schema(lk).dataType}, " +
        s"$rk is ${right.schema(rk).dataType}")

  /** Timestamp-family and integral time columns don't mix: micros vs
    * caller units differ by orders of magnitude and would silently
    * misalign every comparison. */
  private def requireSameTimeClass(left: DataFrame, right: DataFrame,
                                   lt: String, rt: String): Unit = {
    def cls(dt: DataType): String = dt match {
      case TimestampType | TimestampNTZType => "timestamp"
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case other => throw new IllegalArgumentException(
        s"time column must be timestamp or integral, got $other")
    }
    require(cls(left.schema(lt).dataType) == cls(right.schema(rt).dataType),
      s"time columns must share a unit class: $lt is " +
        s"${left.schema(lt).dataType}, $rt is ${right.schema(rt).dataType}")
  }

  /** Exact long time value: microseconds for timestamps, the raw value
    * for integral columns. */
  private def tlong(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    // NTZ: interpret in the session zone (graft pins UTC) — exact micros.
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case ByteType | ShortType | IntegerType | LongType => c.cast("long")
    case other => throw new IllegalArgumentException(
      s"time column must be timestamp or integral, got $other")
  }

  /** Tolerance in time units: seconds scale to micros for timestamps;
    * integral columns use the caller's units as-is. */
  private def tolUnits(tol: Double, dt: DataType): Long = dt match {
    case TimestampType | TimestampNTZType => (tol * 1e6).toLong
    case _ => tol.toLong
  }

  /** AS-OF join (backward, inclusive): for every left row, attach the
    * payload of the latest right row with the same key and
    * rightTime <= leftTime (within `tolerance`, if given; matches
    * further in the past are nulled — tolerance is in SECONDS for
    * timestamp columns, the column's own units otherwise). Left rows
    * with no match keep null payloads — left-outer semantics, output
    * has exactly |L| rows.
    *
    * `payload` columns are taken from `right` and surfaced with a
    * `prev_` prefix alongside every left column; the matched right time
    * arrives as `prev_ts` (the right time column's raw value).
    * Right-side exact-time ties resolve to the row latest in payload
    * order — deterministic.
    */
  /** Spark cannot ORDER BY map-containing types; the tie-break structs
    * must exclude them or the join fails analysis for map payloads. */
  private def isOrderable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case st: org.apache.spark.sql.types.StructType =>
        st.fields.forall(f => isOrderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => isOrderable(a.elementType)
      case _ => true
    }

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String],
               tolerance: Option[Double] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    requireSameKeyType(left, right, leftKey, rightKey)
    requireSameTimeClass(left, right, leftTime, rightTime)
    // the right time column itself may appear in payload (natural
    // merge_asof usage) — prev_ts already carries it, and a duplicate
    // struct field made every _m.prev_ts extraction ambiguous
    val pay = payload.filterNot(_ == rightTime)
    // a payload column literally named "ts" (with a DIFFERENT right time
    // column) would emit a second prev_ts — ambiguous in the struct AND
    // in the output contract; refuse loudly rather than silently rename
    require(!pay.contains("ts"),
      "payload column 'ts' collides with the prev_ts output column — " +
        "rename it on the right side first")
    // tie-break columns: ORDERABLE payload fields only (maps cannot be
    // sorted — ordering by the full payload struct failed analysis for
    // any map-typed payload column)
    val payOrd = pay.filter(c => isOrderable(right.schema(c).dataType))
    // one relation, side-tagged: right rows sort BEFORE left rows at the
    // same instant (side 0 < 1), making the match inclusive. A null
    // right time has no place on the time axis (it would sort first and
    // masquerade as everyone's "earliest" row) — drop it.
    val r = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("_k"),
      tlong(col(rightTime), right.schema(rightTime).dataType).as("_t"),
      lit(0).as("_side"),
      struct(col(rightTime).as("prev_ts") +:
        pay.map(c => col(c).as(s"prev_$c")): _*).as("_rv"),
      struct(col(rightTime) +: payOrd.map(col): _*).as("_rvo"),
      lit(null).cast(structType(left, leftCols)).as("_lv"))
    val l = left.select(
      col(leftKey).as("_k"),
      tlong(col(leftTime), left.schema(leftTime).dataType).as("_t"),
      lit(1).as("_side"),
      lit(null).cast(r.schema("_rv").dataType).as("_rv"),
      lit(null).cast(r.schema("_rvo").dataType).as("_rvo"),
      struct(leftCols.map(col): _*).as("_lv"))
    // ordering by (_t, _side, _rvo) makes equal-time right rows
    // deterministic: last() takes the max payload struct
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col("_rvo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      // a left row with a NULL time has no place on the axis, and NULL
      // keys never match (equi-join semantics; the window's partitionBy
      // would otherwise group null keys together) — null payloads
      .withColumn("_m",
        when(col("_t").isNotNull && col("_k").isNotNull, col("_m")))
    val inTol = tolerance match {
      case Some(tol) =>
        val t = tolUnits(tol, right.schema(rightTime).dataType)
        val prevT = tlong(col("_m.prev_ts"), right.schema(rightTime).dataType)
        matched.withColumn("_m", when(col("_t") - prevT <= t, col("_m")))
      case None => matched
    }
    val out = leftCols.map(c => col(s"_lv.$c").as(c)) ++
      (("prev_ts" +: pay.map("prev_" + _)).map(c => col(s"_m.$c").as(c)))
    inTol.select(out: _*)
  }

  /** AS-OF join, FORWARD direction: earliest right row with the same
    * key and rightTime >= leftTime (inclusive; within `tolerance` — in
    * SECONDS for timestamp columns — matches further in the future are
    * nulled). Same zero-join union+window plan as [[asofJoin]], with
    * the running window flipped to (currentRow, unboundedFollowing) and
    * first(ignoreNulls); payload surfaces with a `next_` prefix
    * (`next_ts` + `next_<col>`). Exact-time ties resolve to the min
    * payload struct — deterministic. */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      payload: Seq[String],
                      tolerance: Option[Double] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // left rows sort BEFORE right rows at the same instant (side 0 < 1),
    // so a right row at exactly leftTime is inside the following frame
    requireSameKeyType(left, right, leftKey, rightKey)
    requireSameTimeClass(left, right, leftTime, rightTime)
    val pay = payload.filterNot(_ == rightTime) // next_ts carries it
    require(!pay.contains("ts"),
      "payload column 'ts' collides with the next_ts output column — " +
        "rename it on the right side first")
    val payOrd = pay.filter(c => isOrderable(right.schema(c).dataType))
    val r = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("_k"),
      tlong(col(rightTime), right.schema(rightTime).dataType).as("_t"),
      lit(1).as("_side"),
      struct(col(rightTime).as("next_ts") +:
        pay.map(c => col(c).as(s"next_$c")): _*).as("_rv"),
      struct(col(rightTime) +: payOrd.map(col): _*).as("_rvo"),
      lit(null).cast(structType(left, leftCols)).as("_lv"))
    val l = left.select(
      col(leftKey).as("_k"),
      tlong(col(leftTime), left.schema(leftTime).dataType).as("_t"),
      lit(0).as("_side"),
      lit(null).cast(r.schema("_rv").dataType).as("_rv"),
      lit(null).cast(r.schema("_rvo").dataType).as("_rvo"),
      struct(leftCols.map(col): _*).as("_lv"))
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col("_rvo"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = r.unionByName(l)
      .withColumn("_m", first(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      // null left time sorted FIRST and saw the whole following frame —
      // it matched the group's earliest right row; null keys grouped
      // together. Both get null payloads (equi-join semantics).
      .withColumn("_m",
        when(col("_t").isNotNull && col("_k").isNotNull, col("_m")))
    val inTol = tolerance match {
      case Some(tol) =>
        val t = tolUnits(tol, right.schema(rightTime).dataType)
        val nextT = tlong(col("_m.next_ts"), right.schema(rightTime).dataType)
        matched.withColumn("_m", when(nextT - col("_t") <= t, col("_m")))
      case None => matched
    }
    val out = leftCols.map(c => col(s"_lv.$c").as(c)) ++
      (("next_ts" +: pay.map("next_" + _)).map(c => col(s"_m.$c").as(c)))
    inTol.select(out: _*)
  }

  /** AS-OF join, NEAREST direction (merge_asof parity): whichever of
    * the backward / forward matches is closer in time wins; ties break
    * BACKWARD (the at-or-before row). Output carries the winner under
    * `near_ts` / `near_<col>`. Two window passes (one per direction) —
    * still zero join operators on the |L|+|R| relation per pass. */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      payload: Seq[String],
                      tolerance: Option[Double] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // the forward pass runs over the BACKWARD output (which preserves
    // every left column), so both candidates sit on one row with no
    // rejoin and no (key, time)-uniqueness assumption
    val back = asofJoin(left, right, leftKey, rightKey, leftTime, rightTime,
      payload, tolerance)
    val both = asofJoinForward(back, right, leftKey, rightKey, leftTime,
      rightTime, payload, tolerance)
    val lt = tlong(col(leftTime), left.schema(leftTime).dataType)
    val rdt = right.schema(rightTime).dataType
    val backGap = lt - tlong(col("prev_ts"), rdt)
    val fwdGap = tlong(col("next_ts"), rdt) - lt
    val pickBack = col("prev_ts").isNotNull &&
      (col("next_ts").isNull || backGap <= fwdGap)
    // mirror the per-direction passes: the right time column never
    // appears as prev_/next_<name> (prev_ts/next_ts carry it)
    val pay = payload.filterNot(_ == rightTime)
    val out = leftCols.map(col) ++
      ("ts" +: pay).map { c =>
        when(pickBack, col(s"prev_$c")).otherwise(col(s"next_$c"))
          .as(s"near_$c")
      }
    both.select(out: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    StructType(cols.map(c => df.schema(c)))

  /** Point-in-interval RANGE join: every (point, interval) pair with the
    * same key and startCol <= pointTime <= endCol (inclusive). `binSize`
    * quantizes time — MICROSECONDS for timestamp columns, the column's
    * own units for integral columns; pick it near the typical interval
    * length so intervals replicate to ~2 bins. Inner-join multiplicity
    * (one output row per matching pair), hash-join physical plan.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointKey: String, intervalKey: String,
                pointTime: String, startCol: String, endCol: String,
                binSize: Long): DataFrame = {
    require(binSize > 0, s"rangeJoin: binSize must be positive, got " +
      s"$binSize (a zero bin silently matches nothing under non-ANSI)")
    requireSameKeyType(points, intervals, pointKey, intervalKey)
    requireSameTimeClass(points, intervals, pointTime, startCol)
    // the END column too: a timestamp start with an integral end would
    // pass the start-only check and compare micros against raw units
    requireSameTimeClass(points, intervals, pointTime, endCol)
    val pt = tlong(col(pointTime), points.schema(pointTime).dataType)
    val st = tlong(col(startCol), intervals.schema(startCol).dataType)
    val en = tlong(col(endCol), intervals.schema(endCol).dataType)
    // integer `div` binning, not floor(x / b): long/long division round-
    // trips through double, whose 53-bit mantissa misplaces ns-scale
    // epochs near bin edges. div truncates toward zero (≠ floor for
    // negatives) but is monotone, which is all bin consistency needs.
    val p = points
      .withColumn("_pt", pt)
      .withColumn("_bin", expr(s"_pt div ${binSize}L"))
      .withColumn("_pk", col(pointKey))
    val iv = intervals
      .withColumn("_st", st).withColumn("_en", en)
      .withColumn("_bin", explode(sequence(
        expr(s"_st div ${binSize}L"), expr(s"_en div ${binSize}L"))))
      .withColumn("_ik", col(intervalKey))
    p.join(iv, p("_bin") === iv("_bin") && col("_pk") === col("_ik"))
      .filter(col("_pt").between(col("_st"), col("_en")))
      .drop("_bin", "_pk", "_ik", "_pt", "_st", "_en")
  }
}
